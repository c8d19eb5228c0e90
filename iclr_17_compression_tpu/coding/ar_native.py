"""ctypes wrapper for the native joint-AR host context driver (src/ar_ctx.cc).

The AR context pass must run on the host (encoder/decoder bit-exactness —
see models/cheng2020.py _HostARContext); this wrapper moves its per-wavefront
math (tap gather + 4 SGEMMs + activations) from numpy into C++ with
once-allocated scratch and cache-resident weights. BLAS comes from the scipy
wheel's bundled OpenBLAS, located at runtime — when either the .so build or
the BLAS symbol resolution fails, callers fall back to the numpy path
(``NativeAR.create`` returns None; force the fallback with
``ICLR17C_AR_HOST=numpy``).

Measured on the 2-core AVX-512 host (concurrent training load): the Kodak
768x512 mu/sigma pass runs ~232 ms vs ~289 ms for the numpy wavefront loop
(same BLAS thread default), and ~2x faster than numpy when the host is
loaded and ICLR17C_AR_THREADS=1 avoids oversubscription. The pass is
GEMM-bound: 7.5 GFLOP against a measured 44.9 GF/s two-thread sgemm rate on
the M=16 wavefront panel shape (~167 ms floor with this BLAS) — see
BASELINE.md for the full host-codec cost structure.
"""

import ctypes
import glob
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "ar_ctx.cc")
_LIB = os.path.join(os.path.dirname(__file__), "src", "libarctx.so")

_lib = None


def _find_blas() -> Optional[str]:
    """The scipy wheel bundles an LP64 OpenBLAS with prefixed cblas symbols
    (scipy_cblas_sgemm); numpy's bundle is ILP64 (64-suffixed symbols) and
    is NOT usable with int32 cblas args, so only scipy's is searched."""
    try:
        import scipy

        libs_dir = os.path.join(os.path.dirname(os.path.dirname(scipy.__file__)),
                                "scipy.libs")
        hits = glob.glob(os.path.join(libs_dir, "libscipy_openblas*.so"))
        return hits[0] if hits else None
    except Exception:
        return None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB, "-ldl"],
            check=True,
        )
    lib = ctypes.CDLL(_LIB)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ar_create.restype = ctypes.c_void_p
    lib.ar_create.argtypes = [
        ctypes.c_char_p, f32p, f32p, f32p, f32p, f32p, f32p, i64p, i64p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ar_destroy.argtypes = [ctypes.c_void_p]
    lib.ar_mu_sigma.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int, f32p, ctypes.c_int,
        i64p, i64p, ctypes.c_int, ctypes.c_float, f32p, f32p,
    ]
    _lib = lib
    return lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeAR:
    """Owns one ar_ctx handle; mirrors _HostARContext.mu_sigma_batch."""

    def __init__(self, handle, m: int):
        self._h = handle
        self._m = m
        self._lib = _get_lib()

    @classmethod
    def create(
        cls,
        w_taps: np.ndarray,   # (n_taps*m, 2m)
        w0_c: np.ndarray,     # (2m, c0)
        ep1: tuple,           # (w1 (c0, c1), b1 (c1,))
        ep2: tuple,           # (w2 (c1, 2m), b2 (2m,))
        off_r: np.ndarray,
        off_c: np.ndarray,
        m: int,
    ) -> Optional["NativeAR"]:
        if os.environ.get("ICLR17C_AR_HOST", "native") == "numpy":
            return None
        blas = _find_blas()
        if blas is None:
            return None
        try:
            lib = _get_lib()
        except Exception:
            return None
        w1, b1 = ep1
        w2, b2 = ep2
        arrs = [np.ascontiguousarray(a, np.float32)
                for a in (w_taps, w0_c, w1, b1, w2, b2)]
        offs = [np.ascontiguousarray(o, np.int64) for o in (off_r, off_c)]
        n_taps = offs[0].shape[0]
        assert arrs[0].shape == (n_taps * m, 2 * m)
        c0, c1, c2 = arrs[1].shape[1], arrs[2].shape[1], arrs[4].shape[1]
        assert c2 == 2 * m, "entropy_parameters output must be (sigma, mu)"
        handle = lib.ar_create(
            blas.encode(), *(_f32p(a) for a in arrs), *(_i64p(o) for o in offs),
            m, n_taps, c0, c1, c2,
        )
        if not handle:
            return None
        return cls(handle, m)

    def mu_sigma(self, y_hat_pad, base, ii, jj, scale_bound: float):
        p = int(ii.shape[0])
        mu = np.empty((p, self._m), np.float32)
        sigma = np.empty((p, self._m), np.float32)
        y_hat_pad = np.ascontiguousarray(y_hat_pad, np.float32)
        base = np.ascontiguousarray(base, np.float32)
        self._lib.ar_mu_sigma(
            self._h, _f32p(y_hat_pad), int(y_hat_pad.shape[1]), _f32p(base),
            int(base.shape[1]), _i64p(np.ascontiguousarray(ii, np.int64)),
            _i64p(np.ascontiguousarray(jj, np.int64)), p,
            float(scale_bound), _f32p(mu), _f32p(sigma),
        )
        return mu, sigma

    def __del__(self):
        try:
            self._lib.ar_destroy(self._h)
        except Exception:
            pass
