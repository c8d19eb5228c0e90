"""Entropy-coding API: on-device CDF tables → host C++ rANS bitstreams.

Fills the gap SURVEY.md §2.6 identifies: the reference trains a
differentiable BitEstimator but measures real rate by gzip'ing code bytes
(NewTests/test_new_model_reconAndSimilarity.py:152-155). Here:

- ``build_cdf_tables_from_bit_estimator``: evaluate the learned per-channel
  CDF at the integer grid on device, quantize to 1<<scale_bits integer
  frequencies (deterministic, so encoder and decoder — possibly different
  hosts — derive identical tables from identical params).
- ``build_cdf_tables_from_histogram``: empirical tables for the DSC coarse
  code (17 symbols), shipped in the stream header.
- ``encode_latent``/``decode_latent``: whole-tensor round trip through the
  C++ rANS coder (coding/src/rans.cc), channel-indexed tables.
- ``gzip_bpp``: the reference's gzip proxy, kept as a cross-check.

The C++ library auto-builds on first import (g++ -O3 -shared).
"""

import ctypes
import gzip
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "rans.cc")
_LIB = os.path.join(os.path.dirname(__file__), "src", "librans.so")

_lib = None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
        )
    lib = ctypes.CDLL(_LIB)
    lib.rans_encode_indexed.restype = ctypes.c_int
    lib.rans_encode_indexed.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.rans_decode_indexed.restype = ctypes.c_int
    lib.rans_decode_indexed.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rans_dec_create.restype = ctypes.c_void_p
    lib.rans_dec_create.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.rans_dec_step.restype = ctypes.c_int
    lib.rans_dec_step.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rans_dec_free.restype = None
    lib.rans_dec_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _quantize_pmf(pmf: np.ndarray, scale_bits: int) -> np.ndarray:
    """Quantize a pmf row to integers summing to 1<<scale_bits, all > 0.
    Deterministic (largest-remainder after floor with min-1 floor)."""
    total = 1 << scale_bits
    pmf = np.maximum(pmf.astype(np.float64), 1e-12)
    pmf = pmf / pmf.sum()
    f = np.floor(pmf * total).astype(np.int64)
    f = np.maximum(f, 1)
    diff = total - int(f.sum())
    if diff > 0:
        # give remainder to largest-probability slots deterministically
        order = np.argsort(-(pmf * total - np.floor(pmf * total)), kind="stable")
        f[order[:diff]] += 1
    elif diff < 0:
        # remove from largest freqs (keeping >= 1)
        order = np.argsort(-f, kind="stable")
        i = 0
        while diff < 0:
            j = order[i % len(order)]
            if f[j] > 1:
                f[j] -= 1
                diff += 1
            i += 1
    return f.astype(np.uint32)


class RansCodec:
    """Per-channel static-table rANS codec over integer symbols."""

    def __init__(self, freqs: np.ndarray, offset: int, scale_bits: int = 14):
        """freqs: (ntables, nsym) uint32 rows summing to 1<<scale_bits.
        offset: symbol = int_value - offset."""
        assert freqs.ndim == 2
        self.freqs = np.ascontiguousarray(freqs, np.uint32)
        self.cums = np.ascontiguousarray(
            np.concatenate(
                [np.zeros((freqs.shape[0], 1), np.uint32),
                 np.cumsum(freqs, axis=1)[:, :-1].astype(np.uint32)],
                axis=1,
            )
        )
        self.offset = int(offset)
        self.scale_bits = int(scale_bits)
        self.nsym = freqs.shape[1]
        self.ntables = freqs.shape[0]

    def encode(self, values: np.ndarray, table_ids: np.ndarray) -> bytes:
        lib = _get_lib()
        sym = np.ascontiguousarray(values.reshape(-1) - self.offset, np.int32)
        tid = np.ascontiguousarray(table_ids.reshape(-1), np.int32)
        assert sym.shape == tid.shape
        if sym.size and (sym.min() < 0 or sym.max() >= self.nsym):
            raise ValueError(
                f"symbol out of range [{self.offset}, {self.offset + self.nsym})"
            )
        cap = sym.size * 4 + 64
        out = np.empty(cap, np.uint8)
        n = lib.rans_encode_indexed(
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sym.size,
            self.freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self.cums.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self.nsym, self.ntables, self.scale_bits,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n < 0:
            raise RuntimeError("rANS encode failed")
        return bytes(out[:n].tobytes())

    def decode(self, stream: bytes, table_ids: np.ndarray) -> np.ndarray:
        lib = _get_lib()
        tid = np.ascontiguousarray(table_ids.reshape(-1), np.int32)
        buf = np.frombuffer(stream, np.uint8)
        sym = np.empty(tid.size, np.int32)
        rc = lib.rans_decode_indexed(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size,
            tid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tid.size,
            self.freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self.cums.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self.nsym, self.ntables, self.scale_bits,
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError("rANS decode failed")
        return sym + self.offset


class StreamingDecoder:
    """Stateful rANS decoder over a codec's tables.

    The autoregressive codec (models/cheng2020.py) cannot know all table ids
    up front — symbol i's Gaussian scale index is computed from symbols < i.
    ``step(table_ids)`` decodes the next ``len(table_ids)`` symbols in forward
    order. Must be used as a context manager or ``close()``d."""

    def __init__(self, codec: "RansCodec", stream: bytes):
        lib = _get_lib()
        buf = np.frombuffer(stream, np.uint8)
        self._codec = codec
        self._lib = lib
        self._handle = lib.rans_dec_create(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size,
            codec.freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            codec.cums.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            codec.nsym, codec.ntables, codec.scale_bits,
        )
        if not self._handle:
            raise RuntimeError("rANS streaming-decoder create failed")

    def step(self, table_ids: np.ndarray) -> np.ndarray:
        tid = np.ascontiguousarray(np.asarray(table_ids).reshape(-1), np.int32)
        sym = np.empty(tid.size, np.int32)
        rc = self._lib.rans_dec_step(
            self._handle,
            tid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tid.size,
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError("rANS streaming decode failed")
        return sym + self._codec.offset

    def close(self):
        if self._handle:
            self._lib.rans_dec_free(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def build_cdf_tables_from_bit_estimator(
    params, zmin: int, zmax: int, scale_bits: int = 14
) -> RansCodec:
    """Evaluate the BitEstimator CDF per channel on the integer grid
    [zmin, zmax] and quantize. ``params``: ops.entropy.BitEstimatorParams."""
    from ..ops.entropy import bit_estimator_cdf
    import jax.numpy as jnp

    grid = np.arange(zmin, zmax + 1, dtype=np.float32)
    ch = np.asarray(params.f1.h).shape[0]
    # x shape (nsym, C): evaluate both half-integer edges
    x = jnp.asarray(grid)[:, None] * jnp.ones((1, ch), jnp.float32)
    upper = np.asarray(bit_estimator_cdf(x + 0.5, params), np.float64)
    lower = np.asarray(bit_estimator_cdf(x - 0.5, params), np.float64)
    pmf = np.maximum(upper - lower, 0.0).T  # (C, nsym)
    freqs = np.stack([_quantize_pmf(row, scale_bits) for row in pmf])
    return RansCodec(freqs, offset=zmin, scale_bits=scale_bits)


def build_cdf_tables_from_histogram(
    values: np.ndarray,
    channel_axis: int = -1,
    offset: Optional[int] = None,
    nsym: Optional[int] = None,
    scale_bits: int = 14,
) -> RansCodec:
    """Empirical per-channel tables (for the DSC coarse code)."""
    v = np.asarray(values)
    c = v.shape[channel_axis]
    v = np.moveaxis(v, channel_axis, -1).reshape(-1, c).astype(np.int64)
    if offset is None:
        offset = int(v.min())
    if nsym is None:
        nsym = int(v.max()) - offset + 1
    freqs = np.empty((c, nsym), np.uint32)
    for j in range(c):
        hist = np.bincount(v[:, j] - offset, minlength=nsym).astype(np.float64)
        freqs[j] = _quantize_pmf(hist + 0.5, scale_bits)  # +0.5 Krichevsky-style
    return RansCodec(freqs, offset=offset, scale_bits=scale_bits)


def _channel_ids(shape: Tuple[int, ...]) -> np.ndarray:
    """Table-id per element for an NHWC tensor: the channel index."""
    c = shape[-1]
    n = int(np.prod(shape[:-1]))
    return np.tile(np.arange(c, dtype=np.int32), n)


def encode_latent(codec: RansCodec, latent: np.ndarray) -> bytes:
    """Encode an NHWC integer latent; elements ordered row-major, channel
    table per element."""
    lat = np.asarray(latent)
    return codec.encode(lat.astype(np.int64), _channel_ids(lat.shape))


def decode_latent(codec: RansCodec, stream: bytes, shape: Tuple[int, ...]) -> np.ndarray:
    out = codec.decode(stream, _channel_ids(tuple(shape)))
    return out.reshape(shape)


def gzip_bpp(code: np.ndarray, n_pixels: int, step: float = 16.0, offset: float = 128.0) -> float:
    """The reference's rate proxy: gzip of uint8 code bytes / pixels
    (reference NewTests/test_new_model_reconAndSimilarity.py:152-155).
    Uses len(compressed) — the reference's __sizeof__ adds Python-object
    overhead bytes; we report the honest payload size."""
    u8 = np.asarray((code + offset) / 1.0, np.float32)
    u8 = np.clip(u8, 0, 255).astype(np.uint8)
    comp = gzip.compress(u8.tobytes())
    return len(comp) * 8.0 / float(n_pixels)
