"""Joint-autoregressive hierarchical-prior codec (Cheng-2020 anchor).

The reference keeps exactly one hyperprior+context model in its tree:
``Cheng2020Anchor`` (reference models/temp.py:45-112), a subclass of
CompressAI's ``JointAutoregressiveHierarchicalPriors`` whose entropy machinery
the DSC variants inherit and then bypass (SURVEY.md §2.2, §2.6). Here it is a
first-class TPU-native model:

- transforms: residual-block g_a (÷16), conv3x3 h_a (÷4), subpel h_s (×4,
  out 2N), residual+subpel g_s (×16) — layer-for-layer the stacks of
  reference models/temp.py:62-107;
- context model: 5×5 mask-A conv (M → 2M) — a weight-masked conv XLA runs on
  the MXU in ONE parallel pass for training/eval (no per-pixel loop on TPU);
- entropy parameters: 1×1 conv stack 4M → 10M/3 → 8M/3 → 2M, split
  (scales, means) in that order (checkpoint-import parity with the
  CompressAI layout the reference imports);
- rates: y against N(mu, sigma) (half-integer CDF differences), z against
  the factorized BitEstimator prior; both clipped to [0, 50] bits per the
  reference convention (model.py:71-78).

Real bitstreams — which the reference never produces (it measures gzip
instead, SURVEY.md §2.6) — are implemented by ``compress``/``decompress``:
the transforms and the hyper path run on device in parallel; the inherently
sequential scan (each pixel's CDF depends on already-coded pixels) runs on
host against the C++ rANS coder's streaming decoder, with numpy
re-implementations of the (tiny) masked-conv window product and the 1×1
entropy-parameters stack. Symbols are coded in anti-diagonal WAVEFRONT order
(``_wavefronts``): every pixel on a wavefront is independent given earlier
wavefronts, so the per-pixel matvecs batch into per-wavefront GEMMs (~10x
fewer host ops than a raster scan). Encoder and decoder execute the
identical host arithmetic, so mu/sigma — and therefore the coded symbols —
match bit-exactly.
"""

from typing import NamedTuple, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.blocks import (
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
    conv3x3,
    conv1x1,
)
from ..nn.layers import BitEstimator, MaskedConv
from ..ops.entropy import LOG2, BitEstimatorParams, BitparmParams
from ..ops.quant import add_uniform_noise

_SQRT2 = float(np.sqrt(2.0))


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def normal_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT2))


def _clip_bits(prob: jax.Array) -> jax.Array:
    return jnp.clip(-jnp.log(prob + 1e-10) / LOG2, 0.0, 50.0)


class ChengAnalysis(fnn.Module):
    """g_a of reference models/temp.py:62-71 — residual stacks, ÷16."""

    n: int = 192

    @fnn.compact
    def __call__(self, x):
        n = self.n
        x = ResidualBlockWithStride(n, 2, name="rbs0")(x)
        x = ResidualBlock(n, name="rb1")(x)
        x = ResidualBlockWithStride(n, 2, name="rbs2")(x)
        x = ResidualBlock(n, name="rb3")(x)
        x = ResidualBlockWithStride(n, 2, name="rbs4")(x)
        x = ResidualBlock(n, name="rb5")(x)
        return conv3x3(n, stride=2, name="conv6")(x)


class ChengHyperAnalysis(fnn.Module):
    """h_a of reference models/temp.py:73-84 — ÷4 on the latent grid."""

    n: int = 192

    @fnn.compact
    def __call__(self, y):
        n = self.n
        y = _lrelu(conv3x3(n, name="conv0")(y))
        y = _lrelu(conv3x3(n, name="conv1")(y))
        y = _lrelu(conv3x3(n, stride=2, name="conv2")(y))
        y = _lrelu(conv3x3(n, name="conv3")(y))
        return conv3x3(n, stride=2, name="conv4")(y)


class ChengHyperSynthesis(fnn.Module):
    """h_s of reference models/temp.py:86-96 — ×4, out 2N channels."""

    n: int = 192

    @fnn.compact
    def __call__(self, z):
        n = self.n
        z = _lrelu(conv3x3(n, name="conv0")(z))
        z = _lrelu(SubpelConv(n, 2, name="subpel1")(z))
        z = _lrelu(conv3x3(n * 3 // 2, name="conv2")(z))
        z = _lrelu(SubpelConv(n * 3 // 2, 2, name="subpel3")(z))
        return conv3x3(n * 2, name="conv4")(z)


class ChengSynthesis(fnn.Module):
    """g_s of reference models/temp.py:98-107 — ×16 back to RGB."""

    n: int = 192

    @fnn.compact
    def __call__(self, y):
        n = self.n
        y = ResidualBlock(n, name="rb0")(y)
        y = ResidualBlockUpsample(n, 2, name="rbu1")(y)
        y = ResidualBlock(n, name="rb2")(y)
        y = ResidualBlockUpsample(n, 2, name="rbu3")(y)
        y = ResidualBlock(n, name="rb4")(y)
        y = ResidualBlockUpsample(n, 2, name="rbu5")(y)
        y = ResidualBlock(n, name="rb6")(y)
        return SubpelConv(3, 2, name="subpel7")(y)


class EntropyParameters(fnn.Module):
    """1×1 conv stack 4M → 10M/3 → 8M/3 → 2M (scales, means)."""

    m: int = 192

    @fnn.compact
    def __call__(self, x):
        m = self.m
        x = _lrelu(conv1x1(m * 10 // 3, name="conv0")(x))
        x = _lrelu(conv1x1(m * 8 // 3, name="conv1")(x))
        return conv1x1(m * 2, name="conv2")(x)


class JointAutoregressive(fnn.Module):
    """End-to-end joint-autoregressive hierarchical-prior image codec."""

    n: int = 192
    scale_bound: float = 0.11  # matches coding/gaussian.py SCALES_MIN

    @fnn.compact
    def __call__(self, image, train: bool = False, rng: Optional[jax.Array] = None):
        n_img, h, w, _ = image.shape
        y = ChengAnalysis(self.n, name="g_a")(image)
        z = ChengHyperAnalysis(self.n, name="h_a")(y)

        if train:
            if rng is None:
                rng = self.make_rng("quant")
            rng_z, rng_y = jax.random.split(rng)
            z_hat = add_uniform_noise(z, rng_z, 0.5)
            y_hat = add_uniform_noise(y, rng_y, 0.5)
        else:
            z_hat = jnp.round(z)
            y_hat = jnp.round(y)

        hyper = ChengHyperSynthesis(self.n, name="h_s")(z_hat)
        ctx = MaskedConv(
            2 * self.n, 5, mask_type="A", padding=2, name="context_prediction"
        )(y_hat)
        gaussian_params = EntropyParameters(self.n, name="entropy_parameters")(
            jnp.concatenate([hyper, ctx], axis=-1)
        )
        sigma, mu = jnp.split(gaussian_params, 2, axis=-1)
        sigma = jnp.maximum(jnp.abs(sigma), self.scale_bound)

        delta = y_hat - mu
        prob_y = normal_cdf((delta + 0.5) / sigma) - normal_cdf((delta - 0.5) / sigma)

        recon = ChengSynthesis(self.n, name="g_s")(y_hat)
        clipped = jnp.clip(recon, 0.0, 1.0)
        mse = jnp.mean((recon - image) ** 2)

        cdf = BitEstimator(self.n, name="bit_estimator_z")
        prob_z = cdf(z_hat + 0.5) - cdf(z_hat - 0.5)

        n_pixels = n_img * h * w
        bits_y = jnp.sum(_clip_bits(prob_y))
        bits_z = jnp.sum(_clip_bits(prob_z))
        return {
            "recon": clipped,
            "latent": y_hat,
            "hyper_latent": z_hat,
            "sigma": sigma,
            "mu": mu,
            "mse": mse,
            "bpp_y": bits_y / n_pixels,
            "bpp_z": bits_z / n_pixels,
            "bpp": (bits_y + bits_z) / n_pixels,
        }


# ---------------------------------------------------------------------------
# Real bitstream codec (host raster scan + C++ rANS).
# ---------------------------------------------------------------------------


class CompressedImage(NamedTuple):
    y_stream: bytes
    z_stream: bytes
    y_shape: Tuple[int, int, int]  # (H/16, W/16, N) for one image
    z_shape: Tuple[int, int, int]
    max_sym: int  # symbol range shipped in the header
    z_min: int
    z_max: int

    @property
    def num_bits(self) -> int:
        return 8 * (len(self.y_stream) + len(self.z_stream))


def _wavefronts(h: int, w: int, slope: int = 3):
    """Anti-diagonal wavefronts t = slope·i + j over an (h, w) grid.

    With the 5×5 mask-A context, pixel (i, j) depends on same-row pixels
    (i, j-1), (i, j-2) and rows i-1, i-2 at columns ≤ j+2. For slope 3 every
    dependency of a pixel on wavefront t lies on a wavefront < t (worst case
    (i-1, j+2): t' = t-1), so all pixels sharing t are decodable in one
    batch. Symbols are coded in wavefront order (within a wavefront:
    ascending row) — encoder and decoder iterate identically.
    """
    fronts = []
    for t in range(slope * (h - 1) + w):
        i0 = max(0, -(-(t - (w - 1)) // slope))  # ceil((t-w+1)/slope)
        i1 = min(h - 1, t // slope)
        if i0 > i1:
            continue
        ii = np.arange(i0, i1 + 1, dtype=np.int64)
        jj = t - slope * ii
        fronts.append((ii, jj))
    return fronts


class _HostARContext:
    """Host-side mirror of context_prediction + entropy_parameters.

    Holds the (tiny) weights as float32 numpy and evaluates a BATCH of
    raster-scan pixels (one anti-diagonal wavefront) at once: the mask-A
    window products and the three 1×1 matmuls become small GEMMs over the
    wavefront. Used identically by encoder and decoder so their mu/sigma
    agree bit-exactly.

    Precomputation (exact algebraic refactors, no approximation):
    - the first entropy_parameters layer is linear before its leaky_relu, so
      its weight splits into a hyper half and a context half; the hyper half
      plus both biases are evaluated for ALL pixels in one GEMM up front
      (``prep``), leaving only the context half per pixel;
    - the mask-A window splits into 10 fully-decoded "above" taps (rows
      i-2, i-1) and 2 same-row "left" taps, each a reshaped GEMM.
    """

    def __init__(self, params):
        p = params["params"]
        cp = p["context_prediction"]
        w = np.asarray(cp["weight"], np.float32)  # (5, 5, M, 2M)
        kh, kw = w.shape[:2]
        mask = np.ones((kh, kw, 1, 1), np.float32)
        mask[kh // 2, kw // 2:] = 0.0
        mask[kh // 2 + 1:] = 0.0
        self.ctx_w = w * mask
        self.ctx_b = np.asarray(cp["bias"], np.float32)
        ep = p["entropy_parameters"]
        self.ep = [
            (
                np.asarray(ep[name]["weight"], np.float32)[0, 0],  # (cin, cout)
                np.asarray(ep[name]["bias"], np.float32),
            )
            for name in ("conv0", "conv1", "conv2")
        ]
        self.kh, self.kw = kh, kw
        m = w.shape[2]
        self.m = m
        w0, b0 = self.ep[0]
        nh = w0.shape[0] - 2 * m  # hyper channels feeding conv0 (= 2M)
        self.w0_h = np.ascontiguousarray(w0[:nh])  # hyper half
        self.w0_c = np.ascontiguousarray(w0[nh:])  # context half
        self.b0 = b0
        # ALL 12 live taps — rows 0,1 of the masked 5×5 kernel (10 "above"
        # taps) + same-row cols 0,1 (2 "left" taps) — as ONE (12·M, 2M) GEMM
        # matrix. Every tap a wavefront-t pixel reads is final before front
        # t (worst cases (i-1, j+2) → t-1 and (i, j-1) → t-1), so a single
        # fused gather+GEMM is exact. Tap order must match _tap_offsets.
        self.w_taps = np.ascontiguousarray(
            np.concatenate(
                [
                    self.ctx_w[:2].reshape(2 * kw * m, 2 * m),
                    self.ctx_w[kh // 2, : kw // 2].reshape((kw // 2) * m, 2 * m),
                ],
                axis=0,
            )
        )
        # tap (row, col) offsets into the padded ŷ, same order as w_taps rows
        offs = [(r, c) for r in range(2) for c in range(kw)] + [
            (kh // 2, c) for c in range(kw // 2)
        ]
        self.off_r = np.array([o[0] for o in offs], np.int64)
        self.off_c = np.array([o[1] for o in offs], np.int64)
        # Native C++ driver (coding/src/ar_ctx.cc): same math, scratch
        # allocated once, BLAS called without numpy temporaries — ~4× on the
        # Kodak mu/sigma pass. None → numpy fallback (ICLR17C_AR_HOST=numpy
        # forces it). Encoder and decoder construct identical contexts, so
        # whichever backend loads, both sides share it bit-exactly.
        from ..coding.ar_native import NativeAR

        self._native = NativeAR.create(
            self.w_taps, self.w0_c, self.ep[1], self.ep[2],
            self.off_r, self.off_c, m,
        )

    def prep(self, hyper: np.ndarray) -> np.ndarray:
        """Per-image precompute: conv0's hyper contribution + both biases,
        for every pixel. hyper: (h, w, 2M) → (h, w, C0)."""
        base = hyper.reshape(-1, hyper.shape[-1]) @ self.w0_h
        base += self.b0 + self.ctx_b @ self.w0_c
        return base.reshape(hyper.shape[0], hyper.shape[1], -1)

    def mu_sigma_batch(
        self,
        y_hat_pad: np.ndarray,
        base: np.ndarray,
        ii: np.ndarray,
        jj: np.ndarray,
        scale_bound: float,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(mu, sigma), each (P, M), for the wavefront pixels (ii, jj).
        ``y_hat_pad`` is ŷ zero-padded by kh//2 / kw//2; entries this
        wavefront depends on are already final.

        Perf shape (measured, BASELINE.md): the wavefront P is 1..~17; BLAS
        sgemm at M-dim < 16 runs 6-8× below its M=16 rate, so lanes are
        padded to a multiple of 16 (padded lanes gather pixel (0,0) and are
        sliced off — a few % extra FLOPs for a ~3× wall-clock win), and all
        12 context taps go through one gather + one (P,12M)@(12M,2M) GEMM."""
        if self._native is not None:
            return self._native.mu_sigma(y_hat_pad, base, ii, jj, scale_bound)
        m = self.m
        p_n = ii.shape[0]
        p_pad = -(-p_n // 16) * 16
        if p_pad != p_n:
            zi = np.zeros(p_pad - p_n, np.int64)
            ii = np.concatenate([ii, zi])
            jj = np.concatenate([jj, zi])
        rows = ii[:, None] + self.off_r[None, :]
        cols = jj[:, None] + self.off_c[None, :]
        taps = y_hat_pad[rows, cols].reshape(p_pad, -1)  # (P, 12·M)
        x = base[ii, jj] + (taps @ self.w_taps) @ self.w0_c
        np.maximum(x, 0.01 * x, out=x)  # leaky_relu(0.01)
        x = x @ self.ep[1][0] + self.ep[1][1]
        np.maximum(x, 0.01 * x, out=x)
        x = x @ self.ep[2][0] + self.ep[2][1]
        x = x[:p_n]
        sigma = np.maximum(np.abs(x[:, :m]), scale_bound)
        return x[:, m:], sigma


def _apply_submodule(model: JointAutoregressive, params, name: str, module, x):
    return module.apply({"params": params["params"][name]}, x)


def compress(model: JointAutoregressive, params, image, return_y_hat: bool = False):
    """Encode one image (1, H, W, 3), H and W multiples of 64, to bitstreams.

    ``return_y_hat=True`` additionally returns the encoder-side dequantized
    latent so tests can assert the decoder reproduces it bit-exactly."""
    from ..coding.api import encode_latent
    from ..coding.gaussian import default_gaussian_codec, default_scale_table, scale_indices
    from ..ops.entropy import bit_estimator_cdf

    assert image.shape[0] == 1, "compress() codes one image at a time"
    n = model.n
    y = np.asarray(
        _apply_submodule(model, params, "g_a", ChengAnalysis(n), jnp.asarray(image))
    )[0]
    z = np.asarray(
        _apply_submodule(model, params, "h_a", ChengHyperAnalysis(n), jnp.asarray(y[None]))
    )[0]
    z_hat = np.round(z)

    # --- z: factorized prior stream ---
    be = _bit_estimator_params(params, "bit_estimator_z")
    z_min, z_max = int(z_hat.min()), int(z_hat.max())
    z_codec = _z_codec(be, z_min, z_max)
    z_stream = encode_latent(z_codec, z_hat.astype(np.int64))

    # --- y: autoregressive gaussian-conditional stream ---
    hyper = np.asarray(
        _apply_submodule(
            model, params, "h_s", ChengHyperSynthesis(n), jnp.asarray(z_hat[None])
        ),
        np.float32,
    )[0]
    host = _HostARContext(params)
    h, w, m = y.shape
    pad = host.kh // 2
    y_hat_pad = np.zeros((h + 2 * pad, w + 2 * pad, m), np.float32)
    base = host.prep(hyper)
    sym_parts, sig_parts = [], []
    for ii, jj in _wavefronts(h, w):
        mu, sigma = host.mu_sigma_batch(y_hat_pad, base, ii, jj, model.scale_bound)
        s = np.round(y[ii, jj] - mu)
        sym_parts.append(s.astype(np.int32).reshape(-1))
        sig_parts.append(sigma.reshape(-1))
        y_hat_pad[ii + pad, jj + pad] = s + mu

    syms = np.concatenate(sym_parts)  # wavefront coding order
    sigmas = np.concatenate(sig_parts)
    max_sym = max(int(np.abs(syms).max()), 1)
    table = default_scale_table()
    y_codec = default_gaussian_codec(max_sym)
    tids = scale_indices(sigmas, table)
    y_stream = y_codec.encode(syms.astype(np.int64), tids)

    comp = CompressedImage(
        y_stream=y_stream,
        z_stream=z_stream,
        y_shape=(h, w, m),
        z_shape=tuple(z_hat.shape),
        max_sym=max_sym,
        z_min=z_min,
        z_max=z_max,
    )
    if return_y_hat:
        return comp, y_hat_pad[pad : pad + h, pad : pad + w].copy()
    return comp


def decompress(
    model: JointAutoregressive,
    params,
    comp: CompressedImage,
    return_y_hat: bool = False,
    quantize_fetch: bool = False,
):
    """Decode bitstreams back to the reconstructed image (1, H, W, 3).

    ``quantize_fetch``: round to the uint8 display grid ON DEVICE and fetch
    1 byte/channel (returns float array scaled back to [0,1]). A decoded
    image is uint8 in practice, and the fp32 fetch of a Kodak recon through
    the remote device tunnel costs more than the synthesis itself
    (BASELINE.md round-4 breakdown) — this is the serving configuration."""
    from ..coding.api import StreamingDecoder, decode_latent
    from ..coding.gaussian import default_gaussian_codec, default_scale_table, scale_indices

    n = model.n
    be = _bit_estimator_params(params, "bit_estimator_z")
    z_codec = _z_codec(be, comp.z_min, comp.z_max)
    z_hat = decode_latent(z_codec, comp.z_stream, comp.z_shape).astype(np.float32)

    hyper = np.asarray(
        _apply_submodule(
            model, params, "h_s", ChengHyperSynthesis(n), jnp.asarray(z_hat[None])
        ),
        np.float32,
    )[0]
    host = _HostARContext(params)
    h, w, m = comp.y_shape
    pad = host.kh // 2
    y_hat_pad = np.zeros((h + 2 * pad, w + 2 * pad, m), np.float32)
    base = host.prep(hyper)
    table = default_scale_table()
    y_codec = default_gaussian_codec(comp.max_sym)
    with StreamingDecoder(y_codec, comp.y_stream) as dec:
        for ii, jj in _wavefronts(h, w):
            mu, sigma = host.mu_sigma_batch(y_hat_pad, base, ii, jj, model.scale_bound)
            tids = scale_indices(sigma, table)
            s = dec.step(tids).astype(np.float32).reshape(mu.shape)
            y_hat_pad[ii + pad, jj + pad] = s + mu

    y_hat = y_hat_pad[pad : pad + h, pad : pad + w]
    dev = _apply_submodule(
        model, params, "g_s", ChengSynthesis(n), jnp.asarray(y_hat[None])
    )
    if quantize_fetch:
        u8 = np.asarray(
            jnp.round(jnp.clip(dev, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        )
        recon = u8.astype(np.float32) / 255.0
    else:
        recon = np.clip(np.asarray(dev), 0.0, 1.0)
    if return_y_hat:
        return recon, y_hat.copy()
    return recon


def _bit_estimator_params(params, name: str) -> BitEstimatorParams:
    """Extract ops-level BitEstimatorParams from a flax params tree."""
    p = params["params"][name]

    def bp(i, final):
        return BitparmParams(
            h=jnp.asarray(p[f"f{i}_h"]),
            b=jnp.asarray(p[f"f{i}_b"]),
            a=None if final else jnp.asarray(p[f"f{i}_a"]),
        )

    return BitEstimatorParams(bp(1, False), bp(2, False), bp(3, False), bp(4, True))


def _z_codec(be: BitEstimatorParams, z_min: int, z_max: int):
    from ..coding.api import build_cdf_tables_from_bit_estimator

    return build_cdf_tables_from_bit_estimator(be, z_min, z_max)
