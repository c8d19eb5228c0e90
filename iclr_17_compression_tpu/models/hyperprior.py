"""Scale-hyperprior codec built from the Ballé-2018 transforms.

The reference ships all four transforms plus two executable descriptions of
how they compose (models/synthesis_prior.py:42-67 — σ-normalized
quantization ``ŷ = round(y/σ)·σ``; model.py:63-69 — the commented-out
Laplace(0, σ) conditional rate), but no surviving trainer. This module makes
the composition a first-class end-to-end model:

  y = g_a(x);   z = h_a(y);   ẑ = Q(z);   σ = h_s(ẑ)
  rate(ẑ)  : factorized BitEstimator prior
  rate(ŷ)  : conditional Laplace(0, σ):  P = F(ŷ+½) − F(ŷ−½)
  quant(y) : 'round'     — ŷ = round(y)          (plus train-time noise)
             'sigma-norm'— ŷ = round(y/σ)·σ, coded in normalized units

All rates use the reference's clip(-log2 P, 0, 50) rule.

``compress``/``decompress`` produce REAL bitstreams (which the reference
never does, SURVEY.md §2.6): ẑ against the factorized BitEstimator tables,
ŷ against σ-indexed Laplace scale tables (coding/gaussian.py) — 'round'
snaps σ to the log-spaced table, 'sigma-norm' codes round(y/σ) against a
single unit-Laplace row. No autoregression: both directions are one device
pass + one parallel host rANS pass.
"""

from typing import NamedTuple, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import BitEstimator
from ..ops.entropy import LOG2
from ..ops.quant import add_uniform_noise
from .transforms18 import Analysis18, AnalysisPrior, Synthesis18, SynthesisPrior


def laplace_cdf(x: jax.Array, sigma: jax.Array) -> jax.Array:
    """CDF of Laplace(0, sigma) evaluated elementwise."""
    return 0.5 - 0.5 * jnp.sign(x) * jnp.expm1(-jnp.abs(x) / sigma)


def _clip_bits(prob: jax.Array) -> jax.Array:
    return jnp.clip(-jnp.log(prob + 1e-10) / LOG2, 0.0, 50.0)


class ScaleHyperprior(fnn.Module):
    out_channel_n: int = 192
    out_channel_m: int = 320
    quant: str = "round"  # 'round' | 'sigma-norm'

    @fnn.compact
    def __call__(self, image, train: bool = False, rng: Optional[jax.Array] = None):
        n_img, h, w, _ = image.shape
        y = Analysis18(self.out_channel_n, self.out_channel_m, name="g_a")(image)
        z = AnalysisPrior(self.out_channel_n, self.out_channel_m, name="h_a")(y)

        if train:
            if rng is None:
                rng = self.make_rng("quant")
            rng_z, rng_y = jax.random.split(rng)
            z_hat = add_uniform_noise(z, rng_z, 0.5)
        else:
            z_hat = jnp.round(z)

        sigma = SynthesisPrior(self.out_channel_n, self.out_channel_m, name="h_s")(z_hat)
        sigma = jnp.clip(sigma, 1e-10, 1e10)

        if self.quant == "sigma-norm":
            y_norm = y / sigma
            if train:
                y_norm_hat = add_uniform_noise(y_norm, rng_y, 0.5)
            else:
                y_norm_hat = jnp.round(y_norm)
            y_hat = y_norm_hat * sigma
            # coded symbols are the normalized values against a unit Laplace
            prob_y = laplace_cdf(y_norm_hat + 0.5, jnp.ones_like(sigma)) - laplace_cdf(
                y_norm_hat - 0.5, jnp.ones_like(sigma)
            )
        else:
            if train:
                y_hat = add_uniform_noise(y, rng_y, 0.5)
            else:
                y_hat = jnp.round(y)
            prob_y = laplace_cdf(y_hat + 0.5, sigma) - laplace_cdf(y_hat - 0.5, sigma)

        recon = Synthesis18(self.out_channel_n, self.out_channel_m, name="g_s")(y_hat)
        clipped = jnp.clip(recon, 0.0, 1.0)
        mse = jnp.mean((recon - image) ** 2)

        cdf = BitEstimator(self.out_channel_n, name="bit_estimator_z")
        prob_z = cdf(z_hat + 0.5) - cdf(z_hat - 0.5)

        bits_y = jnp.sum(_clip_bits(prob_y))
        bits_z = jnp.sum(_clip_bits(prob_z))
        n_pixels = n_img * h * w
        return {
            "recon": clipped,
            "latent": y_hat,
            "hyper_latent": z_hat,
            "sigma": sigma,
            "mse": mse,
            "bpp_y": bits_y / n_pixels,
            "bpp_z": bits_z / n_pixels,
            "bpp": (bits_y + bits_z) / n_pixels,
        }


# ---------------------------------------------------------------------------
# Real bitstream codec (device transforms + parallel host rANS).
# ---------------------------------------------------------------------------


class CompressedHyper(NamedTuple):
    y_stream: bytes
    z_stream: bytes
    y_shape: Tuple[int, int, int]  # (H/16, W/16, M) for one image
    z_shape: Tuple[int, int, int]
    max_sym: int
    z_min: int
    z_max: int
    quant: str  # 'round' | 'sigma-norm'

    @property
    def num_bits(self) -> int:
        return 8 * (len(self.y_stream) + len(self.z_stream))


def _sub(model: "ScaleHyperprior", params, name, module, x):
    return module.apply({"params": params["params"][name]}, x)


def _transforms(model: "ScaleHyperprior"):
    n, m = model.out_channel_n, model.out_channel_m
    return (
        Analysis18(n, m),
        AnalysisPrior(n, m),
        Synthesis18(n, m),
        SynthesisPrior(n, m),
    )


def _sigma_of(model, params, z_hat):
    _, _, _, h_s = _transforms(model)
    sigma = np.asarray(
        _sub(model, params, "h_s", h_s, jnp.asarray(z_hat[None])), np.float32
    )[0]
    return np.clip(sigma, 1e-10, 1e10)


def compress(model: "ScaleHyperprior", params, image) -> CompressedHyper:
    """Encode one image (1, H, W, 3), H and W multiples of 64, to streams."""
    from ..coding.gaussian import (
        default_laplace_codec,
        default_scale_table,
        scale_indices,
        unit_laplace_codec,
    )
    from ..coding.api import encode_latent
    from ..models.cheng2020 import _bit_estimator_params, _z_codec

    assert image.shape[0] == 1, "compress() codes one image at a time"
    g_a, h_a, _, _ = _transforms(model)
    y = np.asarray(_sub(model, params, "g_a", g_a, jnp.asarray(image)), np.float32)[0]
    z = np.asarray(_sub(model, params, "h_a", h_a, jnp.asarray(y[None])), np.float32)[0]
    z_hat = np.round(z)

    be = _bit_estimator_params(params, "bit_estimator_z")
    z_min, z_max = int(z_hat.min()), int(z_hat.max())
    z_stream = encode_latent(_z_codec(be, z_min, z_max), z_hat.astype(np.int64))

    sigma = _sigma_of(model, params, z_hat)
    if model.quant == "sigma-norm":
        syms = np.round(y / sigma).astype(np.int64)
        max_sym = max(int(np.abs(syms).max()), 1)
        codec = unit_laplace_codec(max_sym)
        tids = np.zeros(syms.size, np.int32)
    else:
        syms = np.round(y).astype(np.int64)
        max_sym = max(int(np.abs(syms).max()), 1)
        codec = default_laplace_codec(max_sym)
        tids = scale_indices(sigma, default_scale_table())
    y_stream = codec.encode(syms, tids)
    return CompressedHyper(
        y_stream=y_stream,
        z_stream=z_stream,
        y_shape=tuple(y.shape),
        z_shape=tuple(z_hat.shape),
        max_sym=max_sym,
        z_min=z_min,
        z_max=z_max,
        quant=model.quant,
    )


def decompress(model: "ScaleHyperprior", params, comp: CompressedHyper):
    """Decode streams back to the reconstructed image (1, H, W, 3)."""
    from ..coding.gaussian import (
        default_laplace_codec,
        default_scale_table,
        scale_indices,
        unit_laplace_codec,
    )
    from ..coding.api import decode_latent
    from ..models.cheng2020 import _bit_estimator_params, _z_codec

    be = _bit_estimator_params(params, "bit_estimator_z")
    z_codec = _z_codec(be, comp.z_min, comp.z_max)
    z_hat = decode_latent(z_codec, comp.z_stream, comp.z_shape).astype(np.float32)

    sigma = _sigma_of(model, params, z_hat)
    if comp.quant == "sigma-norm":
        codec = unit_laplace_codec(comp.max_sym)
        tids = np.zeros(int(np.prod(comp.y_shape)), np.int32)
        syms = codec.decode(comp.y_stream, tids).reshape(comp.y_shape)
        y_hat = syms.astype(np.float32) * sigma
    else:
        codec = default_laplace_codec(comp.max_sym)
        tids = scale_indices(sigma, default_scale_table())
        syms = codec.decode(comp.y_stream, tids).reshape(comp.y_shape)
        y_hat = syms.astype(np.float32)

    _, _, g_s, _ = _transforms(model)
    recon = np.asarray(_sub(model, params, "g_s", g_s, jnp.asarray(y_hat[None])))
    return np.clip(recon, 0.0, 1.0)
