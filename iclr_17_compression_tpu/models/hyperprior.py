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
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

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
