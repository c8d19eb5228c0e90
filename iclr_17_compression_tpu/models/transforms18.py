"""Ballé-2018-style 4-stage transforms + hyperprior transforms.

Parity with the reference library components (which the reference imports via
models/__init__.py but never drives with a surviving trainer — they are kept
as first-class models here):

  Analysis18      : 4× (conv 5×5 s2 p2 + GDN), N ch, last stage N→M (÷16)
                    (reference models/analysis.py:8-34)
  Synthesis18     : 4× (deconv 5×5 s2 p2 op1 + IGDN), M→N…N→3 (×16)
                    (reference models/synthesis.py:8-44)
  AnalysisPrior   : |x| → conv3×3 s1 → ReLU → conv5×5 s2 → ReLU → conv5×5 s2
                    (÷4 on the latent grid; reference models/analysis_prior.py:6-28)
  SynthesisPrior  : deconv5×5 s2 op1 → ReLU ×2 → deconv3×3 s1 → exp  (σ > 0)
                    (reference models/synthesis_prior.py:11-39)

The reference's module-level ``out_channel_N/M`` globals (commented out in
models/basics.py — an import-time latent bug) are replaced by explicit
constructor fields with the canonical N=192, M=320 defaults.
"""

import math

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn.layers import GDN, TorchConv, TorchConvTranspose, xavier_normal_gain

_B001 = lambda key, shape: jnp.full(shape, 0.01)


class Analysis18(fnn.Module):
    out_channel_n: int = 192
    out_channel_m: int = 320

    @fnn.compact
    def __call__(self, x):
        n, m = self.out_channel_n, self.out_channel_m
        gains = [
            math.sqrt(2 * (3 + n) / 6),
            math.sqrt(2),
            math.sqrt(2),
            math.sqrt(2 * (m + n) / (n + n)),
        ]
        feats = [n, n, n, m]
        for i in range(4):
            x = TorchConv(
                feats[i], 5, stride=2, padding=2,
                weight_init=xavier_normal_gain(gains[i]), bias_init=_B001,
                name=f"conv{i + 1}",
            )(x)
            if i < 3:
                x = GDN(name=f"gdn{i + 1}")(x)
        return x


class Synthesis18(fnn.Module):
    out_channel_n: int = 192
    out_channel_m: int = 320

    @fnn.compact
    def __call__(self, x):
        n, m = self.out_channel_n, self.out_channel_m
        gains = [
            math.sqrt(2 * (m + n) / (m + m)),
            math.sqrt(2),
            math.sqrt(2),
            math.sqrt(2 * (n + 3) / (n + n)),
        ]
        feats = [n, n, n, 3]
        for i in range(4):
            x = TorchConvTranspose(
                feats[i], 5, stride=2, padding=2, output_padding=1,
                weight_init=xavier_normal_gain(gains[i]), bias_init=_B001,
                name=f"deconv{i + 1}",
            )(x)
            if i < 3:
                x = GDN(inverse=True, name=f"igdn{i + 1}")(x)
        return x


class AnalysisPrior(fnn.Module):
    out_channel_n: int = 192
    out_channel_m: int = 320

    @fnn.compact
    def __call__(self, x):
        n, m = self.out_channel_n, self.out_channel_m
        x = jnp.abs(x)
        x = TorchConv(
            n, 3, stride=1, padding=1,
            weight_init=xavier_normal_gain(math.sqrt(2 * (m + n) / (m + m))),
            bias_init=_B001, name="conv1",
        )(x)
        x = jax.nn.relu(x)
        x = TorchConv(
            n, 5, stride=2, padding=2,
            weight_init=xavier_normal_gain(math.sqrt(2)), bias_init=_B001, name="conv2",
        )(x)
        x = jax.nn.relu(x)
        x = TorchConv(
            n, 5, stride=2, padding=2,
            weight_init=xavier_normal_gain(math.sqrt(2)), bias_init=_B001, name="conv3",
        )(x)
        return x


class SynthesisPrior(fnn.Module):
    """Hyper-decoder producing σ = exp(net(ẑ)) for σ-normalized quantization
    (scheme documented by the reference's executable main,
    models/synthesis_prior.py:42-67: q = round(y/σ), ŷ = q·σ)."""

    out_channel_n: int = 192
    out_channel_m: int = 320

    @fnn.compact
    def __call__(self, x):
        n, m = self.out_channel_n, self.out_channel_m
        sq2 = math.sqrt(2)
        x = TorchConvTranspose(
            n, 5, stride=2, padding=2, output_padding=1,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv1",
        )(x)
        x = jax.nn.relu(x)
        x = TorchConvTranspose(
            n, 5, stride=2, padding=2, output_padding=1,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv2",
        )(x)
        x = jax.nn.relu(x)
        x = TorchConvTranspose(
            m, 3, stride=1, padding=1,
            weight_init=xavier_normal_gain(math.sqrt(2 * (m + n) / (n + n))),
            bias_init=_B001, name="deconv3",
        )(x)
        return jnp.exp(x)
