"""Enhancement / post-filter nets.

- ``ConvBlock`` + ``AdaptiveBatchNorm``: dilated 3×3 conv (circular padding)
  + LeakyReLU(0.2) + adaptive BN ``a·x + b·BN(x)``, identity conv init
  (reference fast_image_filters/basic_blocks.py:14-79).
- ``FIF``: dilated-conv fast-image-filter trunk, dilations 1,2,4,8,1 at 256
  channels (reference fast_image_filters/FIF_net.py:15-46) — used on the DSC
  fusion tensor (temp_and_FIF.py:163-166).
- ``FinalEnhanceNet``: gated two-branch (a·σ(b)) + attention tail over
  cat(recon, warped-SI) → 3-ch residual
  (reference fast_image_filters/final_enhance_net.py:32-64).
"""

from typing import Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.blocks import AttentionBlock, ResidualBlock
from ..nn.layers import TorchConv
from ..ops.conv import conv2d


def _identity_conv_init(key, shape, dtype=jnp.float32):
    """Identity kernel: out[i] passes through in[i] (reference
    basic_blocks.py:63-70). HWIO layout."""
    kh, kw, cin, cout = shape
    w = np.zeros(shape, np.float32)
    for i in range(min(cin, cout)):
        w[kh // 2, kw // 2, i, i] = 1.0
    return jnp.asarray(w, dtype)


class AdaptiveBatchNorm(fnn.Module):
    """a*x + b*BN(x) with scalar a, b (reference basic_blocks.py:13-25)."""

    @fnn.compact
    def __call__(self, x, train: bool = False):
        a = self.param("a", lambda k, s: jnp.ones(()), ())
        b = self.param("b", lambda k, s: jnp.zeros(()), ())
        bn = fnn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return a * x + b * bn


class ConvBlock(fnn.Module):
    """Dilated conv (circular pad) → LeakyReLU(0.2) → AdaptiveBatchNorm."""

    features: int
    kernel_size: int = 3
    dilation: int = 1

    @fnn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        pad = self.dilation  # reference uses padding == dilation for k=3
        cin = x.shape[-1]
        w = self.param(
            "weight", _identity_conv_init, (k, k, cin, self.features)
        )
        b = self.param("bias", lambda key, s: jnp.zeros(s), (self.features,))
        # circular padding then VALID conv (torch padding_mode='circular')
        xp = jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="wrap"
        )
        out = conv2d(xp, w, b, stride=1, padding=0, dilation=self.dilation)
        out = jax.nn.leaky_relu(out, 0.2)
        return AdaptiveBatchNorm(name="abn")(out, train=train)


class FIF(fnn.Module):
    """Fast-image-filter trunk: dilations 1,2,4,8,1 (reference FIF_net.py)."""

    features: int = 256

    @fnn.compact
    def __call__(self, x, train: bool = False):
        for i, dil in enumerate((1, 2, 4, 8, 1)):
            x = ConvBlock(self.features, 3, dil, name=f"conv{i + 1}")(x, train=train)
        return x


class FIFEnhance(fnn.Module):
    """FIF-style enhancement head mapping features→3ch residual (reference
    fast_image_filters/FIF_enhance_net.py / temp_fif_enhance.py: same trunk
    with an output projection)."""

    features: int = 64

    @fnn.compact
    def __call__(self, x, train: bool = False):
        for i, dil in enumerate((1, 2, 4, 8, 1)):
            x = ConvBlock(self.features, 3, dil, name=f"conv{i + 1}")(x, train=train)
        return TorchConv(3, 1, name="out_conv")(x)


class FinalEnhanceNet(fnn.Module):
    """Gated residual enhancer over cat(recon, side_info) (reference
    final_enhance_net.py:32-64). Returns the 3-ch residual to add."""

    n: int = 64
    act: str = "leaky_relu"

    @fnn.compact
    def __call__(self, x):
        nf = self.n

        def branch(prefix, extra_conv):
            h = ResidualBlock(nf, act=self.act, name=f"{prefix}_rb0")(x)
            h = ResidualBlock(nf, act=self.act, name=f"{prefix}_rb1")(h)
            h = ResidualBlock(nf, act=self.act, name=f"{prefix}_rb2")(h)
            if extra_conv:
                h = TorchConv(nf, 1, name=f"{prefix}_conv")(h)
            return h

        a = branch("conv_a", False)
        b = branch("conv_b", True)
        out = a * jax.nn.sigmoid(b)
        out = ResidualBlock(nf, act=self.act, name="final_rb0")(out)
        out = ResidualBlock(nf, act=self.act, name="final_rb1")(out)
        out = AttentionBlock(nf, name="final_att")(out)
        out = ResidualBlock(nf, act=self.act, name="final_rb2")(out)
        out = ResidualBlock(3, act=self.act, name="final_rb3")(out)
        return out
