"""CompressAI-style building blocks as Flax modules (NHWC).

One configurable implementation covers both block families the reference
uses: the vendored-CompressAI blocks (LeakyReLU/ReLU activations; imported at
reference models/temp.py:31-38) and the local GELU fork (reference
models/layers_GELU.py:82-282, incl. the 7×7 ``AttentionBlock_7`` used by
models/modelTemp_largerGz.py). Select via ``act`` / ``unit_act`` /
``unit_kernel`` instead of duplicating files.

Structure per reference:
- ResidualBlock:           conv3x3 → act → conv3x3 → act, 1×1 skip if C changes
- ResidualBlockWithStride: conv3x3(s) → act → conv3x3 → GDN, 1×1(s) skip
- ResidualBlockUpsample:   subpel3x3(r) → act → conv3x3 → IGDN, subpel skip
- AttentionBlock:          a = RU×3, b = RU×3 → 1×1; out = x + a·σ(b)
  where RU = 1×1(C→C/2) → act → k×k → act → 1×1(C/2→C) + skip, act after add.
"""

from typing import Callable

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..ops.conv import pixel_shuffle
from .layers import GDN, TorchConv


def _act(name: str) -> Callable:
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return jax.nn.gelu  # torch nn.GELU() default = exact erf form
    raise ValueError(f"unknown activation {name!r}")


def conv3x3(features: int, stride: int = 1, name: str | None = None) -> TorchConv:
    return TorchConv(features, 3, stride=stride, padding=1, name=name)


def conv1x1(features: int, stride: int = 1, name: str | None = None) -> TorchConv:
    return TorchConv(features, 1, stride=stride, padding=0, name=name)


class SubpelConv(fnn.Module):
    """3×3 conv to C*r² channels + PixelShuffle(r) upsampling
    (reference models/layers_GELU.py:70-74)."""

    features: int
    r: int = 1

    @fnn.compact
    def __call__(self, x):
        x = TorchConv(self.features * self.r ** 2, 3, padding=1, name="conv")(x)
        return pixel_shuffle(x, self.r)


class ResidualBlock(fnn.Module):
    features: int
    act: str = "leaky_relu"

    @fnn.compact
    def __call__(self, x):
        act = _act(self.act)
        out = conv3x3(self.features, name="conv1")(x)
        out = act(out)
        out = conv3x3(self.features, name="conv2")(out)
        out = act(out)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features, name="skip")(x)
        return out + x


class ResidualBlockWithStride(fnn.Module):
    features: int
    stride: int = 2
    act: str = "leaky_relu"

    @fnn.compact
    def __call__(self, x):
        act = _act(self.act)
        out = conv3x3(self.features, stride=self.stride, name="conv1")(x)
        out = act(out)
        out = conv3x3(self.features, name="conv2")(out)
        out = GDN(name="gdn")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv1x1(self.features, stride=self.stride, name="skip")(x)
        return out + x


class ResidualBlock11(fnn.Module):
    """Pointwise residual unit — 1×1 conv, leaky ReLU, 1×1 conv, leaky ReLU,
    plus a 1×1-projected skip when channels change (reference
    models/bottleneck_Att.py:57-87, used by the attention experiments)."""

    features: int
    stride: int = 1

    @fnn.compact
    def __call__(self, x):
        out = conv1x1(self.features, stride=self.stride, name="conv1")(x)
        out = fnn.leaky_relu(out)
        out = conv1x1(self.features, name="conv2")(out)
        out = fnn.leaky_relu(out)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features, name="skip")(x)
        return out + x


class ResidualBlock33(fnn.Module):
    """'Residual' 3×3+1×1 unit that the reference left with its skip path
    commented out and VALID padding (models/bottleneck_Att.py:89-119):
    conv 3×3 (no padding → spatial −2), ReLU, conv 1×1, ReLU, no skip.
    Reproduced as-is for checkpoint parity."""

    features: int
    stride: int = 1

    @fnn.compact
    def __call__(self, x):
        out = TorchConv(
            self.features, 3, stride=self.stride, padding=0, name="conv1"
        )(x)
        out = jax.nn.relu(out)
        out = conv1x1(self.features, name="conv2")(out)
        return jax.nn.relu(out)


class ResidualBlockUpsample(fnn.Module):
    features: int
    upsample: int = 2
    act: str = "leaky_relu"

    @fnn.compact
    def __call__(self, x):
        act = _act(self.act)
        out = SubpelConv(self.features, self.upsample, name="subpel_conv")(x)
        out = act(out)
        out = conv3x3(self.features, name="conv")(out)
        out = GDN(inverse=True, name="igdn")(out)
        identity = SubpelConv(self.features, self.upsample, name="upsample")(x)
        return out + identity


class _ResidualUnit(fnn.Module):
    features: int
    unit_act: str = "relu"
    unit_kernel: int = 3

    @fnn.compact
    def __call__(self, x):
        act = _act(self.unit_act)
        half = self.features // 2
        out = conv1x1(half, name="conv_in")(x)
        out = act(out)
        out = TorchConv(
            half, self.unit_kernel, padding=self.unit_kernel // 2, name="conv_mid"
        )(out)
        out = act(out)
        out = conv1x1(self.features, name="conv_out")(out)
        return act(out + x)


class AttentionBlock(fnn.Module):
    """Cheng-2020 simplified self-attention: sigmoid-gated dual conv branch.

    ``unit_kernel=7`` + ``unit_act='gelu'`` reproduces the reference's
    ``AttentionBlock_7`` (models/layers_GELU.py:231-282).
    """

    features: int
    unit_act: str = "relu"
    unit_kernel: int = 3

    @fnn.compact
    def __call__(self, x):
        def units(prefix, n):
            out = x
            for i in range(n):
                out = _ResidualUnit(
                    self.features,
                    self.unit_act,
                    self.unit_kernel,
                    name=f"{prefix}_ru{i}",
                )(out)
            return out

        a = units("a", 3)
        b = units("b", 3)
        b = conv1x1(self.features, name="b_conv")(b)
        return x + a * jax.nn.sigmoid(b)
