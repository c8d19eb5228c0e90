"""Base Flax modules with torch-parity semantics.

These are thin stateful wrappers over ``iclr_17_compression_tpu.ops``; all
compute lives in the functional layer so it can also be called from Pallas
pipelines and sharded inference paths without Flax in the loop.

Initializer parity:
- torch ``nn.Conv2d`` default: kaiming-uniform(a=sqrt(5)) ⇒
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias,
  fan_in = Cin*kh*kw.
- The reference's analysis/synthesis nets override with
  ``xavier_normal_(gain)`` + constant bias 0.01
  (reference models/analysis_17.py:15-23, models/synthesis_17.py:16-25).
"""

import math
from typing import Callable, Optional, Sequence, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..ops import conv as ops_conv
from ..ops import entropy as ops_entropy
# NB: `import ...ops.gdn as ops_gdn` would bind the *function* re-exported by
# ops/__init__ (attribute shadows submodule) — import names explicitly.
from ..ops.gdn import GDNParams, gdn_param_init
from ..ops.gdn import gdn as gdn_fn


def torch_conv_default_init(fan_in: int) -> Callable:
    """torch kaiming-uniform(a=√5) default conv init: U(±1/√fan_in)."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_normal_gain(gain: float) -> Callable:
    """xavier_normal_ with explicit gain over an HWIO conv weight."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in, fan_out = cin * kh * kw, cout * kh * kw
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


class TorchConv(fnn.Module):
    """NHWC conv with torch nn.Conv2d shape semantics and default init.

    weight: HWIO (kh, kw, Cin, Cout).

    ``input_block = s`` (with stride s, kernel 2s+1, padding s — the
    Ballé-17 conv1 pattern): the input is expected pre-blocked by
    ``ops.conv.space_to_depth(x, s)`` (done at the DATA layer, where it is
    free) and the conv runs as a dense 3×3 stride-1 GEMM over s²·Cin lanes.
    The parameter KEEPS its canonical (2s+1, 2s+1, Cin, Cout) shape —
    checkpoints are interchangeable between blocked and unblocked graphs;
    the reinterpretation (ops.conv.block_conv_weight) is a trace-time
    reshape of a 31 KB tensor.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    groups: int = 1
    input_block: int = 1
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @fnn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = ops_conv._pair(self.kernel_size)
        s = self.input_block
        if s > 1:
            assert self.groups == 1 and self.dilation == 1
            assert (kh, kw) == (2 * s + 1, 2 * s + 1) and ops_conv._pair(
                self.padding
            ) == (s, s) and ops_conv._pair(self.stride) == (s, s), (
                "input_block covers the k=2s+1/pad=s/stride=s edge-conv shape"
            )
            cin = cin // (s * s)
        fan_in = (cin // self.groups) * kh * kw
        w_init = self.weight_init or torch_conv_default_init(fan_in)
        w = self.param("weight", w_init, (kh, kw, cin // self.groups, self.features))
        b = None
        if self.use_bias:
            b_init = self.bias_init or torch_conv_default_init(fan_in)
            b = self.param("bias", b_init, (self.features,))
        if s > 1:
            return ops_conv.conv2d(
                x, ops_conv.block_conv_weight(w, s), b, stride=1, padding=1
            )
        return ops_conv.conv2d(
            x, w, b, stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )


class TorchConvTranspose(fnn.Module):
    """NHWC transposed conv with torch nn.ConvTranspose2d shape semantics.

    weight stored in equivalent-forward-conv HWIO layout (pre-flipped); the
    torch importer converts torch's (Cin, Cout, kh, kw) into this layout.

    ``output_block = s`` (with stride s, kernel 2s+1, padding s,
    output_padding s−1 — the Ballé-17 deconv3 pattern): emits the output
    space-to-depth-blocked, (B, H, W, s²·Cout), as a dense 3×3 stride-1 conv
    (ops.conv.block_deconv_weight); un-block with
    ``ops.conv.depth_to_space(y, s)`` at the data layer. Parameter shapes
    are unchanged — checkpoints are interchangeable with the unblocked graph.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    output_block: int = 1
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @fnn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = ops_conv._pair(self.kernel_size)
        # torch fan_in for ConvTranspose weight (in,out,kh,kw) is out*kh*kw
        fan_in = self.features * kh * kw
        w_init = self.weight_init or torch_conv_default_init(fan_in)
        w = self.param("weight", w_init, (kh, kw, cin, self.features))
        b = None
        if self.use_bias:
            b_init = self.bias_init or torch_conv_default_init(fan_in)
            b = self.param("bias", b_init, (self.features,))
        s = self.output_block
        if s > 1:
            assert (kh, kw) == (2 * s + 1, 2 * s + 1) and ops_conv._pair(
                self.padding
            ) == (s, s) and ops_conv._pair(self.stride) == (s, s) and ops_conv._pair(
                self.output_padding
            ) == (s - 1, s - 1), (
                "output_block covers the k=2s+1/pad=s/stride=s/op=s-1 shape"
            )
            wb = ops_conv.block_deconv_weight(w, s)
            bb = None if b is None else jnp.tile(b, s * s)
            return ops_conv.conv2d(x, wb, bb, stride=1, padding=1)
        return ops_conv.conv_transpose2d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class MaskedConv(fnn.Module):
    """PixelCNN-style masked conv (mask types A/B).

    Reference models/layers_GELU.py:36-62. The mask is applied to the weight
    at call time (a multiply XLA folds into the conv), not by mutating
    parameters as the torch version does.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    mask_type: str = "A"
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0

    @fnn.compact
    def __call__(self, x):
        if self.mask_type not in ("A", "B"):
            raise ValueError(f"bad mask_type {self.mask_type!r}")
        cin = x.shape[-1]
        kh, kw = ops_conv._pair(self.kernel_size)
        fan_in = cin * kh * kw
        w = self.param(
            "weight", torch_conv_default_init(fan_in), (kh, kw, cin, self.features)
        )
        b = self.param("bias", torch_conv_default_init(fan_in), (self.features,))
        mask = jnp.ones((kh, kw, 1, 1), w.dtype)
        mask = mask.at[kh // 2, kw // 2 + (self.mask_type == "B"):].set(0.0)
        mask = mask.at[kh // 2 + 1:].set(0.0)
        return ops_conv.conv2d(x, w * mask, b, stride=self.stride, padding=self.padding)


class GDN(fnn.Module):
    """(Inverse) generalized divisive normalization over channels (NHWC)."""

    inverse: bool = False

    @fnn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        init = gdn_param_init(ch)
        beta = self.param("beta", lambda key, s: init.beta, (ch,))
        gamma = self.param("gamma", lambda key, s: init.gamma, (ch, ch))
        return gdn_fn(x, GDNParams(beta, gamma), inverse=self.inverse)


class BitEstimator(fnn.Module):
    """Factorized-prior cumulative CDF C(x), per channel (reference
    models/bitEstimator.py:27-42). Input (..., C) → CDF values in (0,1)."""

    channel: int

    @fnn.compact
    def __call__(self, x):
        def bitparm(name, final):
            std = 0.01

            def n(key, shape):
                return std * jax.random.normal(key, shape)

            h = self.param(f"{name}_h", n, (self.channel,))
            b = self.param(f"{name}_b", n, (self.channel,))
            a = None if final else self.param(f"{name}_a", n, (self.channel,))
            return ops_entropy.BitparmParams(h, b, a)

        params = ops_entropy.BitEstimatorParams(
            f1=bitparm("f1", False),
            f2=bitparm("f2", False),
            f3=bitparm("f3", False),
            f4=bitparm("f4", True),
        )
        return ops_entropy.bit_estimator_cdf(x, params)
