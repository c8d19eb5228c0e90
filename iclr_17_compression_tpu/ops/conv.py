"""Torch-parity convolution wrappers in TPU-native NHWC layout.

The reference builds every transform out of ``nn.Conv2d(k, stride=s,
padding=p)`` and ``nn.ConvTranspose2d(k, stride=s, padding=p,
output_padding=op)`` (e.g. reference models/analysis_17.py:14-22,
models/synthesis_17.py:15-23). These wrappers reproduce the exact output
shapes and phases so that PyTorch checkpoints imported into this framework
produce bit-matching activations, while lowering to a single
``lax.conv_general_dilated`` each — the op XLA tiles straight onto the MXU.

Layouts:
  activations : NHWC
  conv weight : HWIO  (kh, kw, in_ch, out_ch)
  deconv weight: HWOI viewed as HWIO after flip+swap — we store deconv
                 weights already converted to the equivalent-forward-conv
                 HWIO layout (kh, kw, in_ch_of_equiv_conv=orig_in,
                 out_ch) with kernel pre-flipped, see
                 ``torch_deconv_weight_to_hwio`` in train/torch_import.py.

ConvTranspose equivalence (exact, incl. output_padding):
  PyTorch ConvTranspose2d(C_in→C_out, k, s, p, op) on input x equals a
  forward convolution of the ``s``-dilated input with the spatially-flipped
  kernel (with in/out channel axes swapped), using asymmetric padding
  ``(k-1-p, k-1-p+op)`` per spatial dim and stride 1. Output size:
  (H-1)*s - 2p + k + op, matching torch.
"""

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from .precision import get_precision

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _S2D_ENABLED() -> bool:
    """Opt-in (``ICLR17C_S2D=1``): space-to-depth lowering for small-Cin
    strided convs. Round-2 measurements favored it, but on the current
    backend the direct stride-4 lowering is faster in-graph (encoder 15.9 vs
    17.1 ms, full pipeline 30.8 vs 32.0 ms at batch-128 Kodak bf16 — the s2d
    blocking transpose costs more than the MXU lane waste it recovers;
    tools/exp_kernels.py + /tmp A/B logs, round 3). Kept as a flag so the
    A/B stays one env var."""
    return os.environ.get("ICLR17C_S2D", "0") == "1"


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    dilation: Union[int, Sequence[int]] = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """NHWC conv with torch ``nn.Conv2d`` shape semantics.

    x: (N, H, W, Cin); w: (kh, kw, Cin/groups, Cout); b: (Cout,) or None.
    precision: see ops.precision (per-op arg required on this TPU backend).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    if (
        groups == 1
        and (dh, dw) == (1, 1)
        and max(sh, sw) > 1
        and x.shape[3] <= 4
        and _S2D_ENABLED()
    ):
        # small-Cin strided conv (first layer, Cin=3): space-to-depth form.
        # Off by default — see _S2D_ENABLED for the measured tradeoff.
        out = _conv_s2d(x, w, (sh, sw), (ph, pw), get_precision(precision))
    else:
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=(dh, dw),
            dimension_numbers=_DIMNUMS,
            feature_group_count=groups,
            precision=get_precision(precision),
        )
    if b is not None:
        out = out + b
    return out


def _conv_s2d(x, w, strides, pads, precision):
    """Strided conv as space-to-depth + dense stride-1 conv (exact).

    A stride-s conv with Cin=3 maps terribly onto the MXU: the contraction
    lanes see 3 (padded-to-8) input channels. Rearranging s×s input blocks
    into channels (Cin·s² channels, e.g. 48 for the Ballé-17 9×9/s4 first
    stage) and folding the kernel accordingly yields an equivalent stride-1
    conv whose contraction dim fills the lanes — the dual of the phase-fused
    transposed conv below (``_conv_transpose_fused``). Identity:
      y[oh] = Σ_kh w[kh]·x[s·oh − p + kh]
    pre-pad left by pl = ceil(p/s)·s (shift q = pl − p < s), so input index
    u = s·oh + kh + q; block bh = u//s, phase rh = u%s. The folded kernel is
    w zero-padded to (s·K2) taps then reshaped (K2, s) — one pad+reshape, no
    per-tap scatter. Extra zero taps cost ≤(s·K2/k)× nominal MACs but the
    lane utilization gain is ~s² (measured: see bench/BASELINE.md).
    """
    sh, sw = strides
    ph, pw = pads
    kh, kw, cin, cout = w.shape
    n, h, win, _ = x.shape
    hout = (h + 2 * ph - kh) // sh + 1
    wout = (win + 2 * pw - kw) // sw + 1
    plh = -(-ph // sh) * sh
    plw = -(-pw // sw) * sw
    qh, qw = plh - ph, plw - pw
    k2h = (kh - 1 + qh) // sh + 1
    k2w = (kw - 1 + qw) // sw + 1
    lh = sh * (hout + k2h - 1)
    lw = sw * (wout + k2w - 1)

    xp = jnp.pad(
        x,
        (
            (0, 0),
            (plh, max(0, lh - h - plh)),
            (plw, max(0, lw - win - plw)),
            (0, 0),
        ),
    )[:, :lh, :lw]
    xb = xp.reshape(n, lh // sh, sh, lw // sw, sw, cin)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, lh // sh, lw // sw, sh * sw * cin
    )

    wp = jnp.pad(
        w,
        ((qh, sh * k2h - kh - qh), (qw, sw * k2w - kw - qw), (0, 0), (0, 0)),
    )
    w2 = wp.reshape(k2h, sh, k2w, sw, cin, cout)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(k2h, k2w, sh * sw * cin, cout)

    return lax.conv_general_dilated(
        xb, w2, (1, 1), "VALID",
        dimension_numbers=_DIMNUMS,
        precision=precision,
    )


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    output_padding: Union[int, Sequence[int]] = 0,
    precision=None,
) -> jax.Array:
    """NHWC transposed conv with torch ``nn.ConvTranspose2d`` shape semantics.

    ``w`` must already be in equivalent-forward-conv HWIO layout
    (kh, kw, Cin, Cout) and spatially flipped relative to the torch
    parameterization (handled by initializers / the torch importer).
    Output spatial size: (H-1)*s - 2p + k + op.

    Implementation, chosen per stride (both exact):
    - stride ≤ 2: native ``lhs_dilation`` — this backend compiles dilation-2
      correctly (verified bit-equal to the phase form and to CPU fp32), and
      it is ~25% faster than phase fusion at the Ballé-17 deconv2 shape
      (batch-128 Kodak: 11.6 vs 15.8 ms standalone, tools/exp_kernels.py).
    - stride ≥ 3: **phase decomposition** — all output phases' taps embedded
      in one dense conv + pixel shuffle (``_conv_transpose_fused``). The
      backend MISCOMPILES lhs_dilation ≥ 4 (verified 152% error vs CPU), and
      the zero-stuffed input wastes ~s² of the MXU contraction anyway.
    Falls back to lhs_dilation when the output length is not divisible by
    the stride (phase interleave undefined).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = w.shape[0], w.shape[1]
    n, h, win, cin = x.shape

    h_out = (h - 1) * sh - 2 * ph + kh + oph
    w_out = (win - 1) * sw - 2 * pw + kw + opw

    if sh <= 2 and sw <= 2:
        out = lax.conv_general_dilated(
            x, w, (1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=_DIMNUMS,
            precision=get_precision(precision),
        )
    elif h_out % sh == 0 and w_out % sw == 0:
        out = _conv_transpose_fused(
            x, w, (sh, sw), (ph, pw), (h_out, w_out), get_precision(precision)
        )
    else:
        out = lax.conv_general_dilated(
            x, w, (1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=_DIMNUMS,
            precision=get_precision(precision),
        )
    if b is not None:
        out = out + b
    return out


def _phase_taps(r: int, s: int, k: int, p: int):
    """Kernel taps contributing to output phase r (output index oh = q*s + r):
    y[oh] = sum_m w[m] * xpad[oh + m] with xpad = x upsampled by s and
    shifted by P = k-1-p; tap m hits input index t = (r + m - P)/s when the
    division is exact. Returns (t_min, [m values ordered by t])."""
    big_p = k - 1 - p
    ms = [m for m in range(k) if (r + m - big_p) % s == 0]
    ts = [(r + m - big_p) // s for m in ms]
    order = sorted(range(len(ms)), key=lambda i: ts[i])
    return [ts[i] for i in order], [ms[i] for i in order]


def _conv_transpose_fused(x, w, strides, pads, out_hw, precision):
    """Transposed conv as ONE dense conv + pixel-shuffle.

    Each output phase (rh, rw) of a stride-s transposed conv is a stride-1
    conv of the input with a small sub-kernel (see ``_phase_taps``). Instead
    of s_h·s_w separate conv dispatches + an interleave (poor MXU utilization:
    measured 2.5% on the 9×9/s4 decoder stage), embed every phase's taps into
    a common (Kh, Kw) window — zeros elsewhere — and fold the phase index
    into output channels: one conv Cin → Cout·s_h·s_w, then a pixel-shuffle.
    The zero taps add ≤80% nominal MACs, but the single large conv maps onto
    the systolic array far better than many tiny ones (measured ~3x faster
    end-to-end on the Ballé-17 synthesis stack).
    """
    sh, sw = strides
    ph, pw = pads
    h_out, w_out = out_hw
    kh, kw = w.shape[0], w.shape[1]
    n, h, win, cin = x.shape
    cout = w.shape[3]
    hq, wq = h_out // sh, w_out // sw

    phases_h = [_phase_taps(r, sh, kh, ph) for r in range(sh)]
    phases_w = [_phase_taps(r, sw, kw, pw) for r in range(sw)]
    t0_h = min((t[0][0] for t in phases_h if t[0]), default=0)
    t1_h = max((t[0][-1] for t in phases_h if t[0]), default=0)
    t0_w = min((t[0][0] for t in phases_w if t[0]), default=0)
    t1_w = max((t[0][-1] for t in phases_w if t[0]), default=0)
    k2h, k2w = t1_h - t0_h + 1, t1_w - t0_w + 1

    # dense kernel (k2h, k2w, cin, cout*sh*sw); channel layout (cout, rh, rw)
    # so the trailing pixel-shuffle matches torch's NCHW-order convention.
    w2 = jnp.zeros((k2h, k2w, cin, cout * sh * sw), w.dtype)
    for rh in range(sh):
        ts_h, ms_h = phases_h[rh]
        for rw in range(sw):
            ts_w, ms_w = phases_w[rw]
            pc = rh * sw + rw
            for ti_h, mi_h in zip(ts_h, ms_h):
                for ti_w, mi_w in zip(ts_w, ms_w):
                    w2 = w2.at[
                        ti_h - t0_h, ti_w - t0_w, :, pc::sh * sw
                    ].set(w[mi_h, mi_w])

    # pad so output pixel q reads x[q + t0 .. q + t1]
    pad_l_h, pad_r_h = max(0, -t0_h), max(0, (hq - 1) + t1_h - (h - 1))
    pad_l_w, pad_r_w = max(0, -t0_w), max(0, (wq - 1) + t1_w - (win - 1))
    xp = jnp.pad(x, ((0, 0), (pad_l_h, pad_r_h), (pad_l_w, pad_r_w), (0, 0)))
    # when t0 > 0 (kernel window starts inside), slice the origin forward
    oh0, ow0 = t0_h + pad_l_h, t0_w + pad_l_w
    xp = lax.dynamic_slice(
        xp, (0, oh0, ow0, 0), (n, hq - 1 + k2h, wq - 1 + k2w, cin)
    )

    out = lax.conv_general_dilated(
        xp, w2, (1, 1), "VALID",
        dimension_numbers=_DIMNUMS,
        precision=precision,
    )  # (n, hq, wq, cout*sh*sw) in (cout, rh, rw) channel order
    out = out.reshape(n, hq, wq, cout, sh, sw)
    out = out.transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(n, h_out, w_out, cout)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC PixelShuffle matching torch ``nn.PixelShuffle`` channel order.

    torch operates on NCHW with C = C_out * r * r laid out as
    (c_out, r_h, r_w); after NCHW→NHWC conversion the channel axis keeps that
    ordering, so: (N, H, W, Cout*r*r) → (N, H*r, W*r, Cout).
    (Used by subpel_conv3x3; reference models/layers_GELU.py:70-74.)
    """
    n, h, w, c = x.shape
    if r == 1:
        return x
    cout = c // (r * r)
    x = x.reshape(n, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r_h, w, r_w, cout
    return x.reshape(n, h * r, w * r, cout)


def avg_pool2d(x: jax.Array, k: int = 2, stride: int | None = None) -> jax.Array:
    """NHWC average pool with torch default semantics (floor, no padding)."""
    s = k if stride is None else stride
    out = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding="VALID",
    )
    return out / (k * k)


# ---------------------------------------------------------------------------
# First/last-layer I/O blocking (space-to-depth at the DATA layer).
#
# The Ballé-17 edge convs (9×9 s4, Cin/Cout = 3) use ≤ 2.3% of the MXU's
# 128 input lanes — the committed round-3 profile put conv1 ~6 ms above its
# bandwidth floor at batch-128 Kodak (BASELINE.md). Re-blocking the image
# ON DEVICE costs more in transpose traffic than the lanes recover (measured,
# tools/exp_kernels.py); blocking at the data layer (host numpy, amortized
# into the input pipeline) makes the edge convs dense 48-lane GEMMs with NO
# device-side layout work. Channel order within a block is (r_h, r_w, c) —
# r-major, channel fastest — and the weight rearrangements in nn/layers.py
# (TorchConv.input_block / TorchConvTranspose.output_block) match it, so the
# canonical (9,9,3,N) checkpoint weights are reinterpreted exactly.
# ---------------------------------------------------------------------------

def space_to_depth(x, r: int):
    """NHWC (B, H, W, C) → (B, H/r, W/r, r·r·C), block layout (r_h, r_w, c).
    Works on numpy and jax arrays (pure reshape/transpose)."""
    if r == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, r * r * c)


def depth_to_space(x, r: int):
    """Inverse of :func:`space_to_depth`."""
    if r == 1:
        return x
    n, h, w, cb = x.shape
    c = cb // (r * r)
    x = x.reshape(n, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c)


def block_conv_weight(w: jax.Array, s: int) -> jax.Array:
    """(k, k, Cin, Cout) stride-s conv weight → (3, 3, s²·Cin, Cout) blocked
    weight, for k = 2s+1 and padding = s (the Ballé-17 conv1 pattern).

    Derivation: with input blocks x_b[bi, (r, c)] = x[s·bi + r, c] and output
    grid i, tap di ∈ [0, k) decomposes as di = s·q + r (q ∈ {0,1,2}); taps
    with di ≥ k are zero (spatial zero-pad k → 3s). The blocked conv runs
    stride 1, padding 1 (one block = the original padding s)."""
    k, _, cin, cout = w.shape
    assert k == 2 * s + 1, (k, s)
    w = jnp.pad(w, ((0, 3 * s - k), (0, 3 * s - k), (0, 0), (0, 0)))
    w = w.reshape(3, s, 3, s, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(3, 3, s * s * cin, cout)


def block_deconv_weight(w: jax.Array, s: int) -> jax.Array:
    """(k, k, Cin, Cout) stride-s transposed-conv weight (equivalent-forward
    flipped HWIO layout, as stored by TorchConvTranspose) → (3, 3, Cin,
    s²·Cout) blocked weight producing space-to-depth-blocked output, for
    k = 2s+1, padding = s, output_padding = s−1 (the Ballé-17 deconv3
    pattern).

    Derivation: y[s·bo + po] = Σ_d x[bo + d] · w_f[s·d − po + s] for
    d ∈ {−1,0,1}; front-padding w_f by s−1 makes the index s·(d+1) + (s−1−po)
    — i.e. reshape (3, s) then reverse the phase axis."""
    k, _, cin, cout = w.shape
    assert k == 2 * s + 1, (k, s)
    w = jnp.pad(w, ((s - 1, 0), (s - 1, 0), (0, 0), (0, 0)))  # front → 3s
    w = w.reshape(3, s, 3, s, cin, cout)[:, ::-1, :, ::-1]
    w = w.transpose(0, 2, 4, 1, 3, 5)  # (D1, D2, Cin, r1, r2, Cout)
    return w.reshape(3, 3, cin, s * s * cout)
