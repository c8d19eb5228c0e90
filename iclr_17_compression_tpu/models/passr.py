"""PASSRnet — parallax-attention stereo super-resolution.

Reference models/PASSRnet.py:7-178. Components:

- ResB: plain 3×3-conv residual block (no-bias convs, LeakyReLU 0.1).
- ResASPPB: 3-stage atrous pyramid (dilations 1/4/8) with 1×1 bottlenecks,
  summed residually.
- PAM: parallax attention — per-row W×W attention between left/right
  features (a batched (B·H, W, C)×(B·H, C, W) matmul → ideal MXU shape),
  validity masks from attention-mass thresholding + morphology, cycle
  matrices M_lrl/M_rlr for cycle-consistency losses.
- PASSRnet: per-eye feature extractor → PAM fusion → PixelShuffle upscale.

Morphology note: the reference post-processes masks with scikit-image
remove_small_objects/holes + disk(3) closing on CPU (PASSRnet.py:164-178).
Here the mask is cleaned **on-device** with binary closing+opening under a
disk(3) structuring element via reduce_window — removing speckle of
comparable scale without a host round-trip; exact small-object-area
semantics (<20 px) are approximated by the opening.
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.layers import TorchConv
from ..ops.conv import pixel_shuffle
from ..ops.precision import get_precision


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _disk(radius: int) -> np.ndarray:
    y, x = np.ogrid[-radius: radius + 1, -radius: radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


def _morph(mask: jax.Array, selem: np.ndarray, op: str) -> jax.Array:
    """Binary dilate/erode of an NHWC {0,1} mask with a flat selem."""
    r = selem.shape[0] // 2
    # conv-based morphology: dilate = any selem hit, erode = all selem hits
    k = jnp.asarray(selem)[:, :, None, None]
    dn = ("NHWC", "HWIO", "NHWC")
    hits = lax.conv_general_dilated(
        mask.astype(jnp.float32), k, (1, 1),
        [(r, r), (r, r)], dimension_numbers=dn,
    )
    if op == "dilate":
        return (hits > 0.5).astype(mask.dtype)
    return (hits >= float(selem.sum()) - 0.5).astype(mask.dtype)


def clean_mask(mask: jax.Array, radius: int = 3) -> jax.Array:
    """Closing then opening with disk(radius) — on-device replacement for the
    reference's skimage pipeline."""
    selem = _disk(radius)
    m = _morph(_morph(mask, selem, "dilate"), selem, "erode")  # closing
    m = _morph(_morph(m, selem, "erode"), selem, "dilate")     # opening
    return m


class ResB(fnn.Module):
    channels: int

    @fnn.compact
    def __call__(self, x):
        out = TorchConv(self.channels, 3, padding=1, use_bias=False, name="conv1")(x)
        out = _lrelu(out)
        out = TorchConv(self.channels, 3, padding=1, use_bias=False, name="conv2")(out)
        return out + x


class ResASPPB(fnn.Module):
    channels: int

    @fnn.compact
    def __call__(self, x):
        c = self.channels

        def stage(inp, idx):
            outs = []
            for j, dil in enumerate((1, 4, 8)):
                h = TorchConv(
                    c, 3, padding=dil, dilation=dil, use_bias=False,
                    name=f"conv{j + 1}_{idx}",
                )(inp)
                outs.append(_lrelu(h))
            cat = jnp.concatenate(outs, axis=-1)
            return TorchConv(c, 1, use_bias=False, name=f"b_{idx}")(cat)

        b1 = stage(x, 1)
        b2 = stage(b1, 2)
        b3 = stage(b2, 3)
        return x + b1 + b2 + b3


class PAM(fnn.Module):
    """Parallax attention over image rows (reference models/PASSRnet.py:113-178)."""

    channels: int

    @fnn.compact
    def __call__(self, x_left, x_right, train: bool = False):
        c = self.channels
        n, h, w, _ = x_left.shape
        rb = ResB(c, name="rb")
        b1 = TorchConv(c, 1, name="b1")
        b2 = TorchConv(c, 1, name="b2")
        b3 = TorchConv(c, 1, name="b3")

        buf_l = rb(x_left)
        buf_r = rb(x_right)

        def row_attention(q_map, s_map):
            # (N,H,W,C) x (N,H,W,C) -> per-row (N,H,W,W) scores
            scores = jnp.einsum(
                "nhic,nhjc->nhij", q_map, s_map,
                preferred_element_type=jnp.float32,
                precision=get_precision(None),
            )
            return jax.nn.softmax(scores, axis=-1)

        m_r2l = row_attention(b1(buf_l), b2(buf_r))  # (N,H,W,W)
        m_l2r = row_attention(b1(buf_r), b2(buf_l))

        v_l2r = (
            jnp.sum(lax.stop_gradient(m_l2r), axis=2) > 0.1
        ).astype(jnp.float32)[..., None]  # (N,H,W,1)
        v_l2r = clean_mask(v_l2r)

        val = b3(x_right)
        fused = jnp.einsum(
            "nhij,nhjc->nhic", m_r2l, val,
            preferred_element_type=jnp.float32,
            precision=get_precision(None),
        ).astype(x_left.dtype)
        out = TorchConv(c, 1, name="fusion")(
            jnp.concatenate([fused, x_left, v_l2r.astype(x_left.dtype)], axis=-1)
        )

        if not train:
            return out
        v_r2l = (
            jnp.sum(lax.stop_gradient(m_r2l), axis=2) > 0.1
        ).astype(jnp.float32)[..., None]
        v_r2l = clean_mask(v_r2l)
        m_lrl = jnp.einsum("nhij,nhjk->nhik", m_r2l, m_l2r)
        m_rlr = jnp.einsum("nhij,nhjk->nhik", m_l2r, m_r2l)
        return out, (m_r2l, m_l2r), (m_lrl, m_rlr), (v_l2r, v_r2l)


class PASSRnet(fnn.Module):
    """Stereo SR net (reference models/PASSRnet.py:7-58)."""

    upscale_factor: int = 2
    channels: int = 64

    @fnn.compact
    def __call__(self, x_left, x_right, train: bool = False):
        c = self.channels

        def feature_extractor(name):
            def apply(x):
                x = TorchConv(c, 3, padding=1, use_bias=False, name=f"{name}_conv0")(x)
                x = _lrelu(x)
                x = ResB(c, name=f"{name}_resb1")(x)
                x = ResASPPB(c, name=f"{name}_aspp1")(x)
                x = ResB(c, name=f"{name}_resb2")(x)
                x = ResASPPB(c, name=f"{name}_aspp2")(x)
                x = ResB(c, name=f"{name}_resb3")(x)
                return x

            return apply

        buf_l = feature_extractor("init_feature_left")(x_left)
        buf_r = feature_extractor("init_feature_right")(x_right)

        pam = PAM(c, name="pam")
        if train:
            buf, ms, cycles, vs = pam(buf_l, buf_r, train=True)
        else:
            buf = pam(buf_l, buf_r, train=False)

        r = self.upscale_factor
        x = buf
        for i in range(4):
            x = ResB(c, name=f"up_resb{i}")(x)
        x = TorchConv(c * r * r, 1, use_bias=False, name="up_conv1")(x)
        x = pixel_shuffle(x, r)
        x = TorchConv(3, 3, padding=1, use_bias=False, name="up_conv2")(x)
        out = TorchConv(3, 3, padding=1, use_bias=False, name="up_conv3")(x)

        if train:
            return out, ms, cycles, vs
        return out


def passr_losses(
    sr: jax.Array,
    hr: jax.Array,
    ms: Tuple[jax.Array, jax.Array],
    cycles: Tuple[jax.Array, jax.Array],
    vs: Tuple[jax.Array, jax.Array],
    lr_left: jax.Array,
    lr_right: jax.Array,
    w_smooth: float = 0.005,
    w_cycle: float = 0.005,
    w_photo: float = 0.005,
) -> dict:
    """SR MSE + attention smoothness + cycle + photometric losses
    (reference train_PASSRnet.py:110-140)."""
    m_r2l, m_l2r = ms
    m_lrl, m_rlr = cycles
    v_l2r, v_r2l = vs

    loss_sr = jnp.mean((sr - hr) ** 2)

    def smooth(m):
        # L1 of adjacent attention rows/cols
        return (
            jnp.mean(jnp.abs(m[:, 1:] - m[:, :-1]))
            + jnp.mean(jnp.abs(m[:, :, 1:] - m[:, :, :-1]))
        )

    loss_smooth = smooth(m_r2l) + smooth(m_l2r)

    n, h, w, _ = lr_left.shape
    eye = jnp.eye(w)[None, None]
    loss_cycle = jnp.mean(jnp.abs(m_lrl - eye)) + jnp.mean(jnp.abs(m_rlr - eye))

    warped_l = jnp.einsum("nhij,nhjc->nhic", m_r2l, lr_right)
    loss_photo = jnp.mean(jnp.abs((warped_l - lr_left) * v_l2r))

    total = loss_sr + w_smooth * loss_smooth + w_cycle * loss_cycle + w_photo * loss_photo
    return {
        "loss": total,
        "loss_sr": loss_sr,
        "loss_smooth": loss_smooth,
        "loss_cycle": loss_cycle,
        "loss_photo": loss_photo,
    }
