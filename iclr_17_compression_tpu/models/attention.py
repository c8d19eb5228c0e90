"""Cross-image attention modules for latent fusion.

- ``bottleneck_attention``: full cross-attention between the fused latent
  (queries) and the side-information latent (keys=values) over flattened
  spatial tokens (reference models/bottleneck_Att.py:16-55 — the active code
  path uses raw features, no q/k projections, heads merged). A single MXU
  einsum pair; O((HW)²·C).
- ``PatchMatchAttention``: learned patch-matching — conv-patchify queries
  (9×9 non-overlap) and keys (9×9 stride 3), similarity = −‖q−k‖₂ with a
  learned temperature, output = attention-weighted 9×9 V patches refolded to
  the image grid (reference models/bottleneck_Att.py:121-265; this is the
  module whose weights ship as the repo's model_weights.pth).
- ``NLBlock``: non-local block, gaussian/embedded/dot/concatenate modes
  (reference models/bottleneck_Att.py:269-396), 2-D variant.

The −cdist similarity is expanded to ‖q‖² − 2q·kᵀ + ‖k‖² so the dominant
cost is one q·kᵀ matmul on the MXU instead of a gather-heavy pairwise
distance.
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn.layers import TorchConv
from ..ops.precision import get_precision


def bottleneck_attention(
    q_map: jax.Array, kv_map: jax.Array, scale: Optional[float] = None
) -> jax.Array:
    """Token cross-attention over NHWC maps: out = softmax(q kᵀ · s) v.

    Default scale matches the reference's ``dim_head**-0.5`` with
    dim_head = C (heads=1 active configuration, temp_att_0_03bpp.py:45).
    """
    n, h, w, c = q_map.shape
    if scale is None:
        scale = float(c) ** -0.5
    q = q_map.reshape(n, h * w, c)
    k = kv_map.reshape(n, kv_map.shape[1] * kv_map.shape[2], c)
    dots = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32,
                      precision=get_precision(None)) * scale
    att = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bij,bjc->bic", att, k, preferred_element_type=jnp.float32,
                     precision=get_precision(None))
    return out.reshape(n, h, w, c).astype(q_map.dtype)


def _extract_patches(x: jax.Array, size: int, stride: int) -> jax.Array:
    """NHWC → (N, nH, nW, size*size*C) sliding patches (torch unfold order:
    channel-major within a patch: (C, size, size) flattened)."""
    n, h, w, c = x.shape
    nh = (h - size) // stride + 1
    nw = (w - size) // stride + 1
    patches = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2),  # NCHW for channel-major flattening
        filter_shape=(size, size),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (N, C*size*size, nh, nw), ordered (c, kh, kw)
    return patches.transpose(0, 2, 3, 1), nh, nw


class PatchMatchAttention(fnn.Module):
    """Learned patch-match attention (q: reconstruction-ish map, k/v: the
    side-information image).

    q_patches: Conv(dim→dim_head, k=9, s=9) + ReLU   (non-overlapping)
    k_patches: Conv(dim→dim_head, k=9, s=3) + ReLU   (overlapping)
    v        : raw 9×9 image patches, stride 3, channel-major flatten
    att      = softmax(−‖q−k‖₂ · scale_att);  out = att @ v → refold 9×9 grid

    ``v_img``: optional separate value image (reference
    train_only_att_block.py:140 passes q=z1, k=z2, v=the raw SI image). Its
    grid must match k's: with ``v_scale`` = v_img.H / kv_img.H, value patches
    are ``p·v_scale`` px at stride ``stride_v·v_scale`` — the same token count
    as k — and the refold emits a ``v_scale``-times-larger output (the z-grid
    attention reconstructs at image resolution).
    """

    dim: int
    dim_head: Optional[int] = None
    patch_size: int = 9
    stride_v: int = 3

    @fnn.compact
    def __call__(
        self, q_img: jax.Array, kv_img: jax.Array, v_img: Optional[jax.Array] = None
    ) -> jax.Array:
        d = self.dim_head or self.dim
        p, sv = self.patch_size, self.stride_v
        scale_att = self.param("scale_att", lambda k, s: jnp.ones(()), ())

        q = TorchConv(d, p, stride=p, padding=0, name="q_patches")(q_img)
        q = jax.nn.relu(q)
        k = TorchConv(d, p, stride=sv, padding=0, name="k_patches")(kv_img)
        k = jax.nn.relu(k)

        n, hq, wq, _ = q.shape
        qf = q.reshape(n, hq * wq, d)
        kf = k.reshape(n, -1, d)

        if v_img is None:
            v_img = kv_img
        v_scale = v_img.shape[1] // kv_img.shape[1]
        assert v_img.shape[1] == kv_img.shape[1] * v_scale, (
            "v_img spatial size must be an integer multiple of kv_img's"
        )
        pv, svv = p * v_scale, sv * v_scale
        v_patches, _, _ = _extract_patches(v_img, pv, svv)
        vf = v_patches.reshape(n, -1, v_patches.shape[-1])  # (N, nk, C*pv*pv)

        # −cdist via the matmul expansion (MXU-friendly). ReLU features are
        # all-positive and near-parallel, so ‖q‖²−2qk+‖k‖² cancels
        # catastrophically in fp32; distances are translation-invariant, so
        # centering by the mean k token first shrinks the norm terms and
        # recovers ~10× accuracy vs a direct pairwise cdist (measured in
        # tests/test_patch_attention_import.py against torch.cdist).
        mu = jnp.mean(kf, axis=1, keepdims=True)
        qf = qf - mu
        kf = kf - mu
        q2 = jnp.sum(qf * qf, axis=-1, keepdims=True)
        k2 = jnp.sum(kf * kf, axis=-1, keepdims=True)
        qk = jnp.einsum("bid,bjd->bij", qf, kf, preferred_element_type=jnp.float32,
                        precision=get_precision(None))
        dist2 = jnp.maximum(q2 - 2.0 * qk + jnp.swapaxes(k2, 1, 2), 0.0)
        att = jax.nn.softmax(-jnp.sqrt(dist2 + 1e-12) * scale_att, axis=-1)

        out = jnp.einsum("bij,bjf->bif", att, vf, preferred_element_type=jnp.float32,
                         precision=get_precision(None))
        # refold: (N, hq*wq, C*pv*pv) -> image (N, hq*pv, wq*pv, C); channel-major
        cimg = v_img.shape[-1]
        out = out.reshape(n, hq, wq, cimg, pv, pv)
        out = out.transpose(0, 1, 4, 2, 5, 3)  # n, hq, pv, wq, pv, c
        return out.reshape(n, hq * pv, wq * pv, cimg).astype(v_img.dtype)


class NLBlock(fnn.Module):
    """Non-local block, reference models/bottleneck_Att.py:269-396.

    modes: 'gaussian' | 'embedded' | 'dot' | 'concatenate'.
    dims:  1 (temporal), 2 (spatial), 3 (spatiotemporal) — input is
           channels-last, (N, *spatial, C) with len(spatial) == dims. A k=1
           conv is pointwise over tokens in any dimensionality, so all
           projections run as one dense matmul over the flattened token axis
           (MXU-shaped) regardless of dims.
    z = W_z(y) + x with y = f(x_i, x_j)-weighted aggregation of g(x);
    W_z is zero-initialized so the block starts as the identity (the
    reference's no-BN branch, bottleneck_Att.py:388-391).
    """

    in_channels: int
    inter_channels: Optional[int] = None
    mode: str = "embedded"
    dims: int = 2

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode not in ("gaussian", "embedded", "dot", "concatenate"):
            raise ValueError(self.mode)
        if self.dims not in (1, 2, 3):
            raise ValueError(f"dims must be 1, 2, or 3, got {self.dims}")
        if x.ndim != self.dims + 2:
            raise ValueError(
                f"{self.dims}-D NLBlock expects rank-{self.dims + 2} input, "
                f"got shape {x.shape}"
            )
        c_in = self.in_channels
        c_int = self.inter_channels or max(c_in // 2, 1)
        n = x.shape[0]
        spatial = x.shape[1:-1]
        tokens = 1
        for s in spatial:
            tokens *= s
        # pointwise convs run on the flattened (N, tokens, 1, C) grid — same
        # parameters as a 1×1 ConvNd, valid for dims 1/2/3
        xt = x.reshape(n, tokens, 1, c_in)

        g = TorchConv(c_int, 1, name="g")(xt).reshape(n, tokens, c_int)

        if self.mode == "gaussian":
            theta = x.reshape(n, tokens, c_in)
            phi = x.reshape(n, tokens, c_in)
            f = jnp.einsum("bic,bjc->bij", theta, phi)
            att = jax.nn.softmax(f, axis=-1)
        elif self.mode in ("embedded", "dot"):
            theta = TorchConv(c_int, 1, name="theta")(xt).reshape(n, tokens, c_int)
            phi = TorchConv(c_int, 1, name="phi")(xt).reshape(n, tokens, c_int)
            f = jnp.einsum("bic,bjc->bij", theta, phi)
            att = jax.nn.softmax(f, axis=-1) if self.mode == "embedded" else f / tokens
        else:  # concatenate
            theta = TorchConv(c_int, 1, name="theta")(xt).reshape(n, tokens, c_int)
            phi = TorchConv(c_int, 1, name="phi")(xt).reshape(n, tokens, c_int)
            ti = jnp.broadcast_to(theta[:, :, None, :], (n, tokens, tokens, c_int))
            pj = jnp.broadcast_to(phi[:, None, :, :], (n, tokens, tokens, c_int))
            cat = jnp.concatenate([ti, pj], axis=-1)
            f = TorchConv(1, 1, name="concat_project")(
                cat.reshape(n, tokens * tokens, 1, 2 * c_int)
            )
            f = jax.nn.relu(f).reshape(n, tokens, tokens)
            att = f / tokens

        y = jnp.einsum("bij,bjc->bic", att, g).reshape(n, tokens, 1, c_int)
        w_z = TorchConv(
            c_in, 1, name="w_z",
            weight_init=fnn.initializers.zeros, bias_init=fnn.initializers.zeros,
        )(y)
        return w_z.reshape(x.shape[:-1] + (c_in,)) + x
