"""Loss library — parity with reference losses.py (file-level citations inline).

All functions are pure jnp over NHWC tensors (latents may be any (..., C)).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precision import get_precision


def charbonnier_loss(x: jax.Array, y: jax.Array, eps: float = 1e-3) -> jax.Array:
    """mean(sqrt(diff² + eps²)) (reference losses.py:195-206)."""
    d = x - y
    return jnp.mean(jnp.sqrt(d * d + eps * eps))


def _pair_latent_mse(e1: jax.Array, e2: jax.Array) -> jax.Array:
    """Per-pair mean latent squared distance, batched: (B, ...)->(B,)."""
    d = (e1 - e2).reshape(e1.shape[0], -1)
    return jnp.mean(d * d, axis=1)


def contrastive_loss_pairs_only(
    e1: jax.Array, e2: jax.Array, margin: float = 1.0
) -> jax.Array:
    """Hinge on per-pair latent MSE above margin (reference losses.py:6-26)."""
    return jnp.mean(jnp.maximum(_pair_latent_mse(e1, e2) - margin, 0.0))


def contrastive_loss(
    e1: jax.Array,
    e2: jax.Array,
    margin: float = 1.0,
    w_pos: float = 1.8,
    w_neg: float = 0.2,
) -> jax.Array:
    """Full pos/neg pairwise hinge (reference losses.py:29-68): positive
    pairs (i,i) pulled under margin; negative pairs (i,j≠i) pushed above."""
    b = e1.shape[0]
    f1 = e1.reshape(b, -1)
    f2 = e2.reshape(b, -1)
    d2 = jnp.mean(
        (f1[:, None, :] - f2[None, :, :]) ** 2, axis=-1
    )  # (B, B) pairwise latent MSE
    eye = jnp.eye(b, dtype=bool)
    pos = jnp.mean(jnp.maximum(jnp.diag(d2) - margin, 0.0))
    neg = jnp.mean(
        jnp.maximum(margin - jnp.where(eye, 0.0, d2), 0.0) * (~eye)
    ) * (b * b / jnp.maximum(b * b - b, 1))
    return w_pos * pos + w_neg * neg


def mse_and_pair_hamming_loss(
    recon: jax.Array,
    target: jax.Array,
    e1: jax.Array,
    e2: jax.Array,
    margin: float = 1.0,
    w_latent: float = 1.0,
) -> jax.Array:
    """Recon MSE + hinged latent distance (reference losses.py:72-97)."""
    mse = jnp.mean((recon - target) ** 2)
    ham = jnp.mean(jnp.maximum(_pair_latent_mse(e1, e2) - margin, 0.0))
    return mse + w_latent * ham


def l1_and_pair_hamming_loss(
    recon: jax.Array,
    target: jax.Array,
    e1: jax.Array,
    e2: jax.Array,
    margin: float = 1.0,
    w_latent: float = 1.0,
    eps: float = 1e-3,
) -> jax.Array:
    """Charbonnier + hinged latent L1 (reference losses.py:99-117)."""
    rec = charbonnier_loss(recon, target, eps)
    d = jnp.mean(jnp.abs(e1 - e2).reshape(e1.shape[0], -1), axis=1)
    return rec + w_latent * jnp.mean(jnp.maximum(d - margin, 0.0))


def mse_and_contrastive_loss(recon, target, e1, e2, margin=1.0, w=1.0):
    """(reference losses.py:119-136)"""
    return jnp.mean((recon - target) ** 2) + w * contrastive_loss(e1, e2, margin)


def l1_and_contrastive_loss(recon, target, e1, e2, margin=1.0, w=1.0):
    """(reference losses.py:138-155)"""
    return charbonnier_loss(recon, target) + w * contrastive_loss(e1, e2, margin)


def mse_and_blank_contrastive_loss(
    recon: jax.Array, target: jax.Array, e1: jax.Array, e2: jax.Array, w: float = 1.0
) -> jax.Array:
    """Recon MSE + symmetric KL between log10-latents of the pair
    (reference losses.py:158-188)."""
    mse = jnp.mean((recon - target) ** 2)
    p = jnp.log10(jnp.abs(e1) + 1e-6)
    q = jnp.log10(jnp.abs(e2) + 1e-6)
    pn = jax.nn.softmax(p.reshape(p.shape[0], -1), axis=-1)
    qn = jax.nn.softmax(q.reshape(q.shape[0], -1), axis=-1)
    kl_pq = jnp.sum(pn * (jnp.log(pn + 1e-10) - jnp.log(qn + 1e-10)), axis=-1)
    kl_qp = jnp.sum(qn * (jnp.log(qn + 1e-10) - jnp.log(pn + 1e-10)), axis=-1)
    return mse + w * jnp.mean(0.5 * (kl_pq + kl_qp))


_LAPLACIAN_KERNEL = None


def _gauss_kernel():
    import numpy as np

    k = np.array([0.05, 0.25, 0.4, 0.25, 0.05], np.float32)
    return jnp.asarray(np.outer(k, k))


def edge_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Laplacian-pyramid edge loss (reference losses.py:208-236): charbonnier
    on laplacian = img - upsample(downsample(blur(img)))."""
    k2d = _gauss_kernel()
    c = x.shape[-1]
    kernel = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")

    def lap(img):
        blurred = lax.conv_general_dilated(
            img, kernel, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=c, precision=get_precision(None),
        )
        down = blurred[:, ::2, ::2, :]
        up = jnp.zeros_like(blurred)
        up = up.at[:, ::2, ::2, :].set(down * 4.0)
        up = lax.conv_general_dilated(
            up, kernel, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=c, precision=get_precision(None),
        )
        return img - up

    return charbonnier_loss(lap(x), lap(y))


def edge_and_charbonnier_loss(
    x: jax.Array, y: jax.Array, w_edge: float = 0.05
) -> jax.Array:
    """(reference losses.py:238-247)"""
    return charbonnier_loss(x, y) + w_edge * edge_loss(x, y)
