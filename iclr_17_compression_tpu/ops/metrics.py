"""Image quality metrics on-device: PSNR, SSIM, MS-SSIM.

Numerics follow the reference's torch implementation (reference msssim.py,
duplicated at models/ms_ssim_torch.py): gaussian window sigma 1.5, VALID
(unpadded) depthwise window conv, contrast term ``cs = mean(v1/v2)``, 5-level
MS-SSIM with weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], 2×2 avg-pool
downsampling between levels, and the Matlab-style product
``prod(cs_l^w_l for l<L) * ssim_L^w_L``.

The depthwise gaussian conv is separable — two 1-D convs — which keeps HBM
traffic minimal; everything runs in one jit on-device (the reference hopped
to CPU per image, train.py:178).

``ms_ssim_db`` is the reference's reporting transform -10*log10(1-v)
(train.py:179).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax



def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio, mean over the whole batch tensor."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range * data_range / jnp.maximum(mse, 1e-20))


def _gaussian_window(win_size: int, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _window_filter(x: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise separable VALID gaussian filter over NHWC.

    ALWAYS HIGHEST precision: metrics are ground truth, never subject to the
    pipeline's bf16 inference mode (measured: under ICLR17C_PRECISION=default
    the bf16 window convs inflated MS-SSIM past 1.0)."""
    c = x.shape[-1]
    wh = jnp.tile(win.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # (k,1,1,C)
    ww = jnp.tile(win.reshape(1, -1, 1, 1), (1, 1, 1, c))  # (1,k,1,C)
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, wh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return lax.conv_general_dilated(
        x, ww, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("win_size", "data_range", "full"))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    win_size: int = 11,
    data_range: float = 1.0,
    full: bool = False,
):
    """SSIM over NHWC images. Returns scalar (or (ssim, cs) if full)."""
    win_size = min(win_size, img1.shape[1], img1.shape[2])
    win = jnp.asarray(_gaussian_window(win_size))
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _window_filter(img1, win)
    mu2 = _window_filter(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _window_filter(img1 * img1, win) - mu1_sq
    sigma2_sq = _window_filter(img2 * img2, win) - mu2_sq
    sigma12 = _window_filter(img1 * img2, win) - mu1_mu2

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2.0 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    ret = jnp.mean(ssim_map)
    if full:
        return ret, cs
    return ret


MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@partial(jax.jit, static_argnames=("win_size", "data_range", "levels"))
def ms_ssim(
    img1: jax.Array,
    img2: jax.Array,
    win_size: int = 11,
    data_range: float = 1.0,
    levels: int = 5,
) -> jax.Array:
    """Multi-scale SSIM over NHWC images (scalar)."""
    weights = jnp.asarray(MSSSIM_WEIGHTS[:levels])
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mssim, mcs = [], []
    for _ in range(levels):
        s, cs = ssim(img1, img2, win_size=win_size, data_range=data_range, full=True)
        mssim.append(s)
        mcs.append(cs)
        img1 = _avg_pool_2x2(img1)
        img2 = _avg_pool_2x2(img2)
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    # cs/ssim can dip negative early in training; negative**fractional = NaN.
    # Clamp like pytorch_msssim's relu(cs) (the reference's DSC loss path) —
    # but grad-safely: d/dx[max(x,0)**w] at x<=0 is inf·0 = NaN under
    # autodiff (verified: jax.grad of maximum(x,0)**0.0448 at -0.1 → nan),
    # which would NaN the whole model on the first anti-correlated batch.
    # The where-in-where pattern keeps the forward value identical (0 at
    # x<=0) and makes the clamped branch's gradient exactly 0.
    def _safe_pow(x, w):
        pos = x > 0.0
        safe = jnp.where(pos, x, 1.0)
        return jnp.where(pos, safe ** w, 0.0)

    pow_cs = _safe_pow(mcs, weights)
    pow_ssim = _safe_pow(mssim, weights)
    return jnp.prod(pow_cs[:-1]) * pow_ssim[-1]


def _avg_pool_2x2(x: jax.Array) -> jax.Array:
    out = lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return out * 0.25


def ms_ssim_db(v: jax.Array) -> jax.Array:
    """-10*log10(1 - ms_ssim), the reference's dB reporting scale."""
    return -10.0 * jnp.log10(jnp.maximum(1.0 - v, 1e-20))
