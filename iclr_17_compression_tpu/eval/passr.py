"""PASSRnet stereo-SR evaluation.

Reproduces the reference's SR eval loop
(reference NewTests/test_passrNet.py:98-160): for each test triplet
(LR left, HR right, HR left), run the net, report PSNR / MS-SSIM of the SR
output vs the HR left eye, plus the bicubic-ish baseline (the blurry input
itself) so the SR gain is visible.
"""

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import ms_ssim, ms_ssim_db


def eval_passr(
    model,
    params,
    triplets: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    msssim_win: int = 7,
) -> Dict[str, float]:
    """triplets: (blurry_left, hr_right, hr_left) HWC float arrays
    (data.StereoPassrDataset items)."""

    @jax.jit
    def forward(blurry, right, left):
        sr = model.apply(params, blurry, right, train=False)
        sr = jnp.clip(sr, 0.0, 1.0)
        tgt = left[:, : sr.shape[1], : sr.shape[2]]
        blr = blurry[:, : sr.shape[1], : sr.shape[2]]
        return sr, jnp.mean((sr - tgt) ** 2), jnp.mean((blr - tgt) ** 2), tgt

    sums = {"psnr": 0.0, "ms_ssim": 0.0, "ms_ssim_db": 0.0, "psnr_input": 0.0}
    per_image = []
    n = 0
    for blurry, right, left in triplets:
        b = jnp.asarray(blurry)[None]
        r = jnp.asarray(right)[None]
        l = jnp.asarray(left)[None]
        sr, mse, mse_in, tgt = forward(b, r, l)
        p = 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
        p_in = 10.0 * np.log10(1.0 / max(float(mse_in), 1e-12))
        ms = float(ms_ssim(sr, tgt, win_size=msssim_win))
        row = {
            "psnr": p,
            "psnr_input": p_in,
            "ms_ssim": ms,
            "ms_ssim_db": float(ms_ssim_db(jnp.float32(ms))),
        }
        per_image.append(row)
        for k in sums:
            sums[k] += row[k]
        n += 1
    out = {k: v / n for k, v in sums.items()}
    out["per_image"] = per_image
    return out
