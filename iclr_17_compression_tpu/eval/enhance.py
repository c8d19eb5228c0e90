"""Enhancement-net evaluation (FinalEnhanceNet residual refinement).

Reproduces the reference's enhancement eval
(reference fast_image_filters/test_FIF_enhance.py:40-85): for each triplet
(warped SI, reconstructed, original), apply the residual net to
cat(reconstructed, warped SI) and report PSNR / MS-SSIM of the enhanced
output vs the original — alongside the UN-enhanced reconstruction's metrics,
since the whole point is the delta.
"""

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import ms_ssim, ms_ssim_db


def eval_enhance(
    model,
    params,
    triplets: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    msssim_win: int = 7,
) -> Dict[str, float]:
    """triplets: (si_warped, reconstructed, original) HWC float arrays
    (data.FIFEnhanceDataset items)."""

    @jax.jit
    def forward(si, rec, orig):
        res = model.apply(params, jnp.concatenate([rec, si], axis=-1))
        enhanced = jnp.clip(rec + res, 0.0, 1.0)
        return (
            enhanced,
            jnp.mean((enhanced - orig) ** 2),
            jnp.mean((rec - orig) ** 2),
        )

    sums = {
        "psnr": 0.0, "ms_ssim": 0.0, "ms_ssim_db": 0.0,
        "psnr_unenhanced": 0.0, "ms_ssim_unenhanced": 0.0,
    }
    per_image = []
    n = 0
    for si, rec, orig in triplets:
        s = jnp.asarray(si)[None]
        r = jnp.asarray(rec)[None]
        o = jnp.asarray(orig)[None]
        enhanced, mse, mse0 = forward(s, r, o)
        p = 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
        p0 = 10.0 * np.log10(1.0 / max(float(mse0), 1e-12))
        ms = float(ms_ssim(enhanced, o, win_size=msssim_win))
        ms0 = float(ms_ssim(r, o, win_size=msssim_win))
        row = {
            "psnr": p,
            "psnr_unenhanced": p0,
            "ms_ssim": ms,
            "ms_ssim_unenhanced": ms0,
            "ms_ssim_db": float(ms_ssim_db(jnp.float32(ms))),
        }
        per_image.append(row)
        for k in sums:
            sums[k] += row[k]
        n += 1
    out = {k: v / n for k, v in sums.items()}
    out["per_image"] = per_image
    return out
