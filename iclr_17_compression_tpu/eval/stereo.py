"""DSC stereo eval: PSNR / MS-SSIM / measured bpp over a paired test set.

Reproduces the reference's main DSC eval
(reference NewTests/test_new_model_reconAndSimilarity.py:98-159): center-crop
to ×32, eval forward, PSNR + MS-SSIM vs the target eye, and bitrate of the
transmitted code — here both the reference's gzip proxy AND the real rANS
stream (per-channel histogram tables shipped in-band).
"""

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import gzip_bpp
from ..coding.codec_cli import serialize_dsc_code
from ..ops.metrics import ms_ssim, ms_ssim_db


def eval_stereo_dsc(
    model,
    params,
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    msssim_win: int = 7,
) -> Dict[str, float]:
    @jax.jit
    def forward(im1, im2):
        out = model.apply(params, im1, im2, train=False)
        mse = jnp.mean((out["recon"] - im1) ** 2)
        return out["recon"], out["code"], mse

    cfg = model.config
    sums = {"psnr": 0.0, "ms_ssim": 0.0, "ms_ssim_db": 0.0, "bpp_gzip": 0.0, "bpp_rans": 0.0}
    per_image = []
    n = 0
    for a, b in pairs:
        im1 = jnp.asarray(a)[None]
        im2 = jnp.asarray(b)[None]
        recon, code, mse = forward(im1, im2)
        n_pix = im1.shape[1] * im1.shape[2]
        p = 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
        ms = float(ms_ssim(recon, im1, win_size=msssim_win))
        code_np = np.asarray(code[0])
        bz = gzip_bpp(code_np, n_pix, step=cfg.coarse_step)

        # real rANS rate: the exact container payload bytes codec_cli writes
        # (shape/step header + per-channel freq tables + stream)
        sym = np.round(code_np / cfg.coarse_step).astype(np.int64)
        payload = serialize_dsc_code(sym, float(cfg.coarse_step), cfg.code_clip)
        br = len(payload) * 8.0 / n_pix

        row = {
            "psnr": p,
            "ms_ssim": ms,
            "ms_ssim_db": float(ms_ssim_db(jnp.float32(ms))),
            "bpp_gzip": bz,
            "bpp_rans": br,
        }
        per_image.append(row)
        for k in sums:
            sums[k] += row[k]
        n += 1

    out = {k: v / n for k, v in sums.items()}
    out["per_image"] = per_image
    return out
