"""Two-stage (base + rate-regression) evaluation at the 0.0625-bpp point.

Reproduces the reference's composed eval
(reference NewTests/test_regModel_0_0625.py:98-135): a frozen 0.031-bpp base
model reconstructs im1 from its coarse code + side information; the
regression stage transmits a SECOND 0.031-bpp code whose decoded output is a
residual image added onto the base reconstruction
(reference train_reg0.065model.py:125-130); the operating rate is the sum of
both codes (the reference gzips the concatenated codes,
test_regModel_0_0625.py:105,117-125).
"""

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import build_cdf_tables_from_histogram, encode_latent, gzip_bpp
from ..ops.metrics import ms_ssim, ms_ssim_db


def compose_recon(base_recon, reg_recon_raw):
    """final = clip(base + residual) (reference test_regModel_0_0625.py:113)."""
    return jnp.clip(base_recon + reg_recon_raw, 0.0, 1.0)


def _rans_bpp(code_np: np.ndarray, step: float, n_pix: int) -> float:
    """Measured rate of one coarse code: rANS stream + in-band table cost."""
    sym = np.round(code_np / step).astype(np.int64)
    codec = build_cdf_tables_from_histogram(sym, channel_axis=-1)
    stream = encode_latent(codec, sym)
    table_bytes = codec.ntables * codec.nsym * 2 + 8
    return (len(stream) + table_bytes) * 8.0 / n_pix


def eval_reg_stage(
    base_model,
    base_params,
    reg_model,
    reg_params,
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    msssim_win: int = 7,
) -> Dict[str, float]:
    """PSNR / MS-SSIM of the composed reconstruction + summed two-code rate.

    ``base_model``/``reg_model``: DSCStereoModel instances (presets
    temp_0031bpp and reg_0_0625 in the reference workflow); params frozen.
    """

    @jax.jit
    def forward(im1, im2):
        base = base_model.apply(base_params, im1, im2, train=False)
        reg = reg_model.apply(reg_params, im1, im2, train=False)
        final = compose_recon(base["recon"], reg["recon_raw"])
        mse = jnp.mean((final - im1) ** 2)
        return final, base["code"], reg["code"], mse

    b_step = float(base_model.config.coarse_step)
    r_step = float(reg_model.config.coarse_step)
    sums = {"psnr": 0.0, "ms_ssim": 0.0, "ms_ssim_db": 0.0,
            "bpp_gzip": 0.0, "bpp_rans": 0.0,
            "bpp_base": 0.0, "bpp_reg": 0.0}
    per_image = []
    n = 0
    for a, b in pairs:
        im1 = jnp.asarray(a)[None]
        im2 = jnp.asarray(b)[None]
        final, base_code, reg_code, mse = forward(im1, im2)
        n_pix = im1.shape[1] * im1.shape[2]
        p = 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
        ms = float(ms_ssim(final, im1, win_size=msssim_win))

        bc = np.asarray(base_code[0])
        rc = np.asarray(reg_code[0])
        # gzip proxy of both codes concatenated (reference
        # test_regModel_0_0625.py:117-125 compresses the joint byte string)
        both = np.concatenate([bc.reshape(-1) / b_step, rc.reshape(-1) / r_step])
        bz = gzip_bpp(both * 16.0, n_pix, step=16.0)
        bb = _rans_bpp(bc, b_step, n_pix)
        br = _rans_bpp(rc, r_step, n_pix)

        row = {
            "psnr": p,
            "ms_ssim": ms,
            "ms_ssim_db": float(ms_ssim_db(jnp.float32(ms))),
            "bpp_gzip": bz,
            "bpp_base": bb,
            "bpp_reg": br,
            "bpp_rans": bb + br,
        }
        per_image.append(row)
        for k in sums:
            sums[k] += row[k]
        n += 1

    out = {k: v / n for k, v in sums.items()}
    out["per_image"] = per_image
    return out
