"""Kodak-style eval: per-image and mean bpp / PSNR / MS-SSIM(-dB).

Reproduces the reference's periodic testKodak loop (reference
train.py:157-198) entirely on-device: metrics are jnp, no per-image CPU hops;
optionally round-trips the latent through the real rANS coder for measured
(not estimated) bpp.
"""

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import ms_ssim, ms_ssim_db, psnr


def eval_kodak(
    model,
    params,
    images: Iterable[np.ndarray],
    use_rans: bool = False,
    rans_bounds: tuple = (-64, 64),
) -> Dict[str, float]:
    """images: iterable of HWC float arrays in [0,1] (whole Kodak frames)."""

    @jax.jit
    def forward(x):
        out = model.apply(params, x, train=False)
        m = jnp.mean((out["recon"] - x) ** 2)
        return out["recon"], out["latent"], out["bpp"], m

    sum_bpp = sum_psnr = sum_ms = sum_msdb = 0.0
    n = 0
    per_image = []
    codec = None
    for img in images:
        x = jnp.asarray(img)[None]
        recon, latent, bpp, mse = forward(x)
        p = 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
        ms = float(ms_ssim(recon, x))
        msdb = float(ms_ssim_db(jnp.float32(ms)))
        bpp_v = float(bpp)
        if use_rans:
            from ..coding import build_cdf_tables_from_bit_estimator, encode_latent

            if codec is None:
                from ..ops.entropy import BitEstimatorParams, BitparmParams

                be = params["params"]["bit_estimator"]
                bep = BitEstimatorParams(
                    f1=BitparmParams(be["f1_h"], be["f1_b"], be["f1_a"]),
                    f2=BitparmParams(be["f2_h"], be["f2_b"], be["f2_a"]),
                    f3=BitparmParams(be["f3_h"], be["f3_b"], be["f3_a"]),
                    f4=BitparmParams(be["f4_h"], be["f4_b"], None),
                )
                codec = build_cdf_tables_from_bit_estimator(
                    bep, rans_bounds[0], rans_bounds[1]
                )
            lat = np.clip(
                np.asarray(latent[0]), rans_bounds[0], rans_bounds[1]
            ).astype(np.int64)
            stream = encode_latent(codec, lat)
            bpp_v = len(stream) * 8.0 / (x.shape[1] * x.shape[2])
        per_image.append({"bpp": bpp_v, "psnr": p, "ms_ssim": ms, "ms_ssim_db": msdb})
        sum_bpp += bpp_v
        sum_psnr += p
        sum_ms += ms
        sum_msdb += msdb
        n += 1

    return {
        "bpp": sum_bpp / n,
        "psnr": sum_psnr / n,
        "ms_ssim": sum_ms / n,
        "ms_ssim_db": sum_msdb / n,
        "per_image": per_image,
    }
