"""Kodak-style eval: per-image and mean bpp / PSNR / MS-SSIM(-dB).

Reproduces the reference's periodic testKodak loop (reference
train.py:157-198) entirely on-device: metrics are jnp, no per-image CPU hops;
optionally round-trips the latent through the real rANS coder for measured
(not estimated) bpp.
"""

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import ms_ssim, ms_ssim_db, psnr


def bit_estimator_params(params):
    """Extract ops.entropy.BitEstimatorParams from a model param tree."""
    from ..ops.entropy import BitEstimatorParams, BitparmParams

    be = params["params"]["bit_estimator"]
    return BitEstimatorParams(
        f1=BitparmParams(be["f1_h"], be["f1_b"], be["f1_a"]),
        f2=BitparmParams(be["f2_h"], be["f2_b"], be["f2_a"]),
        f3=BitparmParams(be["f3_h"], be["f3_b"], be["f3_a"]),
        f4=BitparmParams(be["f4_h"], be["f4_b"], None),
    )


def eval_kodak(
    model,
    params,
    images: Iterable[np.ndarray],
    use_rans: bool = False,
    rans_bounds: Optional[Tuple[int, int]] = None,
) -> Dict[str, float]:
    """images: iterable of HWC float arrays in [0,1] (whole Kodak frames).

    ``use_rans``: round-trip each latent through the C++ rANS coder and
    report the measured stream size. Symbol bounds default to the actual
    latent range over the set (two-pass); passing explicit ``rans_bounds``
    raises if any latent falls outside them — never silently clips (a
    clipped symbol would decode to a different latent than the one the
    metrics were computed from).
    """

    @jax.jit
    def forward(p, x):
        out = model.apply(p, x, train=False)
        m = jnp.mean((out["recon"] - x) ** 2)
        return out["recon"], out["latent"], out["bpp"], m

    sum_bpp = sum_psnr = sum_ms = sum_msdb = 0.0
    n = 0
    per_image = []
    codec = None
    images = list(images)

    if use_rans and rans_bounds is None:
        # pass 1: actual symbol range over the eval set → exact tables
        lo, hi = 0, 0
        for img in images:
            lat = forward(params, jnp.asarray(img)[None])[1]
            lo = min(lo, int(jnp.floor(jnp.min(lat))))
            hi = max(hi, int(jnp.ceil(jnp.max(lat))))
        rans_bounds = (lo, hi)

    for img in images:
        x = jnp.asarray(img)[None]
        recon, latent, bpp, mse = forward(params, x)
        p = 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
        ms = float(ms_ssim(recon, x))
        msdb = float(ms_ssim_db(jnp.float32(ms)))
        bpp_v = float(bpp)
        if use_rans:
            from ..coding import build_cdf_tables_from_bit_estimator, encode_latent

            if codec is None:
                codec = build_cdf_tables_from_bit_estimator(
                    bit_estimator_params(params), rans_bounds[0], rans_bounds[1]
                )
            lat = np.asarray(jnp.round(latent[0])).astype(np.int64)
            if lat.min() < rans_bounds[0] or lat.max() > rans_bounds[1]:
                raise ValueError(
                    f"latent range [{lat.min()}, {lat.max()}] exceeds rANS "
                    f"bounds {rans_bounds}; widen rans_bounds (clipping would "
                    "corrupt the decoded latent)"
                )
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
