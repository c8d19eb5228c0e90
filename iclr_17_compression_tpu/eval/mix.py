"""Checkpoint mix-and-match evaluations.

- ``mix_encoder_decoder`` — run a codec with the encoder params from one
  checkpoint and the decoder params from another (reference
  NewTests/testReconSeperateEandD.py).
- ``average_two_models``  — evaluate with the outputs of two checkpoints
  averaged (reference NewTests/testAverage2Models.py).

Both operate on params pytrees (use train.checkpoint.load_params /
train.torch_import for loading), so they are model-family agnostic.
"""

from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import ms_ssim


def mix_encoder_decoder(params_a: Dict, params_b: Dict, encoder_keys=("encoder",)) -> Dict:
    """Params tree taking ``encoder_keys`` subtrees from A, the rest from B."""
    pa = params_a["params"] if "params" in params_a else params_a
    pb = params_b["params"] if "params" in params_b else params_b
    mixed = dict(pb)
    for k in encoder_keys:
        if k not in pa:
            raise KeyError(f"{k!r} not in checkpoint A (has {sorted(pa)})")
        mixed[k] = pa[k]
    return {"params": mixed}


def eval_single_image(
    model, params, images: Iterable[np.ndarray], dump_dir: str = ""
) -> Dict[str, float]:
    """PSNR / MS-SSIM of a single-image codec over a dataset.

    ``dump_dir``: when set, save the best- and worst-PSNR originals and
    reconstructions as PNGs there (reference
    NewTests/testModelRecon.py:120-171 plots exactly those four images).
    The returned dict carries ``best``/``worst`` (index + psnr) either way.
    """
    @jax.jit
    def fwd(im):
        out = model.apply(params, im, train=False)
        return out["recon"], jnp.mean((out["recon"] - im) ** 2)

    n, psnr_sum, ms_sum = 0, 0.0, 0.0
    best = (-np.inf, -1, None)   # (psnr, index, recon)
    worst = (np.inf, -1, None)
    originals = []
    for a in images:
        im = jnp.asarray(a)[None]
        recon, mse = fwd(im)
        p = 10.0 * float(np.log10(1.0 / max(float(mse), 1e-12)))
        psnr_sum += p
        ms_sum += float(ms_ssim(recon, im))
        if p > best[0]:
            best = (p, n, np.asarray(recon[0]))
        if p < worst[0]:
            worst = (p, n, np.asarray(recon[0]))
        originals.append(a if dump_dir else None)
        n += 1

    if dump_dir and n:
        import os

        from PIL import Image

        os.makedirs(dump_dir, exist_ok=True)
        for tag, (p, idx, rec) in (("best", best), ("worst", worst)):
            for name, arr in ((f"{tag}_recon", rec), (f"{tag}_original", originals[idx])):
                u8 = np.clip(np.asarray(arr) * 255.0 + 0.5, 0, 255).astype(np.uint8)
                Image.fromarray(u8).save(os.path.join(dump_dir, f"{name}_{idx}.png"))

    return {
        "psnr": psnr_sum / n,
        "ms_ssim": ms_sum / n,
        "n_images": n,
        "best": {"index": best[1], "psnr": best[0]},
        "worst": {"index": worst[1], "psnr": worst[0]},
    }


def average_two_models(
    model, params_a: Dict, params_b: Dict, images: Iterable[np.ndarray]
) -> Dict[str, float]:
    """Evaluate with recon = (recon_A + recon_B) / 2
    (reference NewTests/testAverage2Models.py)."""
    @jax.jit
    def fwd(im):
        ra = model.apply(params_a, im, train=False)["recon"]
        rb = model.apply(params_b, im, train=False)["recon"]
        recon = 0.5 * (ra + rb)
        return recon, jnp.mean((recon - im) ** 2)

    n, psnr_sum, ms_sum = 0, 0.0, 0.0
    for a in images:
        im = jnp.asarray(a)[None]
        recon, mse = fwd(im)
        psnr_sum += 10.0 * float(np.log10(1.0 / max(float(mse), 1e-12)))
        ms_sum += float(ms_ssim(recon, im))
        n += 1
    return {"psnr": psnr_sum / n, "ms_ssim": ms_sum / n, "n_images": n}
