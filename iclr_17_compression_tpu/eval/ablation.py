"""Ablation tooling for the DSC models.

- ``greedy_channel_mask_search``: greedy search for the least-useful code
  channels by masking one more channel at a time and measuring PSNR impact
  (reference NewTests/test_channel_mask.py:59-108).
- ``si_only_recon`` / ``code_only_recon``: reconstruct using only side
  information or only the transmitted code (reference
  NewTests/testAblationNetwork.py:112-114 and the commented z_cat ablations
  in models/temp.py:274-275).
- ``two_level_recon``: residual two-level coding — base recon + compressed
  diff image, final = rec + diff − 127/255
  (reference NewTests/test2LevelReconstruction.py:62-63).
"""

from typing import Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def greedy_channel_mask_search(
    model,
    params,
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    n_mask: int,
) -> List[int]:
    """Returns channel indices in the order they were chosen for masking."""
    cfg = model.config
    n_ch = cfg.code_channels

    @jax.jit
    def mse_with_mask(im1, im2, mask):
        out = model.apply(params, im1, im2, train=False, mask_channels=mask)
        return jnp.mean((out["recon"] - im1) ** 2)

    chosen: List[int] = []
    for _ in range(n_mask):
        best_ch, best_mse = None, float("inf")
        for ch in range(n_ch):
            if ch in chosen:
                continue
            mask = jnp.zeros((n_ch,))
            for c in chosen + [ch]:
                mask = mask.at[c].set(1.0)
            total = 0.0
            for a, b in pairs:
                total += float(
                    mse_with_mask(jnp.asarray(a)[None], jnp.asarray(b)[None], mask)
                )
            if total < best_mse:
                best_mse, best_ch = total, ch
        chosen.append(best_ch)
    return chosen


def si_only_recon(model, params, im2: np.ndarray) -> np.ndarray:
    """Reconstruction from side information alone: feed the SI image as both
    eyes (reference NewTests/testAblationNetwork.py:113: model(input2, input2))."""
    x = jnp.asarray(im2)[None]
    out = model.apply(params, x, x, train=False)
    return np.asarray(out["recon"][0])


def code_only_recon(model, params, im1: np.ndarray) -> np.ndarray:
    """Reconstruction with the SI latent zeroed (the cat ablation,
    models/temp.py:275)."""
    import dataclasses

    from ..models.dsc import DSCStereoModel

    cfg = dataclasses.replace(model.config, si_mode="zero_si")
    ablated = DSCStereoModel(cfg)
    x = jnp.asarray(im1)[None]
    out = ablated.apply(params, x, x, train=False)
    return np.asarray(out["recon"][0])


def two_level_recon(
    base_recon: np.ndarray, orig: np.ndarray, diff_codec_fn
) -> np.ndarray:
    """Residual second level: compress diff = (orig − rec + 127/255)/1, decode
    and compose final = rec + diff̂ − 127/255."""
    offset = 127.0 / 255.0
    diff = np.clip(orig - base_recon + offset, 0.0, 1.0)
    diff_hat = diff_codec_fn(diff)
    return np.clip(base_recon + diff_hat - offset, 0.0, 1.0)
