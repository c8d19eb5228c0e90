"""Latent-similarity and code-distribution analyses.

Reproduces the reference's encoder-introspection scripts:

- ``encoder_similarity``   — reference NewTests/testEncoderSimilarity.py:
  per-pair normalized Hamming distance between (binarized) codes,
  conditional entropy + uncertainty coefficient of the paired latents
  (:131-134), global code min/max tracking, optional per-channel
  side-by-side latent image dumps (:111-122).
- ``code_distribution``    — reference NewTests/testCodeDistribution.py:
  per-channel latent variance across a dataset (:118-125), histogram of the
  flattened code, and the gzip compression factor (:110-111).
- ``encoder_distances``    — reference NewTests/testEncoderDistances.py:
  latent L2/L1 distances between pairs.
"""

import gzip
import os
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.analysis import conditional_entropy, uncertainty_coefficient


def _encode_pair(model, params, a: np.ndarray, b: np.ndarray):
    @jax.jit
    def fwd(im1, im2):
        out = model.apply(params, im1, im2, train=False)
        return out["z1"], out["z2"]

    z1, z2 = fwd(jnp.asarray(a)[None], jnp.asarray(b)[None])
    return np.asarray(z1[0]), np.asarray(z2[0])


def save_channel_images(z1: np.ndarray, z2: np.ndarray, out_dir: str) -> List[str]:
    """Per-channel [z1; z2] side-by-side grayscale dumps
    (reference testEncoderSimilarity.py:111-122)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for c in range(z1.shape[-1]):
        cat = np.concatenate([z1[..., c], z2[..., c]], axis=0)
        rng = cat.max() - cat.min()
        cat = (cat - cat.min()) / (rng if rng > 0 else 1.0)
        p = os.path.join(out_dir, f"{c:04d}.png")
        Image.fromarray((cat * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def encoder_similarity(
    model,
    params,
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    quant_step: float = 1.0,
    dump_channels_dir: Optional[str] = None,
    bins: int = 100,
) -> Dict[str, float]:
    """Aggregate latent-similarity statistics over stereo pairs."""
    n = 0
    ham_sum = unc_sum = hcond_sum = 0.0
    c_min, c_max = np.inf, -np.inf
    for i, (a, b) in enumerate(pairs):
        z1, z2 = _encode_pair(model, params, a, b)
        q1 = np.round(z1 / quant_step)
        q2 = np.round(z2 / quant_step)
        ham_sum += float(np.mean(q1 != q2))
        h1, h2, h12 = conditional_entropy(z1.reshape(-1), z2.reshape(-1), bins)
        hcond_sum += h12 - h2  # H(z1 | z2)
        unc_sum += uncertainty_coefficient(z1.reshape(-1), z2.reshape(-1), bins)
        c_min = min(c_min, float(z1.min()), float(z2.min()))
        c_max = max(c_max, float(z1.max()), float(z2.max()))
        if dump_channels_dir is not None and i == 0:
            save_channel_images(z1, z2, dump_channels_dir)
        n += 1
    return {
        "normalized_hamming": ham_sum / n,
        "uncertainty_coefficient": unc_sum / n,
        "conditional_entropy": hcond_sum / n,
        "code_min": c_min,
        "code_max": c_max,
        "n_pairs": n,
    }


def encoder_distances(
    model, params, pairs: Iterable[Tuple[np.ndarray, np.ndarray]]
) -> Dict[str, float]:
    """Mean latent L1/L2 distances between the two eyes
    (reference NewTests/testEncoderDistances.py)."""
    n = 0
    l1 = l2 = 0.0
    for a, b in pairs:
        z1, z2 = _encode_pair(model, params, a, b)
        d = z1 - z2
        l1 += float(np.abs(d).mean())
        l2 += float(np.sqrt((d ** 2).mean()))
        n += 1
    return {"latent_l1": l1 / n, "latent_l2": l2 / n, "n_pairs": n}


def gzip_factor(code: np.ndarray, binary: bool = False) -> float:
    """The reference's compression-factor probe: element count over gzip'ed
    bits (reference testCodeDistribution.py:110-111 uses packbits for binary
    codes; byte codes use the +128 uint8 layout)."""
    if binary:
        payload = np.packbits(np.asarray(code) == 0)
    else:
        payload = np.clip(np.asarray(code) + 128, 0, 255).astype(np.uint8)
    n_bits = len(gzip.compress(payload.tobytes())) * 8
    return code.size / max(n_bits, 1)


def code_distribution(
    model,
    params,
    images: Iterable[np.ndarray],
    code_key: str = "latent",
    hist_bins: int = 64,
) -> Dict[str, np.ndarray]:
    """Per-channel variance + histogram of a single-image model's code
    across a dataset (reference NewTests/testCodeDistribution.py)."""
    @jax.jit
    def fwd(im):
        return model.apply(params, im, train=False)[code_key]

    var_sum = None
    values = []
    n = 0
    for a in images:
        code = np.asarray(fwd(jnp.asarray(a)[None])[0])
        v = code.var(axis=(0, 1))  # per-channel spatial variance
        var_sum = v if var_sum is None else var_sum + v
        values.append(code.reshape(-1))
        n += 1
    flat = np.concatenate(values)
    hist, edges = np.histogram(flat, bins=hist_bins)
    return {
        "per_channel_variance": var_sum / n,
        "histogram": hist,
        "bin_edges": edges,
        "gzip_factor": gzip_factor(flat),
        "n_images": n,
    }
