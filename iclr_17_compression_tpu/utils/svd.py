"""SVD low-rank re-quantization of the DSC coarse code.

Reference svd_experiment/svd_utils.py:9-25: flatten the (h, w, c) code to a
(h·w, c) matrix, keep the top-i singular triples, recompose, and re-quantize
onto the transmission grid (round(x/16)·16). The experiment (hooked at
reference models/temp.py:263-268) measures how much rate the low-rank
structure can shed before reconstruction quality collapses.
"""

from typing import Tuple

import numpy as np


def decompose_top_i(code: np.ndarray, i: int):
    """Top-i SVD factors of the flattened code.

    code: (h, w, c) or (1, h, w, c). Returns (U, S, Vt, (h, w, c))."""
    z = np.asarray(code)
    if z.ndim == 4:
        z = z[0]
    h, w, c = z.shape
    m = z.reshape(h * w, c).astype(np.float64)
    u, s, vt = np.linalg.svd(m, full_matrices=False)
    return u[:, :i], s[:i], vt[:i, :], (h, w, c)


def compose_requantized(
    u: np.ndarray, s: np.ndarray, vt: np.ndarray, shape: Tuple[int, int, int],
    step: float = 16.0,
) -> np.ndarray:
    """Recompose and snap back to the transmission grid."""
    h, w, c = shape
    recon = (u * s) @ vt
    recon = np.round(recon / step) * step
    return recon.reshape(h, w, c).astype(np.float32)


def low_rank_code(code: np.ndarray, rank: int, step: float = 16.0) -> np.ndarray:
    """One-call version: code → rank-``rank`` requantized code."""
    u, s, vt, shape = decompose_top_i(code, rank)
    out = compose_requantized(u, s, vt, shape, step)
    if np.asarray(code).ndim == 4:
        out = out[None]
    return out


def rank_rate_bits(shape: Tuple[int, int, int], rank: int, bits_per_value: float = 8.0) -> float:
    """Rate of shipping the factors instead of the full code:
    (h·w + c + 1)·rank values."""
    h, w, c = shape
    return (h * w + c + 1) * rank * bits_per_value
