"""Gaussian-conditional rANS tables (scale-indexed, zero-mean symbols).

The joint-autoregressive codec (models/cheng2020.py) codes residuals
``sym = round(y - mu)`` against N(0, sigma) where sigma is predicted per
element. A continuous sigma cannot index a static table, so — following the
standard scheme of the CompressAI backend the reference imports but never
runs (SURVEY.md §2.6) — sigma is snapped to a fixed log-spaced scale table
and each scale level gets one quantized CDF row. Encoder and decoder derive
identical indices because both compute sigma from the same (mu, sigma)
network outputs.

Everything here is deterministic host-side numpy; the per-element scale
indices come from the device in one parallel pass.
"""

import functools
import math
from typing import Tuple

import numpy as np

from .api import RansCodec, _quantize_pmf

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def default_scale_table(
    smin: float = SCALES_MIN, smax: float = SCALES_MAX, levels: int = SCALES_LEVELS
) -> np.ndarray:
    """Log-spaced scale grid [smin, smax], ``levels`` entries."""
    return np.exp(
        np.linspace(math.log(smin), math.log(smax), levels)
    ).astype(np.float64)


def scale_indices(sigma: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Snap each sigma to the smallest table entry >= sigma (searchsorted on
    the upper edge), clipped to the last level. Deterministic."""
    s = np.asarray(sigma, np.float64)
    idx = np.searchsorted(table, s, side="left")
    return np.clip(idx, 0, len(table) - 1).astype(np.int32)


def _normal_cdf(x: np.ndarray) -> np.ndarray:
    from scipy.special import erf  # scipy ships with the baked-in stack

    return 0.5 * (1.0 + erf(x / math.sqrt(2.0)))


def build_gaussian_codec(
    scale_table: np.ndarray,
    max_value: int,
    scale_bits: int = 14,
    tail_mass: float = 1e-9,
) -> RansCodec:
    """One CDF row per scale level over symbols [-max_value, max_value].

    Probability of integer symbol k under N(0, sigma):
    ``Phi((k+.5)/sigma) - Phi((k-.5)/sigma)``; the two end bins absorb the
    tails so every symbol in range is codable.
    """
    grid = np.arange(-max_value, max_value + 1, dtype=np.float64)
    rows = []
    for sigma in np.asarray(scale_table, np.float64):
        upper = _normal_cdf((grid + 0.5) / sigma)
        lower = _normal_cdf((grid - 0.5) / sigma)
        pmf = upper - lower
        pmf[0] += lower[0]  # left tail
        pmf[-1] += 1.0 - upper[-1]  # right tail
        rows.append(_quantize_pmf(np.maximum(pmf, tail_mass), scale_bits))
    freqs = np.stack(rows)
    return RansCodec(freqs, offset=-max_value, scale_bits=scale_bits)


def build_laplace_codec(
    scale_table: np.ndarray,
    max_value: int,
    scale_bits: int = 14,
    tail_mass: float = 1e-9,
) -> RansCodec:
    """Scale-indexed Laplace(0, b) CDF rows over [-max_value, max_value] —
    the conditional prior of the scale-hyperprior codec
    (models/hyperprior.py, mirroring the commented Laplace rate of reference
    model.py:63-69). Same construction as the Gaussian tables with
    F(x) = 1/2 + sign(x)·(1 − exp(−|x|/b))/2."""
    grid = np.arange(-max_value, max_value + 1, dtype=np.float64)

    def cdf(x, b):
        return 0.5 - 0.5 * np.sign(x) * np.expm1(-np.abs(x) / b)

    rows = []
    for b in np.asarray(scale_table, np.float64):
        upper = cdf(grid + 0.5, b)
        lower = cdf(grid - 0.5, b)
        pmf = upper - lower
        pmf[0] += lower[0]
        pmf[-1] += 1.0 - upper[-1]
        rows.append(_quantize_pmf(np.maximum(pmf, tail_mass), scale_bits))
    return RansCodec(np.stack(rows), offset=-max_value, scale_bits=scale_bits)


@functools.lru_cache(maxsize=64)
def default_laplace_codec(max_value: int, scale_bits: int = 14) -> RansCodec:
    """Memoized default-table Laplace codec (see default_gaussian_codec)."""
    return build_laplace_codec(default_scale_table(), max_value, scale_bits)


@functools.lru_cache(maxsize=8)
def unit_laplace_codec(max_value: int, scale_bits: int = 14) -> RansCodec:
    """Single-row Laplace(0, 1) codec — for σ-normalized symbols
    (``round(y/σ)`` against a unit Laplace, reference
    models/synthesis_prior.py:52-61's quantization scheme)."""
    return build_laplace_codec(np.ones((1,)), max_value, scale_bits)


@functools.lru_cache(maxsize=64)
def default_gaussian_codec(max_value: int, scale_bits: int = 14) -> RansCodec:
    """Memoized default-table codec — table construction (64 erf rows) is
    deterministic, so per-image rebuilds (joint codec compress/decompress)
    are pure waste. Callers must not mutate the returned codec."""
    return build_gaussian_codec(default_scale_table(), max_value, scale_bits)


def gaussian_codec_and_indices(
    sigma: np.ndarray,
    max_value: int,
    scale_table: np.ndarray | None = None,
    scale_bits: int = 14,
) -> Tuple[RansCodec, np.ndarray]:
    """Convenience: default table codec + per-element indices for sigma."""
    table = default_scale_table() if scale_table is None else scale_table
    codec = build_gaussian_codec(table, max_value, scale_bits)
    return codec, scale_indices(sigma, table)
