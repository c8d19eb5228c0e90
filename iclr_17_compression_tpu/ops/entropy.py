"""Factorized entropy model — the "BitEstimator" cumulative CDF.

A per-channel monotone CDF built from 4 stacked elementwise layers
(reference models/bitEstimator.py:6-42):

    layer k<4 : u = x * softplus(h_k) + b_k;  x' = u + tanh(u) * tanh(a_k)
    layer 4   : C(x) = sigmoid(x * softplus(h_4) + b_4)

Bits for a quantized latent z:  P(z) = C(z+0.5) - C(z-0.5),
    bits = sum( clip(-log2(P + 1e-10), 0, 50) )            (reference model.py:71-78)

All ops are elementwise over (..., C) with per-channel parameters — pure VPU
work that XLA fuses into a handful of kernels; the same parameters feed the
host-side rANS coder's discretized CDF tables (coding/).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

LOG2 = 0.6931471805599453  # ln(2)


class BitparmParams(NamedTuple):
    h: jax.Array  # (C,)
    b: jax.Array  # (C,)
    a: jax.Array | None  # (C,) — None for the final layer


class BitEstimatorParams(NamedTuple):
    f1: BitparmParams
    f2: BitparmParams
    f3: BitparmParams
    f4: BitparmParams


def bit_estimator_init(rng: jax.Array, ch: int, dtype=jnp.float32) -> BitEstimatorParams:
    """N(0, 0.01) init per reference models/bitEstimator.py:13-16."""
    keys = jax.random.split(rng, 11)

    def n(k):
        return 0.01 * jax.random.normal(k, (ch,), dtype)

    return BitEstimatorParams(
        f1=BitparmParams(n(keys[0]), n(keys[1]), n(keys[2])),
        f2=BitparmParams(n(keys[3]), n(keys[4]), n(keys[5])),
        f3=BitparmParams(n(keys[6]), n(keys[7]), n(keys[8])),
        f4=BitparmParams(n(keys[9]), n(keys[10]), None),
    )


def bitparm_cdf(x: jax.Array, p: BitparmParams, final: bool) -> jax.Array:
    """One CDF layer; x has shape (..., C), params broadcast over channels."""
    u = x * jax.nn.softplus(p.h) + p.b
    if final:
        return jax.nn.sigmoid(u)
    return u + jnp.tanh(u) * jnp.tanh(p.a)


def bit_estimator_cdf(x: jax.Array, params: BitEstimatorParams) -> jax.Array:
    """Cumulative CDF C(x) in (0, 1), monotone in x per channel."""
    x = bitparm_cdf(x, params.f1, final=False)
    x = bitparm_cdf(x, params.f2, final=False)
    x = bitparm_cdf(x, params.f3, final=False)
    return bitparm_cdf(x, params.f4, final=True)


def estimate_bits(z: jax.Array, params: BitEstimatorParams) -> tuple[jax.Array, jax.Array]:
    """Total estimated bits for quantized latents ``z`` (..., C).

    Returns (total_bits, per-element probability). Matches the reference
    clamp-to-[0,50]-bits-per-element rule (model.py:71-74).
    """
    prob = bit_estimator_cdf(z + 0.5, params) - bit_estimator_cdf(z - 0.5, params)
    bits = jnp.clip(-jnp.log(prob + 1e-10) / LOG2, 0.0, 50.0)
    return jnp.sum(bits), prob
