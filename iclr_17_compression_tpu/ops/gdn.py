"""Generalized Divisive Normalization — functional core.

    y_i = x_i / sqrt(beta_i + sum_j gamma_{ij} * x_j^2)      (forward GDN)
    y_i = x_i * sqrt(beta_i + sum_j gamma_{ij} * x_j^2)      (inverse / IGDN)

Numerics match the reference layer (reference models/GDN.py:27-94):
parameters are stored *reparameterized* as ``sqrt(value + pedestal)`` with
pedestal ``reparam_offset**2`` (offset 2**-18 → pedestal 2**-36), clamped from
below through the gated-gradient ``lower_bound`` before being squared back.

TPU mapping: the norm pool ``sum_j gamma_{ij} x_j^2`` is a channels×channels
contraction per pixel — the reference runs it as a 1×1 conv
(models/GDN.py:83); here it is an einsum that XLA lowers to a single MXU
matmul over the flattened N*H*W pixel axis, fused with the surrounding
square / rsqrt / multiply elementwise ops.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math import lower_bound

REPARAM_OFFSET = 2.0 ** -18
PEDESTAL = REPARAM_OFFSET ** 2
BETA_MIN = 1e-6
GAMMA_INIT = 0.1

BETA_BOUND = (BETA_MIN + PEDESTAL) ** 0.5
GAMMA_BOUND = REPARAM_OFFSET


class GDNParams(NamedTuple):
    """Reparameterized GDN parameters.

    beta:  (C,)  — stored as sqrt(beta + pedestal)
    gamma: (C, C) — stored as sqrt(gamma + pedestal); gamma[i, j] couples
            output channel i to input channel j (torch conv weight (out,in)).
    """

    beta: jax.Array
    gamma: jax.Array


def gdn_param_init(ch: int, dtype=jnp.float32) -> GDNParams:
    """Identity-ish init matching reference models/GDN.py:46-62."""
    beta = jnp.sqrt(jnp.ones((ch,), dtype) + PEDESTAL)
    gamma = jnp.sqrt(GAMMA_INIT * jnp.eye(ch, dtype=dtype) + PEDESTAL)
    return GDNParams(beta=beta, gamma=gamma)


def gdn_reparam(params: GDNParams) -> tuple[jax.Array, jax.Array]:
    """Clamp (gated-gradient) and un-reparameterize to effective beta/gamma."""
    beta = lower_bound(params.beta, BETA_BOUND)
    beta = beta * beta - PEDESTAL
    gamma = lower_bound(params.gamma, GAMMA_BOUND)
    gamma = gamma * gamma - PEDESTAL
    return beta, gamma


def _use_pallas_kernel() -> bool:
    """Dispatch policy for the fused Pallas GDN (ops/pallas/gdn_kernel.py):
    ICLR17C_GDN_KERNEL = pallas | xla (default).

    Measured on the v5e tunnel: the kernel beats the XLA lowering in
    isolation (1.93 vs 2.59 ms on the 8×128×192×128 map) but LOSES inside
    the full Ballé-17 forward (354 vs 394 Mpix/s) — pallas_call is a fusion
    barrier, and XLA otherwise folds GDN's square/rsqrt/mul into the
    adjacent convs. Default is therefore the XLA path; the kernel stays as
    an opt-in for standalone-GDN-heavy pipelines and as the template for
    wider fused epilogues.

    Round 2 took the fusion-barrier argument to its conclusion and fused the
    CONV ITSELF with the GDN epilogue (ops/pallas/conv_gdn_kernel.py: each
    strided conv phase-decomposed to 9 MXU tap-matmuls + GDN in one VMEM
    pass, halo DMA double-buffered). It also loses: 847 vs 1384 Mpix/s on
    the full encoder (numbers + diagnosis in that module's docstring). The
    XLA conv pipeline is simply better at this shape regime; both kernels
    remain opt-in, and the honest policy stands: default XLA."""
    import os

    return os.environ.get("ICLR17C_GDN_KERNEL", "xla") == "pallas"


def gdn(x: jax.Array, params: GDNParams, inverse: bool = False) -> jax.Array:
    """Apply (I)GDN over the channel (last) axis of an NHWC tensor.

    Accepts any leading shape (..., C). Set ICLR17C_GDN_KERNEL=pallas to
    dispatch to the fused Pallas kernel (see ``_use_pallas_kernel`` for the
    measured tradeoff; gradients are identical via custom VJP).
    """
    if _use_pallas_kernel():
        from .pallas.gdn_kernel import gdn_pallas

        return gdn_pallas(x, params, inverse=inverse)
    return gdn_xla(x, params, inverse=inverse)


def gdn_xla(x: jax.Array, params: GDNParams, inverse: bool = False) -> jax.Array:
    """The pure-XLA lowering (einsum norm pool). Also the fallback target of
    the Pallas kernel for non-tileable shapes."""
    from .precision import get_precision

    beta, gamma = gdn_reparam(params)
    x2 = x * x
    # norm[..., i] = beta[i] + sum_j x2[..., j] * gamma[i, j]
    norm = jnp.einsum(
        "...j,ij->...i", x2, gamma,
        preferred_element_type=jnp.float32,
        precision=get_precision(None),
    ) + beta
    norm = jnp.sqrt(norm).astype(x.dtype)
    return x * norm if inverse else x / norm
