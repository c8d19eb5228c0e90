"""Scalar/elementwise math primitives with custom gradients.

``lower_bound`` reproduces the gated-gradient max used by the reference's GDN
(reference: models/GDN.py:10-24): forward is ``max(x, bound)``; the backward
pass lets gradient through when either the input is above the bound OR the
upstream gradient would push the value back up (grad < 0). This keeps clamped
GDN beta/gamma parameters trainable instead of dying at the bound — a plain
``jnp.maximum`` zeroes the gradient exactly in the regime the trick targets.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound)


def _lower_bound_bwd(bound, res, g):
    passthrough = res | (g < 0)
    return (jnp.where(passthrough, g, jnp.zeros_like(g)),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)
