"""Fused GDN Pallas kernel.

GDN over NHWC = per-pixel channel matmul + elementwise epilogue:

    norm = beta + (x*x) @ gamma^T ;  y = x * rsqrt(norm)   (or * sqrt, IGDN)

One VMEM pass per pixel tile: the (C, C) gamma matrix stays resident in VMEM
(C ≤ 384 → ≤ 576 KB fp32), pixels stream through in (TILE_P, C) blocks; the
square, MXU matmul, rsqrt and multiply all fuse into a single kernel — no
HBM round trip for x², norm, or the sqrt intermediate (the reference's torch
version materializes all three: models/GDN.py:83-90).

The public ``gdn_pallas`` applies the reference reparameterization
(lower-bound → square → pedestal subtract) outside the kernel (O(C²) work)
and carries a custom VJP whose backward is pure-XLA math:

    n = beta + x² G ; r = n^-1/2 ; y = x∘r          (forward)
    dn = -
 ½ g∘x∘n^-3/2 ; dx = g∘r + 2 x∘(dn Gᵀ) ; dG = (x²)ᵀ dn ; dbeta = Σ dn
"""

import functools

import jax
import jax.numpy as jnp

from ..gdn import GDNParams, gdn_reparam


def _pick_tile(n_pixels: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if n_pixels % t == 0:
            return t
    return 0


def _gdn_kernel(x_ref, gt_ref, beta_ref, o_ref, *, inverse: bool):
    from jax.experimental import pallas as pl  # noqa: F401

    x = x_ref[:]
    x2 = x * x
    norm = (
        jnp.dot(x2, gt_ref[:], preferred_element_type=jnp.float32)
        + beta_ref[:]
    )
    if inverse:
        o_ref[:] = (x * jnp.sqrt(norm)).astype(x.dtype)
    else:
        o_ref[:] = (x * jax.lax.rsqrt(norm)).astype(x.dtype)


def _gdn_pallas_raw(x2d, gamma_t, beta, inverse: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, c = x2d.shape
    tile = _pick_tile(p)
    if tile == 0:
        raise ValueError(f"pixel count {p} not tileable")
    kernel = functools.partial(_gdn_kernel, inverse=inverse)
    return pl.pallas_call(
        kernel,
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c), x2d.dtype),
        interpret=interpret,
    )(x2d, gamma_t, beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gdn_fused(x, params: GDNParams, inverse: bool, interpret: bool):
    beta, gamma = gdn_reparam(params)
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    out = _gdn_pallas_raw(
        x2d, gamma.T.astype(x.dtype), beta.reshape(1, c).astype(jnp.float32),
        inverse, interpret,
    )
    return out.reshape(shape)


def _gdn_fused_fwd(x, params, inverse, interpret):
    return _gdn_fused(x, params, inverse, interpret), (x, params)


def _gdn_fused_bwd(inverse, interpret, res, g):
    """Pure-XLA backward (matches jax.grad of the jnp gdn implementation:
    identical math incl. the LowerBound gradient gating on beta/gamma)."""
    x, params = res

    def ref_fn(x_, params_):
        from ..gdn import gdn_xla as gdn_jnp

        return gdn_jnp(x_, params_, inverse=inverse)

    _, vjp = jax.vjp(ref_fn, x, params)
    dx, dparams = vjp(g)
    return dx, dparams


_gdn_fused.defvjp(_gdn_fused_fwd, _gdn_fused_bwd)


def gdn_pallas(
    x: jax.Array,
    params: GDNParams,
    inverse: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.gdn.gdn using the fused TPU kernel.

    Falls back to the jnp implementation when the pixel count doesn't tile
    (or on non-TPU backends, pass interpret=True in tests).
    """
    c = x.shape[-1]
    p = 1
    for d in x.shape[:-1]:
        p *= d
    if _pick_tile(p) == 0:
        from ..gdn import gdn_xla as gdn_jnp

        return gdn_jnp(x, params, inverse=inverse)
    return _gdn_fused(x, params, inverse, interpret)
