"""Quantization primitives.

The reference family uses three quantizers (all reproduced here with the same
train/eval split, but as explicit pure functions instead of branching on a
module-global ``self.training`` flag):

1. fine:   train = x + U(-0.5, 0.5) noise; eval = round(x)
           (reference model.py:48-56)
2. coarse: train = x + U(-8, 8) noise; eval = round(x/16)*16, clamp ±128 —
           the 4-bit "sent over the channel" code of the DSC models
           (reference models/temp.py:236-260)
3. binary: (x > 0.5) with straight-through identity gradient
           (reference models/binarizer.py:7-27)

``round_ste`` / ``quantize_coarse_ste`` additionally offer the modern STE
formulation (round in forward, identity gradient) which the reference
approximates with additive noise.
"""

import jax
import jax.numpy as jnp


def add_uniform_noise(x: jax.Array, rng: jax.Array, half_width: float = 0.5) -> jax.Array:
    """Additive uniform quantization noise U(-half_width, half_width)."""
    return x + jax.random.uniform(
        rng, x.shape, dtype=x.dtype, minval=-half_width, maxval=half_width
    )


def round_ste(x: jax.Array) -> jax.Array:
    """round(x) in the forward pass, identity gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_coarse(x: jax.Array, step: float = 16.0, clip: float = 128.0) -> jax.Array:
    """Eval-mode coarse quantizer: round to multiples of ``step``, clamp ±clip.

    step=16 with clip=128 gives the 17-level (~4-bit) code of the flagship
    DSC model (reference models/temp.py:256-260).
    """
    return jnp.clip(jnp.round(x / step) * step, -clip, clip)


def quantize_coarse_ste(x: jax.Array, step: float = 16.0, clip: float = 128.0) -> jax.Array:
    """Coarse quantizer with straight-through gradient (clip is hard)."""
    return x + jax.lax.stop_gradient(quantize_coarse(x, step, clip) - x)


@jax.custom_vjp
def binarize_ste(x: jax.Array) -> jax.Array:
    """(x > 0.5) → {0, 1} with identity backward pass."""
    return (x > 0.5).astype(x.dtype)


def _binarize_fwd(x):
    return binarize_ste(x), None


def _binarize_bwd(_, g):
    return (g,)


binarize_ste.defvjp(_binarize_fwd, _binarize_bwd)
