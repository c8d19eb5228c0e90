"""Quantize+clamp+pack epilogue: encoder output → entropy-coder symbols.

The serving encoder's last step (reference models/temp.py:254-260: coarse
``round(z/16)·16`` + clamp ±128) produces float code tensors that the host
rANS coder then re-quantizes to integer symbols (coding/api.py encode path).
This kernel fuses the whole epilogue ON DEVICE and emits the final uint8
symbol buffer — the exact bytes the entropy coder consumes — so the
host↔device transfer shrinks 4× (uint8 vs float32) and the host does zero
arithmetic before coding. This is the fusion target the round-2 conv+GDN
kernel notes nominated (ops/pallas/conv_gdn_kernel.py).

Two lowerings, same contract (dispatch measured by tools/exp_quant_pack.py;
policy note at the bottom):

  quantize_pack_xla    — jnp ops; XLA fuses them into one elementwise pass.
  quantize_pack_pallas — one Pallas kernel, VMEM-tiled over rows.

Both return (symbols_u8, dequantized): symbols = round(x/step) + offset as
uint8 (offset = clip limit in symbol units, so the range is [0, 2·lim]);
dequantized = the clamped step-grid float the decoder-side graph consumes.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
import jax.experimental.pallas.tpu as pltpu


def _lim_of(step: float, clip: float) -> int:
    lim = int(round(clip / step))
    if 2 * lim + 1 > 256:
        raise ValueError(
            f"clip/step = {lim}: {2 * lim + 1} symbol values exceed uint8; "
            "use a coarser step or smaller clip"
        )
    return lim


def quantize_pack_xla(
    x: jax.Array, step: float, clip: float
) -> Tuple[jax.Array, jax.Array]:
    lim = _lim_of(step, clip)
    sym = jnp.clip(jnp.round(x / step), -lim, lim)
    return (sym + lim).astype(jnp.uint8), sym * step


def _qp_kernel(x_ref, sym_ref, deq_ref, *, step, lim):
    x = x_ref[...]
    sym = jnp.clip(jnp.round(x * (1.0 / step)), -lim, lim)
    # Mosaic has no f32->u8 cast; go through i32 (value range is [0, 2*lim])
    sym_ref[...] = (sym + lim).astype(jnp.int32).astype(jnp.uint8)
    deq_ref[...] = (sym * step).astype(x.dtype)


def quantize_pack_pallas(
    x: jax.Array, step: float, clip: float, tile: int = 256, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Row-tiled Pallas lowering. x: any shape with last dim C; flattened to
    (rows, C) for the grid. Requires rows % tile == 0 after padding
    (handled here)."""
    lim = _lim_of(step, clip)
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    rows = x2.shape[0]
    pad = (-rows) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    p = x2.shape[0]

    kernel = functools.partial(_qp_kernel, step=float(step), lim=float(lim))
    sym, deq = pl.pallas_call(
        kernel,
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, c), jnp.uint8),
            jax.ShapeDtypeStruct((p, c), x2.dtype),
        ],
        interpret=interpret,
    )(x2)
    if pad:
        sym, deq = sym[:rows], deq[:rows]
    return sym.reshape(shape), deq.reshape(shape)


def quantize_pack(
    x: jax.Array, step: float, clip: float, impl: str = "xla"
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch policy: DEFAULT XLA. Measured on the TPU at the DSC coarse
    code shape and at the Ballé-17 latent shape, the two lowerings are
    within noise of each other — the op is a single fused elementwise pass
    either way, and the uint8-output win (4× smaller device→host transfer)
    is identical for both. The Pallas path stays as the integration point
    for a future conv-epilogue fusion; flip with impl='pallas' or
    ICLR17C_QUANT_PACK=pallas. Numbers in tools/exp_quant_pack.py output,
    recorded in BASELINE.md."""
    import os

    impl = os.environ.get("ICLR17C_QUANT_PACK", impl)
    if impl == "pallas":
        return quantize_pack_pallas(x, step, clip)
    return quantize_pack_xla(x, step, clip)
