"""Explicit halo-exchange tiled convolution (shard_map + ppermute).

The GSPMD path (parallel/tiled.py) lets XLA derive conv halos automatically
from sharding annotations. This module is the manual counterpart promised by
the design (SURVEY.md §2.9, §5 "explicit ppermute halo exchange"): the image
W axis is sharded over the mesh 'tile' axis, every conv exchanges exactly the
columns its kernel needs with its neighbors over ICI (``lax.ppermute``), and
each shard's output is bit-identical to the corresponding slice of the
full-image op.

Why both paths exist: GSPMD is the production default (it fuses halo
exchanges into the conv schedule); the explicit path is (a) the reference
implementation the GSPMD path is tested against, (b) the hook for collective
scheduling experiments (e.g. one pre-exchanged overlap for a whole transform
stack), and (c) independent of GSPMD's partitioning heuristics.

Correctness argument (per-conv halos):
- conv2d(stride s, kernel k, pad p): shard t owns input cols
  [t·Ws, (t+1)·Ws); its output cols need input cols
  [t·Ws − p, (t+1)·Ws − s − p + k − 1], i.e. a LEFT halo of p and a RIGHT
  halo of max(k−s−p, 0) columns. ``ppermute`` delivers zeros to shards with
  no neighbor — exactly the zero padding the full-image conv applies there.
- conv_transpose2d(s, k, p, op): fetching ceil((k−1)/s) columns on both
  sides and slicing the tile's transposed output at [l·s, l·s + Ws·s)
  reproduces the global output slice; missing-neighbor zeros again equal the
  full-image implicit zeros (transposed-conv padding trims output, it never
  fabricates input).

All ops between convs (GDN, quantization) are pointwise across space, so no
other exchanges are needed (SURVEY.md §2.9 halo analysis).
"""

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.conv import _pair, conv2d, conv_transpose2d
from ..ops.gdn import GDNParams, gdn


def _shard_map():
    """shard_map across jax versions (jax.shard_map has no check_rep kw)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map

    from jax.experimental.shard_map import shard_map  # older jax

    def wrapped(f, *, mesh, in_specs, out_specs):
        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

    return wrapped


def _neighbor_perm(n: int, direction: int):
    """ppermute pairs shifting data one shard left (-1) or right (+1)."""
    if direction > 0:
        return [(i, i + 1) for i in range(n - 1)]
    return [(i + 1, i) for i in range(n - 1)]


def halo_exchange_w(x: jax.Array, left: int, right: int, axis_name: str) -> jax.Array:
    """Append ``left`` columns from the left neighbor and ``right`` from the
    right neighbor along W (axis 2). Missing neighbors contribute zeros."""
    n = lax.psum(1, axis_name)
    parts = []
    if left > 0:
        # my left halo = the left neighbor's rightmost columns
        parts.append(lax.ppermute(x[:, :, -left:], axis_name, _neighbor_perm(n, +1)))
    parts.append(x)
    if right > 0:
        parts.append(lax.ppermute(x[:, :, :right], axis_name, _neighbor_perm(n, -1)))
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else x


def tiled_conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride=1,
    padding=0,
    axis_name: str = "tile",
    precision=None,
) -> jax.Array:
    """W-sharded conv2d: per-shard output == the global conv's slice.

    Requires the shard width to be a multiple of the stride.
    """
    k = w.shape[1]
    _, sw = _pair(stride)
    ph, pw = _pair(padding)
    xh = halo_exchange_w(x, pw, max(k - sw - pw, 0), axis_name)
    return conv2d(
        xh, w, b, stride=stride, padding=(ph, 0), precision=precision
    )


def tiled_conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride=1,
    padding=0,
    output_padding=0,
    axis_name: str = "tile",
    precision=None,
) -> jax.Array:
    """W-sharded transposed conv: per-shard output == the global op's slice."""
    k = w.shape[1]
    _, sw = _pair(stride)
    ws = x.shape[2]
    halo = math.ceil((k - 1) / sw)
    xh = halo_exchange_w(x, halo, halo, axis_name)
    out = conv_transpose2d(
        xh, w, b,
        stride=stride, padding=padding, output_padding=output_padding,
        precision=precision,
    )
    start = halo * sw
    return out[:, :, start: start + ws * sw]


# ---------------------------------------------------------------------------
# Tiled Ballé-17 codec forward: the full encode→quantize→decode pipeline
# with explicit halos, as a shard_map program over a ('tile',) mesh axis.
# ---------------------------------------------------------------------------

def _gdn_params(p) -> GDNParams:
    return GDNParams(beta=p["beta"], gamma=p["gamma"])


def make_tiled_balle17(mesh: Mesh, axis: str = "tile", precision=None):
    """Jitted (params, image) -> (recon, latent) with image W-sharded over
    ``axis`` and every conv exchanging explicit halos.

    image width must be divisible by 16 * mesh.shape[axis].
    """
    shard_map = _shard_map()

    def tile_fn(params, x):
        e = params["params"]["encoder"]
        d = params["params"]["decoder"]
        c = partial(tiled_conv2d, axis_name=axis, precision=precision)
        ct = partial(tiled_conv_transpose2d, axis_name=axis, precision=precision)

        y = c(x, e["conv1"]["weight"], e["conv1"]["bias"], stride=4, padding=4)
        y = gdn(y, _gdn_params(e["gdn1"]))
        y = c(y, e["conv2"]["weight"], e["conv2"]["bias"], stride=2, padding=2)
        y = gdn(y, _gdn_params(e["gdn2"]))
        y = c(y, e["conv3"]["weight"], None, stride=2, padding=2)
        latent = jnp.round(y)

        r = ct(latent, d["deconv1"]["weight"], d["deconv1"]["bias"],
               stride=2, padding=2, output_padding=1)
        r = gdn(r, _gdn_params(d["igdn1"]), inverse=True)
        r = ct(r, d["deconv2"]["weight"], d["deconv2"]["bias"],
               stride=2, padding=2, output_padding=1)
        r = gdn(r, _gdn_params(d["igdn2"]), inverse=True)
        r = ct(r, d["deconv3"]["weight"], d["deconv3"]["bias"],
               stride=4, padding=4, output_padding=3)
        return jnp.clip(r, 0.0, 1.0), latent

    sharded = shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None)),
        out_specs=(P(None, None, axis, None), P(None, None, axis, None)),
    )
    return jax.jit(sharded)
