"""Device mesh + sharding layout for data- and spatial-tile-parallelism.

The reference's only parallelism is single-process ``DataParallel``
(reference train.py:227-228). The TPU-native design replaces it with a 2-D
``Mesh(('data', 'tile'))``:

- ``data``: batch-parallel training/eval. XLA all-reduces gradients over ICI.
- ``tile``: spatial partitioning of the image W axis for large-image
  encode/decode. Convolutions over spatially-sharded tensors get their halo
  exchanges inserted automatically by GSPMD (collective-permute over ICI) —
  the idiomatic TPU replacement for hand-written NCCL halo code; an explicit
  Pallas/shard_map halo path exists for the fused kernels (ops/pallas).

Everything works unchanged at 1 chip (mesh 1×1), 1 host, or N hosts.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_tile: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'tile') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_tile
    if n_data * n_tile != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_tile} != {len(devices)} devices"
        )
    arr = np.array(devices).reshape(n_data, n_tile)
    return Mesh(arr, ("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch axis over 'data'."""
    return NamedSharding(mesh, P("data", None, None, None))


def tile_sharding(mesh: Mesh, axis: str = "width") -> NamedSharding:
    """NHWC spatial tiling over 'tile' (W by default — KITTI/pano images are
    wide; H tiling also supported)."""
    if axis == "width":
        return NamedSharding(mesh, P(None, None, "tile", None))
    if axis == "height":
        return NamedSharding(mesh, P(None, "tile", None, None))
    raise ValueError(axis)


def batch_and_tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch over 'data' and W over 'tile' simultaneously."""
    return NamedSharding(mesh, P("data", None, "tile", None))
