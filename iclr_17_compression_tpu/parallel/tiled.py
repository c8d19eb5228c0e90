"""Spatially-tiled (multi-chip) encode/decode for large images.

The "long-context" analog for image codecs (SURVEY.md §5): shard the image
W axis across the mesh 'tile' axis and jit the full codec over it. GSPMD
partitions every conv and inserts the halo exchanges (collective-permute
over ICI) derived from each kernel's receptive field — the hand-derived
8-px-per-stage halos of the reference design fall out automatically, and
stay correct for the ×16 deconv halos on the synthesis side.

Bitstreams are per-tile: the quantized code is fetched per shard and rANS
encoded independently (parallel host threads), so N chips produce N streams
that decode independently — the all-gather of ragged streams happens at the
container level (lengths + concat), not on device.
"""

import concurrent.futures as _futures
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicated, tile_sharding


@dataclass
class TiledStreams:
    """Container for per-tile bitstreams (the ragged all-gather)."""

    streams: List[bytes]
    tile_shape: Tuple[int, ...]   # per-tile code shape (NHWC)
    n_tiles: int

    @property
    def total_bytes(self) -> int:
        return sum(len(s) for s in self.streams)

    def serialize(self) -> bytes:
        head = np.array([self.n_tiles] + [len(s) for s in self.streams], np.uint32)
        return head.tobytes() + b"".join(self.streams)

    @classmethod
    def deserialize(cls, data: bytes, tile_shape) -> "TiledStreams":
        n = int(np.frombuffer(data[:4], np.uint32)[0])
        lens = np.frombuffer(data[4: 4 + 4 * n], np.uint32)
        off = 4 + 4 * n
        streams = []
        for ln in lens:
            streams.append(data[off: off + int(ln)])
            off += int(ln)
        return cls(streams=streams, tile_shape=tuple(tile_shape), n_tiles=n)


def make_tiled_codec(model, params, mesh: Mesh):
    """Build jitted sharded encode/decode closures for a codec with
    ``apply(params, x, train=False) -> {recon, latent/code, ...}``.

    Returns (encode_fn, decode_fn):
      encode_fn(image NHWC, sharded over W) -> quantized code (sharded)
      decode_fn(code) -> reconstruction (sharded)
    """
    x_shard = tile_sharding(mesh)
    rep = replicated(mesh)

    @jax.jit
    def _forward(p, x):
        return model.apply(p, x, train=False)

    forward = jax.jit(
        _forward,
        in_shardings=(rep, x_shard),
        out_shardings=None,
    )

    def encode_decode(image: jax.Array):
        image = jax.device_put(image, x_shard)
        p = jax.device_put(params, rep)
        return forward(p, image)

    return encode_decode


def encode_tiles_to_streams(
    code: np.ndarray,
    codec,
    n_tiles: int,
    step: float = 1.0,
) -> TiledStreams:
    """Split the code tensor into W tiles and rANS-encode each independently
    (thread pool — the C++ coder releases the GIL during ctypes calls)."""
    from ..coding import encode_latent

    tiles = np.array_split(np.asarray(code), n_tiles, axis=2)
    sym_tiles = [np.round(t / step).astype(np.int64) for t in tiles]

    with _futures.ThreadPoolExecutor(max_workers=min(n_tiles, 16)) as ex:
        streams = list(ex.map(lambda t: encode_latent(codec, t), sym_tiles))
    return TiledStreams(
        streams=streams, tile_shape=sym_tiles[0].shape, n_tiles=n_tiles
    )


def decode_streams_to_code(
    ts: TiledStreams, codec, step: float = 1.0
) -> np.ndarray:
    from ..coding import decode_latent

    with _futures.ThreadPoolExecutor(max_workers=min(ts.n_tiles, 16)) as ex:
        tiles = list(
            ex.map(lambda s: decode_latent(codec, s, ts.tile_shape), ts.streams)
        )
    return np.concatenate(tiles, axis=2).astype(np.float32) * step
