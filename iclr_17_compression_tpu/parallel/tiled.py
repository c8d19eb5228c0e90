"""Spatially-tiled (multi-chip) encode/decode for large images.

The "long-context" analog for image codecs (SURVEY.md §5): shard the image
W axis across the mesh 'tile' axis and jit encoder and decoder over it.
GSPMD partitions every conv and inserts the halo exchanges
(collective-permute over ICI) derived from each kernel's receptive field —
the hand-derived 8-px-per-stage halos of the reference design fall out
automatically, and stay correct for the ×16 deconv halos on the synthesis
side.

Bitstreams are per-tile: the quantized code is split along W and rANS
encoded independently (parallel host threads), so N chips produce N streams
that decode independently — the all-gather of ragged streams happens at the
container level (in-band shapes + lengths + concat), not on device.

PAM sharding policy: parallax attention (models/passr.py, and DSC presets
with ``fusion_post='pam'``) computes a full W×W attention per latent row —
its K/V span the entire width, so W-sharding would need a ring exchange of
K/V row segments (the true ring-attention analog, SURVEY.md §5). PAM models
therefore shard H (``make_tiled_dsc(..., axis='height')`` — PAM is
row-independent, so H-sharding needs no attention communication; conv and
morphology halos are still GSPMD-inserted and the path is bit-parity tested
in tests/test_tiled.py). ``make_tiled_dsc`` rejects W-sharded pam configs.
An explicit ring K/V alternative for W-sharding lives in
``parallel/ring_pam.py`` (shard_map + ppermute, flash-attention-style
online softmax).
"""

import concurrent.futures as _futures
from dataclasses import dataclass
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .mesh import replicated, tile_sharding


@dataclass
class TiledStreams:
    """Container for per-tile bitstreams — the ragged all-gather.

    ``tile_shapes`` carries every tile's code shape explicitly: W-splitting
    an image whose code width is not divisible by n_tiles produces ragged
    tiles (np.array_split semantics), and decode must reshape each stream by
    its own width.
    """

    streams: List[bytes]
    tile_shapes: List[Tuple[int, ...]]

    @property
    def n_tiles(self) -> int:
        return len(self.streams)

    @property
    def total_bytes(self) -> int:
        return sum(len(s) for s in self.streams)

    def serialize(self) -> bytes:
        n = len(self.streams)
        ndim = len(self.tile_shapes[0])
        head = [n, ndim]
        for shp in self.tile_shapes:
            head.extend(shp)
        head.extend(len(s) for s in self.streams)
        return np.array(head, np.uint32).tobytes() + b"".join(self.streams)

    @classmethod
    def deserialize(cls, data: bytes) -> "TiledStreams":
        n, ndim = np.frombuffer(data[:8], np.uint32)
        n, ndim = int(n), int(ndim)
        off = 8
        shapes = []
        for _ in range(n):
            shapes.append(tuple(int(v) for v in np.frombuffer(data[off: off + 4 * ndim], np.uint32)))
            off += 4 * ndim
        lens = np.frombuffer(data[off: off + 4 * n], np.uint32)
        off += 4 * n
        streams = []
        for ln in lens:
            streams.append(data[off: off + int(ln)])
            off += int(ln)
        return cls(streams=streams, tile_shapes=shapes)


def make_tiled_codec(
    model, params, mesh: Mesh
) -> Tuple[Callable, Callable]:
    """Sharded (encode_fn, decode_fn) for the Ballé-17 codec.

      encode_fn(image NHWC) -> integer latent, W-sharded over the tile axis
      decode_fn(latent)     -> reconstruction in [0,1], W-sharded

    Both are jitted once with explicit shardings; GSPMD inserts the conv /
    transposed-conv halo exchanges. Encode is exactly the transmitter
    (analysis + round), decode exactly the receiver (synthesis + clip) —
    the latent in between is what goes through the per-tile entropy coder.
    """
    from ..models.balle17 import Analysis17, Synthesis17

    n = model.out_channel_n
    x_shard = tile_sharding(mesh)
    rep = replicated(mesh)
    p = jax.device_put(params, rep)

    def _encode(x):
        feat = Analysis17(n).apply({"params": p["params"]["encoder"]}, x)
        return jnp.round(feat)

    def _decode(latent):
        recon = Synthesis17(n).apply({"params": p["params"]["decoder"]}, latent)
        return jnp.clip(recon, 0.0, 1.0)

    enc = jax.jit(_encode, in_shardings=(x_shard,), out_shardings=x_shard)
    dec = jax.jit(_decode, in_shardings=(x_shard,), out_shardings=x_shard)

    def encode_fn(image) -> jax.Array:
        return enc(jax.device_put(jnp.asarray(image, jnp.float32), x_shard))

    def decode_fn(latent) -> jax.Array:
        return dec(jax.device_put(jnp.asarray(latent, jnp.float32), x_shard))

    return encode_fn, decode_fn


def make_tiled_dsc(
    model, params, mesh: Mesh, axis: str = "width"
) -> Tuple[Callable, Callable]:
    """Sharded (encode_fn, decode_fn) for a DSC stereo codec.

      encode_fn(image)    -> quantized+clamped coarse code (tile-sharded)
      decode_fn(code, si) -> SI-assisted reconstruction (tile-sharded)

    The encoder runs what the transmitter runs (g_a → g_a22 → quantize,
    reference models/temp.py:232-260, never sees the SI image); the decoder
    is the DSCDecoder receiver subgraph.

    ``axis``: which image axis the 'tile' mesh axis splits. PAM-fusion
    presets REQUIRE ``axis='height'``: parallax attention computes a full
    W×W attention per latent row (reference models/PASSRnet.py:124-136), so
    W-sharding would split its K/V mid-softmax — H rows are independent, so
    H-sharding needs no attention communication at all (conv/morphology
    halos are still inserted by GSPMD). Non-PAM presets accept either axis.
    """
    from ..models.dsc import DSCDecoder, _Stack

    cfg = model.config
    if cfg.fusion_post == "pam" and axis != "height":
        raise ValueError(
            "fusion_post='pam' attends across the full latent width per row; "
            "W-sharding would split its K/V. Use make_tiled_dsc(..., "
            "axis='height') (PAM is row-independent) or run replicated."
        )
    x_shard = tile_sharding(mesh, axis=axis)
    rep = replicated(mesh)
    p = jax.device_put(params, rep)

    def _encode(x):
        z1 = _Stack(cfg.ga).apply({"params": p["params"]["g_a"]}, x)
        code = _Stack(cfg.ga22).apply({"params": p["params"]["g_a22"]}, z1)
        code = jnp.round(code / cfg.coarse_step) * cfg.coarse_step
        if cfg.code_clip is not None:
            code = jnp.clip(code, -cfg.code_clip, cfg.code_clip)
        return code

    decoder = DSCDecoder(cfg)

    def _decode(code, si):
        return decoder.apply(p, code, si)

    enc = jax.jit(_encode, in_shardings=(x_shard,), out_shardings=x_shard)
    dec = jax.jit(_decode, in_shardings=(x_shard, x_shard), out_shardings=x_shard)

    def encode_fn(image) -> jax.Array:
        return enc(jax.device_put(jnp.asarray(image, jnp.float32), x_shard))

    def decode_fn(code, si_image) -> jax.Array:
        return dec(
            jax.device_put(jnp.asarray(code, jnp.float32), x_shard),
            jax.device_put(jnp.asarray(si_image, jnp.float32), x_shard),
        )

    return encode_fn, decode_fn


def encode_tiles_to_streams(
    code: np.ndarray,
    codec,
    n_tiles: int,
    step: float = 1.0,
    axis: int = 2,
) -> TiledStreams:
    """Split the code tensor into tiles along ``axis`` (2 = W, 1 = H for
    H-sharded PAM codecs; ragged-safe) and rANS-encode each independently
    (thread pool — the C++ coder releases the GIL during ctypes calls)."""
    from ..coding import encode_latent

    tiles = np.array_split(np.asarray(code), n_tiles, axis=axis)
    sym_tiles = [np.round(t / step).astype(np.int64) for t in tiles]

    with _futures.ThreadPoolExecutor(max_workers=min(n_tiles, 16)) as ex:
        streams = list(ex.map(lambda t: encode_latent(codec, t), sym_tiles))
    return TiledStreams(
        streams=streams, tile_shapes=[t.shape for t in sym_tiles]
    )


def decode_streams_to_code(
    ts: TiledStreams, codec, step: float = 1.0, axis: int = 2
) -> np.ndarray:
    from ..coding import decode_latent

    with _futures.ThreadPoolExecutor(max_workers=min(ts.n_tiles, 16)) as ex:
        tiles = list(
            ex.map(
                lambda args: decode_latent(codec, args[0], args[1]),
                zip(ts.streams, ts.tile_shapes),
            )
        )
    return np.concatenate(tiles, axis=axis).astype(np.float32) * step
