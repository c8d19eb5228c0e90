from .mesh import (
    make_mesh,
    batch_sharding,
    batch_and_tile_sharding,
    tile_sharding,
    replicated,
    training_mesh,
    shard_train_step,
    put_replicated,
    put_batch,
    validate_tile_extent,
)
from .halo import (
    halo_exchange_w,
    make_tiled_balle17,
    tiled_conv2d,
    tiled_conv_transpose2d,
)
from .tiled import (
    TiledStreams,
    make_tiled_codec,
    make_tiled_dsc,
    encode_tiles_to_streams,
    decode_streams_to_code,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "batch_and_tile_sharding",
    "tile_sharding",
    "replicated",
    "training_mesh",
    "shard_train_step",
    "put_replicated",
    "put_batch",
    "validate_tile_extent",
    "TiledStreams",
    "make_tiled_codec",
    "make_tiled_dsc",
    "encode_tiles_to_streams",
    "decode_streams_to_code",
    "halo_exchange_w",
    "make_tiled_balle17",
    "tiled_conv2d",
    "tiled_conv_transpose2d",
]
