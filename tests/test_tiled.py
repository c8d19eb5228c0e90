"""Tiled encode/decode: sharded forward parity + per-tile bitstream roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from iclr_17_compression_tpu.coding import build_cdf_tables_from_histogram
from iclr_17_compression_tpu.models import Balle17Compressor
from iclr_17_compression_tpu.parallel import (
    TiledStreams,
    decode_streams_to_code,
    encode_tiles_to_streams,
    make_mesh,
    make_tiled_codec,
)


def test_sharded_codec_matches_single_device(key):
    """Full codec over an 8-way width-sharded image == unsharded result."""
    model = Balle17Compressor(out_channel_n=16)
    x = jax.random.uniform(key, (1, 64, 256, 3), jnp.float32)
    params = model.init({"params": key, "quant": key}, x, train=False)

    ref = model.apply(params, x, train=False)

    mesh = make_mesh(n_data=1, n_tile=8)
    forward = make_tiled_codec(model, params, mesh)
    out = forward(x)

    np.testing.assert_allclose(
        np.asarray(out["recon"]), np.asarray(ref["recon"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["latent"]), np.asarray(ref["latent"])
    )


def test_per_tile_stream_roundtrip(rng):
    code = (rng.integers(-8, 9, size=(1, 8, 64, 8)) * 16).astype(np.float32)
    sym = np.round(code / 16).astype(np.int64)
    codec = build_cdf_tables_from_histogram(sym, channel_axis=-1)

    ts = encode_tiles_to_streams(code, codec, n_tiles=8, step=16.0)
    assert ts.n_tiles == 8
    rec = decode_streams_to_code(ts, codec, step=16.0)
    np.testing.assert_array_equal(rec, code)

    # serialize roundtrip
    blob = ts.serialize()
    ts2 = TiledStreams.deserialize(blob, ts.tile_shape)
    rec2 = decode_streams_to_code(ts2, codec, step=16.0)
    np.testing.assert_array_equal(rec2, code)
