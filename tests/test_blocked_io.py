"""Edge-conv I/O blocking parity: the space-to-depth data-layer layout
(ops.conv.space_to_depth + TorchConv.input_block /
TorchConvTranspose.output_block) must reproduce the canonical graph's
outputs from the SAME parameters — the blocked graph is a pure
reinterpretation, not a different model (BASELINE.md round-4: conv1 lane
packing is the named headline-perf fix)."""

import numpy as np

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models import Balle17Compressor
from iclr_17_compression_tpu.ops.conv import (
    block_conv_weight,
    block_deconv_weight,
    conv2d,
    conv_transpose2d,
    depth_to_space,
    space_to_depth,
)


def test_space_to_depth_roundtrip(rng):
    x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    xb = space_to_depth(x, 4)
    assert xb.shape == (2, 4, 6, 48)
    np.testing.assert_array_equal(depth_to_space(xb, 4), x)


def test_blocked_conv_matches_strided(key, rng):
    w = rng.standard_normal((9, 9, 3, 8)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    x = rng.standard_normal((2, 32, 48, 3)).astype(np.float32)
    ref = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=4, padding=4)
    wb = block_conv_weight(jnp.asarray(w), 4)
    got = conv2d(jnp.asarray(space_to_depth(x, 4)), wb, jnp.asarray(b),
                 stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_blocked_deconv_matches_strided(key, rng):
    w = rng.standard_normal((9, 9, 8, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    x = rng.standard_normal((2, 8, 12, 8)).astype(np.float32)
    ref = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=4, padding=4, output_padding=3,
    )
    wb = block_deconv_weight(jnp.asarray(w), 4)
    got_b = conv2d(jnp.asarray(x), wb, jnp.tile(jnp.asarray(b), 16),
                   stride=1, padding=1)
    got = depth_to_space(np.asarray(got_b), 4)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_balle17_blocked_pipeline_parity(key, rng):
    """Same params, blocked vs canonical end-to-end: latent bit-identical,
    recon/mse/bpp equal after un-blocking."""
    x = rng.uniform(0.0, 1.0, (2, 64, 96, 3)).astype(np.float32)
    model = Balle17Compressor(out_channel_n=16)
    params = model.init({"params": key, "quant": key}, jnp.asarray(x), train=False)
    ref = model.apply(params, jnp.asarray(x), train=False)

    blocked = Balle17Compressor(out_channel_n=16, io_block=4)
    xb = jnp.asarray(space_to_depth(x, 4))
    got = blocked.apply(params, xb, train=False)

    np.testing.assert_array_equal(np.asarray(got["latent"]), np.asarray(ref["latent"]))
    np.testing.assert_allclose(
        depth_to_space(np.asarray(got["recon"]), 4), np.asarray(ref["recon"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(float(got["mse"]), float(ref["mse"]), rtol=1e-5)
    np.testing.assert_allclose(float(got["bpp"]), float(ref["bpp"]), rtol=1e-5)
