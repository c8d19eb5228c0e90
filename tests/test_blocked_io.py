"""Edge-conv I/O blocking parity: the space-to-depth data-layer layout
(ops.conv.space_to_depth + TorchConv.input_block /
TorchConvTranspose.output_block) must reproduce the canonical graph's
outputs from the SAME parameters — the blocked graph is a pure
reinterpretation, not a different model (BASELINE.md round-4: conv1 lane
packing is the named headline-perf fix)."""

import pytest
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


@pytest.mark.slow
def test_blocked_pipeline_trains(key, rng):
    """Gradients flow through the trace-time weight reinterpretation: one
    train step on the blocked graph updates conv1/deconv3's CANONICAL
    (9,9,·,·) parameters, and the update equals the canonical graph's
    (same data, same rng) — blocking is loss-invariant."""
    import jax

    from iclr_17_compression_tpu.train.state import (
        create_train_state,
        make_balle17_train_step,
    )
    from iclr_17_compression_tpu.models import Balle17Compressor

    x = rng.uniform(0.0, 1.0, (2, 64, 64, 3)).astype(np.float32)
    xb = jnp.asarray(space_to_depth(x, 4))

    ref_model = Balle17Compressor(out_channel_n=8)
    ref_state = create_train_state(ref_model, key, (jnp.asarray(x),), lr=1e-3)
    ref_state, ref_metrics = jax.jit(make_balle17_train_step(1024.0))(
        ref_state, jnp.asarray(x), key
    )

    blk_model = Balle17Compressor(out_channel_n=8, io_block=4)
    blk_state = create_train_state(blk_model, key, (xb,), lr=1e-3)
    blk_state, blk_metrics = jax.jit(make_balle17_train_step(1024.0))(
        blk_state, xb, key
    )

    np.testing.assert_allclose(
        float(blk_metrics["rd_loss"]), float(ref_metrics["rd_loss"]), rtol=1e-5
    )
    w_ref = ref_state.params["encoder"]["conv1"]["weight"]
    w_blk = blk_state.params["encoder"]["conv1"]["weight"]
    assert w_blk.shape == (9, 9, 3, 8)
    np.testing.assert_allclose(np.asarray(w_blk), np.asarray(w_ref), rtol=1e-4, atol=1e-6)
    w_ref3 = ref_state.params["decoder"]["deconv3"]["weight"]
    w_blk3 = blk_state.params["decoder"]["deconv3"]["weight"]
    np.testing.assert_allclose(np.asarray(w_blk3), np.asarray(w_ref3), rtol=1e-4, atol=1e-6)
