"""Mesh / sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated,
    tile_sharding,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_tile=2)
    assert mesh.shape == {"data": 4, "tile": 2}
    mesh = make_mesh(n_tile=1)
    assert mesh.shape == {"data": 8, "tile": 1}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_tile=2)


def test_sharded_conv_matches_single_device(key):
    """Width-sharded conv (GSPMD halo exchange) must equal unsharded conv."""
    from iclr_17_compression_tpu.ops import conv2d

    mesh = make_mesh(n_data=1, n_tile=8)
    x = jax.random.normal(key, (1, 16, 64, 8), jnp.float32)
    w = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (5, 5, 8, 8), jnp.float32)

    ref = conv2d(x, w, stride=1, padding=2)

    xs = jax.device_put(x, tile_sharding(mesh))
    ws = jax.device_put(w, replicated(mesh))
    f = jax.jit(
        lambda a, b: conv2d(a, b, stride=1, padding=2),
        in_shardings=(tile_sharding(mesh), replicated(mesh)),
        out_shardings=tile_sharding(mesh),
    )
    out = f(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    recon, code = jax.jit(fn)(*args)
    assert recon.shape == (1, 128, 256, 3)
    assert code.shape[1:] == (4, 8, 8)
