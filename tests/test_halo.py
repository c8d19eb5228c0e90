"""Explicit halo-exchange tiled ops: bit-parity with full-image ops.

Runs on the 8-virtual-device CPU mesh (conftest). Every tiled op's gathered
output must equal the full-image op exactly — including at image boundaries,
where ppermute's zeros must reproduce the global zero padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iclr_17_compression_tpu.ops.conv import conv2d, conv_transpose2d
from iclr_17_compression_tpu.parallel.halo import (
    make_tiled_balle17,
    tiled_conv2d,
    tiled_conv_transpose2d,
)


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("tile",))


def _run_tiled(fn, mesh, x, *args):
    from iclr_17_compression_tpu.parallel.halo import _shard_map

    shard_map = _shard_map()
    in_specs = (P(None, None, "tile", None),) + (P(),) * len(args)
    f = shard_map(
        fn, mesh=mesh, in_specs=in_specs,
        out_specs=P(None, None, "tile", None),
    )
    return jax.jit(f)(x, *args)


@pytest.mark.parametrize(
    "k,s,p", [(9, 4, 4), (5, 2, 2), (3, 1, 1), (1, 2, 0), (5, 1, 2)]
)
def test_tiled_conv2d_matches_full(rng, k, s, p):
    mesh = _mesh(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, 6, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    ref = conv2d(x, w, b, stride=s, padding=p)
    out = _run_tiled(
        lambda xt, wt, bt: tiled_conv2d(xt, wt, bt, stride=s, padding=p),
        mesh, x, w, b,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s,p,op", [(5, 2, 2, 1), (9, 4, 4, 3), (4, 2, 1, 0)])
def test_tiled_conv_transpose2d_matches_full(rng, k, s, p, op):
    mesh = _mesh(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, 6, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    ref = conv_transpose2d(x, w, b, stride=s, padding=p, output_padding=op)
    out = _run_tiled(
        lambda xt, wt, bt: tiled_conv_transpose2d(
            xt, wt, bt, stride=s, padding=p, output_padding=op
        ),
        mesh, x, w, b,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tiled_balle17_matches_full_model(key):
    from iclr_17_compression_tpu.models import Balle17Compressor

    mesh = _mesh(4)
    n = 16
    model = Balle17Compressor(out_channel_n=n)
    x = jax.random.uniform(key, (1, 64, 256, 3), jnp.float32)
    params = model.init({"params": key, "quant": key}, x, train=False)

    ref = model.apply(params, x, train=False)
    tiled = make_tiled_balle17(mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None, "tile", None)))
    recon, latent = tiled(params, x_sh)

    np.testing.assert_allclose(
        np.asarray(latent), np.asarray(ref["latent"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(ref["recon"]), rtol=1e-4, atol=1e-5
    )
