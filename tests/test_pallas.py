"""Pallas kernel tests (interpreter mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.ops.gdn import GDNParams, gdn, gdn_param_init
from iclr_17_compression_tpu.ops.pallas import gdn_pallas


class TestGDNPallas:
    @pytest.mark.parametrize("inverse", [False, True])
    def test_matches_jnp_forward(self, key, inverse):
        ch = 128
        params = gdn_param_init(ch)
        x = jax.random.normal(key, (1, 8, 16, ch), jnp.float32)
        ref = gdn(x, params, inverse=inverse)
        out = gdn_pallas(x, params, inverse=inverse, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_matches_jnp_random_params(self, key, rng):
        ch = 128
        beta = jnp.asarray(np.abs(rng.standard_normal(ch)).astype(np.float32) + 0.8)
        gamma = jnp.asarray(
            np.abs(rng.standard_normal((ch, ch))).astype(np.float32) * 0.02 + 0.001
        )
        params = GDNParams(beta=beta, gamma=gamma)
        x = jax.random.normal(key, (2, 4, 16, ch), jnp.float32)
        ref = gdn(x, params)
        out = gdn_pallas(x, params, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_gradient_matches_jnp(self, key):
        ch = 8
        params = gdn_param_init(ch)
        x = jax.random.normal(key, (1, 4, 8, ch), jnp.float32)

        def loss_pallas(x, p):
            return jnp.sum(gdn_pallas(x, p, interpret=True) ** 2)

        def loss_jnp(x, p):
            return jnp.sum(gdn(x, p) ** 2)

        gx_p, gp_p = jax.grad(loss_pallas, argnums=(0, 1))(x, params)
        gx_j, gp_j = jax.grad(loss_jnp, argnums=(0, 1))(x, params)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_j), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gp_p.beta), np.asarray(gp_j.beta), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gp_p.gamma), np.asarray(gp_j.gamma), rtol=1e-4, atol=1e-5
        )

    def test_untileable_falls_back(self, key):
        ch = 16
        params = gdn_param_init(ch)
        x = jax.random.normal(key, (1, 3, 7, ch), jnp.float32)  # 21 pixels
        out = gdn_pallas(x, params, interpret=True)
        ref = gdn(x, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
