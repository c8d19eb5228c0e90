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


class TestConvGDNFused:
    """Fused strided-conv+GDN kernel (ops/pallas/conv_gdn_kernel.py)."""

    def test_conv5x5s2_gdn_matches_ref(self, key):
        from iclr_17_compression_tpu.ops.pallas.conv_gdn_kernel import (
            _ref_conv_gdn,
            conv_gdn,
        )

        x = jax.random.normal(key, (2, 64, 64, 32)) * 0.5
        w = jax.random.normal(jax.random.fold_in(key, 1), (5, 5, 32, 32)) * 0.05
        b = jax.random.normal(jax.random.fold_in(key, 2), (32,)) * 0.01
        gp = gdn_param_init(32)
        ref = _ref_conv_gdn(x, w, b, gp, 2, 2, False)
        out = conv_gdn(x, w, b, gp, 2, 2, False, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_conv9x9s4_no_gdn(self, key):
        from iclr_17_compression_tpu.ops.pallas.conv_gdn_kernel import (
            _ref_conv_gdn,
            conv_gdn,
        )

        x = jax.random.normal(key, (1, 64, 96, 3))
        w = jax.random.normal(jax.random.fold_in(key, 3), (9, 9, 3, 32)) * 0.05
        ref = _ref_conv_gdn(x, w, None, None, 4, 4, False)
        out = conv_gdn(x, w, None, None, 4, 4, False, True)
        assert out.shape == (1, 16, 24, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_igdn_epilogue_and_grads(self, key):
        from iclr_17_compression_tpu.ops.pallas.conv_gdn_kernel import (
            _ref_conv_gdn,
            conv_gdn,
        )

        x = jax.random.normal(key, (1, 32, 32, 16)) * 0.5
        w = jax.random.normal(jax.random.fold_in(key, 1), (5, 5, 16, 16)) * 0.05
        b = jnp.zeros((16,))
        gp = gdn_param_init(16)
        ref = _ref_conv_gdn(x, w, b, gp, 2, 2, True)
        out = conv_gdn(x, w, b, gp, 2, 2, True, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

        def loss_p(x, w, b, gp):
            return jnp.mean(conv_gdn(x, w, b, gp, 2, 2, False, True) ** 2)

        def loss_r(x, w, b, gp):
            return jnp.mean(_ref_conv_gdn(x, w, b, gp, 2, 2, False) ** 2)

        g1 = jax.grad(loss_p, argnums=(0, 1, 3))(x, w, b, gp)
        g2 = jax.grad(loss_r, argnums=(0, 1, 3))(x, w, b, gp)
        for a, c in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5)

    def test_analysis17_fused_matches_module(self, key):
        from iclr_17_compression_tpu.models.balle17 import Analysis17
        from iclr_17_compression_tpu.ops.pallas.conv_gdn_kernel import analysis17_fused

        model = Analysis17(16)
        x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
        params = model.init(key, x)
        ref = model.apply(params, x)
        out = analysis17_fused(params["params"], x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestQuantizePack:
    """Quantize+clamp+pack epilogue (ops/pallas/quant_pack_kernel.py) —
    symbols must be the exact bytes the entropy coder consumes (reference
    coarse quantization: models/temp.py:254-260)."""

    @pytest.mark.parametrize("shape,step,clip", [
        ((2, 5, 7, 8), 16.0, 128.0),   # DSC coarse code (+ ragged rows)
        ((1, 4, 8, 128), 1.0, 127.0),  # Ballé-17 latent
    ])
    def test_pallas_matches_xla(self, key, shape, step, clip):
        from iclr_17_compression_tpu.ops.pallas.quant_pack_kernel import (
            quantize_pack_pallas,
            quantize_pack_xla,
        )

        x = jax.random.normal(key, shape, jnp.float32) * 60.0
        sx, dx = quantize_pack_xla(x, step, clip)
        sp, dp = quantize_pack_pallas(x, step, clip, tile=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(sp))
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dp))
        assert sx.dtype == jnp.uint8
        # symbols dequantize back to the clamped step grid
        lim = int(clip / step)
        np.testing.assert_allclose(
            (np.asarray(sx, np.float32) - lim) * step, np.asarray(dx)
        )

    def test_symbols_feed_rans(self, key):
        """uint8 symbols from the kernel round-trip the C++ coder."""
        from iclr_17_compression_tpu.coding import build_cdf_tables_from_histogram
        from iclr_17_compression_tpu.coding.api import decode_latent, encode_latent
        from iclr_17_compression_tpu.ops.pallas.quant_pack_kernel import quantize_pack_xla

        x = jax.random.normal(key, (1, 6, 10, 4), jnp.float32) * 60.0
        sym_u8, _ = quantize_pack_xla(x, 16.0, 128.0)
        sym = np.asarray(sym_u8, np.int64)[0]
        codec = build_cdf_tables_from_histogram(sym, channel_axis=-1)
        stream = encode_latent(codec, sym)
        back = decode_latent(codec, stream, sym.shape)
        np.testing.assert_array_equal(back, sym)
