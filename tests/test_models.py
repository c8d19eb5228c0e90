"""Shape-law and forward-contract tests for the end-to-end models.

These replace the reference's ``build_model()`` smoke mains
(reference models/analysis_17.py:42-52 etc.) with real assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.models import (
    Analysis17,
    Analysis18,
    AnalysisPrior,
    Balle17Compressor,
    DSC_PRESETS,
    DSCStereoModel,
    ScaleHyperprior,
    Synthesis17,
    Synthesis18,
    SynthesisPrior,
)


def _img(key, shape):
    return jax.random.uniform(key, shape, jnp.float32)


class TestBalle17:
    def test_transform_shapes(self, key):
        x = _img(key, (2, 64, 64, 3))
        enc = Analysis17(out_channel_n=32)
        params = enc.init(key, x)
        z = enc.apply(params, x)
        assert z.shape == (2, 4, 4, 32)

        dec = Synthesis17(out_channel_n=32)
        dparams = dec.init(key, z)
        y = dec.apply(dparams, z)
        assert y.shape == (2, 64, 64, 3)

    def test_binarized_head(self, key):
        x = _img(key, (1, 32, 32, 3))
        enc = Analysis17(out_channel_n=8, binarize=True)
        params = enc.init(key, x)
        code, pre = enc.apply(params, x)
        assert set(np.unique(np.asarray(code))) <= {0.0, 1.0}
        assert float(jnp.min(pre)) >= 0.0 and float(jnp.max(pre)) <= 1.0

    def test_end_to_end_contract(self, key):
        x = _img(key, (2, 64, 64, 3))
        model = Balle17Compressor(out_channel_n=16)
        params = model.init({"params": key, "quant": key}, x, train=True)
        out_train = model.apply(params, x, train=True, rngs={"quant": key})
        out_eval = model.apply(params, x, train=False)
        for out in (out_train, out_eval):
            assert out["recon"].shape == x.shape
            assert float(out["bpp"]) > 0
            assert np.isfinite(float(out["mse"]))
        # eval latent must be integers
        lat = np.asarray(out_eval["latent"])
        np.testing.assert_allclose(lat, np.round(lat))
        # recon clipped
        assert float(jnp.min(out_eval["recon"])) >= 0.0
        assert float(jnp.max(out_eval["recon"])) <= 1.0

    def test_eval_deterministic(self, key):
        x = _img(key, (1, 32, 32, 3))
        model = Balle17Compressor(out_channel_n=8)
        params = model.init({"params": key, "quant": key}, x, train=True)
        a = model.apply(params, x, train=False)
        b = model.apply(params, x, train=False)
        np.testing.assert_array_equal(np.asarray(a["recon"]), np.asarray(b["recon"]))

    def test_grads_flow(self, key):
        x = _img(key, (1, 32, 32, 3))
        model = Balle17Compressor(out_channel_n=8)
        params = model.init({"params": key, "quant": key}, x, train=True)

        def loss_fn(p):
            out = model.apply(p, x, train=True, rngs={"quant": key})
            return 1000.0 * out["mse"] + out["bpp"]

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


class TestTransforms18:
    def test_shapes(self, key):
        n, m = 16, 24
        x = _img(key, (1, 64, 64, 3))
        ga = Analysis18(n, m)
        p = ga.init(key, x)
        y = ga.apply(p, x)
        assert y.shape == (1, 4, 4, m)

        ha = AnalysisPrior(n, m)
        hp = ha.init(key, y)
        z = ha.apply(hp, y)
        assert z.shape == (1, 1, 1, n)

        hs = SynthesisPrior(n, m)
        sp = hs.init(key, z)
        sigma = hs.apply(sp, z)
        assert sigma.shape == (1, 4, 4, m)
        assert float(jnp.min(sigma)) > 0  # exp output

        gs = Synthesis18(n, m)
        gp = gs.init(key, y)
        r = gs.apply(gp, y)
        assert r.shape == (1, 64, 64, 3)


class TestHyperprior:
    @pytest.mark.parametrize("quant", ["round", "sigma-norm"])
    def test_end_to_end(self, key, quant):
        x = _img(key, (1, 64, 64, 3))
        model = ScaleHyperprior(out_channel_n=8, out_channel_m=12, quant=quant)
        params = model.init({"params": key, "quant": key}, x, train=True)
        out = model.apply(params, x, train=False)
        assert out["recon"].shape == x.shape
        assert float(out["bpp"]) > 0
        assert float(out["bpp_y"]) > 0 and float(out["bpp_z"]) > 0
        train_out = model.apply(params, x, train=True, rngs={"quant": key})
        assert np.isfinite(float(train_out["mse"]))


class TestDSC:
    @pytest.mark.parametrize("preset", sorted(DSC_PRESETS))
    def test_preset_shapes_all(self, key, preset):
        """Shape laws for EVERY preset via eval_shape (zero compute)."""
        cfg = DSC_PRESETS[preset]
        h, w = 64, 128
        im1 = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
        model = DSCStereoModel(cfg)

        def init_and_apply(im_a, im_b):
            params = model.init({"params": key, "quant": key}, im_a, im_b, train=False)
            return model.apply(params, im_a, im_b, train=False)

        out = jax.eval_shape(init_and_apply, im1, im1)
        assert out["recon"].shape == im1.shape
        assert out["code"].shape == (
            1, h // cfg.code_div, w // cfg.code_div, cfg.code_channels
        )
        assert out["z1"].shape == (1, h // cfg.latent_div, w // cfg.latent_div, cfg.n)
        assert out["loss_full"].shape == ()
        if cfg.base_branch:
            assert out["im1_hat"].shape == im1.shape

    def test_flagship_eval_numerics(self, key):
        cfg = DSC_PRESETS["temp_0031bpp"]
        h = w = 64
        im1 = _img(key, (1, h, w, 3))
        im2 = _img(jax.random.fold_in(key, 1), (1, h, w, 3))
        model = DSCStereoModel(cfg)
        params = model.init({"params": key, "quant": key}, im1, im2, train=False)
        out = model.apply(params, im1, im2, train=False)
        # code quantized to step grid and clipped
        code = np.asarray(out["code"])
        np.testing.assert_allclose(code, np.round(code / cfg.coarse_step) * cfg.coarse_step)
        if cfg.code_clip:
            assert np.max(np.abs(code)) <= cfg.code_clip
        assert np.isfinite(float(out["loss_full"]))

    def test_flagship_train_mode(self, key):
        cfg = DSC_PRESETS["temp_0031bpp"]
        im1 = _img(key, (1, 64, 64, 3))
        im2 = _img(jax.random.fold_in(key, 1), (1, 64, 64, 3))
        model = DSCStereoModel(cfg)
        params = model.init({"params": key, "quant": key}, im1, im2, train=True)
        out = model.apply(params, im1, im2, train=True, rngs={"quant": key})
        assert "im1_hat" in out and "im2_hat" in out
        assert np.isfinite(float(out["loss"]))
        assert np.isfinite(float(out["loss_full"]))

    def test_channel_mask(self, key):
        cfg = DSC_PRESETS["temp_016bpp"]
        im1 = _img(key, (1, 64, 64, 3))
        im2 = _img(jax.random.fold_in(key, 1), (1, 64, 64, 3))
        model = DSCStereoModel(cfg)
        params = model.init({"params": key, "quant": key}, im1, im2, train=False)
        mask = jnp.zeros((cfg.code_channels,)).at[0].set(1.0)
        out = model.apply(params, im1, im2, train=False, mask_channels=mask)
        code = np.asarray(out["code"])
        np.testing.assert_allclose(code[..., 0], 0.0)

    def test_016bpp_si_ablation_preset(self, key):
        """temp_016bpp_si_ablation = reference-HEAD state of temp_016bpp
        (zeros concatenated for z2, temp_016bpp.py:129): same params tree as
        the base preset, and the SI image must not influence the recon."""
        base = DSC_PRESETS["temp_016bpp"]
        abl = DSC_PRESETS["temp_016bpp_si_ablation"]
        assert abl.si_mode == "zero_si" and abl.code_channels == base.code_channels

        im1 = _img(key, (1, 64, 64, 3))
        im2 = _img(jax.random.fold_in(key, 1), (1, 64, 64, 3))
        model = DSCStereoModel(abl)
        params = model.init({"params": key, "quant": key}, im1, im2, train=False)
        # identical param tree → reference-HEAD checkpoints import without
        # any caller-side si_mode override
        base_params = DSCStereoModel(base).init(
            {"params": key, "quant": key}, im1, im2, train=False
        )
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            base_params
        )
        out_a = model.apply(params, im1, im2, train=False)
        out_b = model.apply(params, im1, jnp.zeros_like(im2), train=False)
        np.testing.assert_array_equal(np.asarray(out_a["recon"]), np.asarray(out_b["recon"]))

    def test_shared_vs_separate_encoder_param_count(self, key):
        im1 = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
        shared = DSCStereoModel(DSC_PRESETS["temp_0031bpp"])
        sep = DSCStereoModel(DSC_PRESETS["classic_dsc"])
        ps = jax.eval_shape(
            lambda a: shared.init({"params": key, "quant": key}, a, a, train=False), im1
        )
        pp = jax.eval_shape(
            lambda a: sep.init({"params": key, "quant": key}, a, a, train=False), im1
        )
        assert "g_a_y" not in ps["params"]
        assert "g_a_y" in pp["params"]

    @pytest.mark.parametrize(
        "preset", ["att_0031bpp", "fif_0031bpp", "pam_0031bpp", "freq_sep", "larger_gz",
                   "bottleneck_att_1bpp", "high_bit_rate2", "add_zy_down", "reg_0_0625",
                   "smaller_z"]
    )
    def test_fusion_variant_structures(self, key, preset):
        """Param-tree structure checks for the fusion-variant presets."""
        cfg = DSC_PRESETS[preset]
        im1 = jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32)
        model = DSCStereoModel(cfg)
        tree = jax.eval_shape(
            lambda a: model.init({"params": key, "quant": key}, a, a, train=False), im1
        )["params"]
        if cfg.fusion_pre == "fif":
            assert "fif" in tree
        if cfg.fusion_post == "bot_att":
            assert "final_conv" in tree
        if cfg.fusion_post == "patch_att":
            assert "bot_mhsa" in tree and "final_conv" in tree
        if cfg.fusion_post == "pam":
            assert "pam" in tree
        if cfg.gz2:
            assert "g_z1hat_z2_freq2" in tree
