"""Round-2 eval-surface tests: two-stage reg composition + composite codec,
PASSR eval, FIF-enhance eval, and the hardened Kodak rANS path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.models import DSC_PRESETS, DSCStereoModel


def _pair(key, h=128, w=128):
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (h, w, 3), jnp.float32)
    # correlated "other eye": shifted copy + noise
    b = jnp.clip(jnp.roll(a, 4, axis=1) + 0.05 * jax.random.normal(k2, a.shape), 0, 1)
    return np.asarray(a), np.asarray(b)


@pytest.fixture(scope="module")
def dsc_models():
    key = jax.random.PRNGKey(0)
    base = DSCStereoModel(DSC_PRESETS["tiny"])
    reg = DSCStereoModel(DSC_PRESETS["tiny_reg"])
    ex = jnp.zeros((1, 128, 128, 3))
    bp = base.init({"params": key, "quant": key}, ex, ex, train=False)
    rp = reg.init({"params": jax.random.fold_in(key, 1), "quant": key}, ex, ex, train=False)
    return base, bp, reg, rp


class TestRegStage:
    def test_eval_reg_stage(self, dsc_models, key):
        from iclr_17_compression_tpu.eval import compose_recon, eval_reg_stage

        base, bp, reg, rp = dsc_models
        pairs = [_pair(jax.random.fold_in(key, i)) for i in range(2)]
        res = eval_reg_stage(base, bp, reg, rp, pairs)
        for k in ("psnr", "ms_ssim", "bpp_rans", "bpp_gzip", "bpp_base", "bpp_reg"):
            assert np.isfinite(res[k]), k
        # summed rate = base + reg components
        assert res["bpp_rans"] == pytest.approx(res["bpp_base"] + res["bpp_reg"])
        assert len(res["per_image"]) == 2
        # composition clips
        c = compose_recon(jnp.ones((1, 4, 4, 3)), jnp.ones((1, 4, 4, 3)))
        assert float(jnp.max(c)) == 1.0

    def test_composite_codec_roundtrip(self, dsc_models, key, tmp_path):
        """File-level two-code bitstream decodes to exactly
        clip(base_recon + residual) from the full models' forward pass."""
        from iclr_17_compression_tpu.coding.codec_cli import (
            decode_composite,
            encode_composite,
        )
        from iclr_17_compression_tpu.eval import compose_recon

        base, bp, reg, rp = dsc_models
        a, b = _pair(key)
        data = encode_composite(a, "tiny", bp, "tiny_reg", rp, n=16)
        rec = decode_composite(data, bp, rp, b)
        assert rec.shape == a.shape

        im1 = jnp.asarray(a)[None]
        im2 = jnp.asarray(b)[None]
        base_out = base.apply(bp, im1, im2, train=False)
        reg_out = reg.apply(rp, im1, im2, train=False)
        want = np.asarray(compose_recon(base_out["recon"], reg_out["recon_raw"]))[0]
        np.testing.assert_allclose(rec, want, atol=1e-5)

        # rate sanity: container smaller than raw code bytes would be at 8bpc
        assert len(data) * 8 < a.shape[0] * a.shape[1] * 3 * 8


class TestPassrEval:
    def test_eval_passr(self, key):
        from iclr_17_compression_tpu.eval import eval_passr
        from iclr_17_compression_tpu.models import PASSRnet

        model = PASSRnet(upscale_factor=1, channels=8)
        ex = jnp.zeros((1, 64, 64, 3))
        params = model.init({"params": key}, ex, ex, train=False)

        def triplet(i):
            a, b = _pair(jax.random.fold_in(key, i), 64, 64)
            blurry = a * 0.5 + 0.25  # stand-in for the resize blur
            return blurry.astype(np.float32), b, a

        res = eval_passr(model, params, [triplet(i) for i in range(2)])
        for k in ("psnr", "psnr_input", "ms_ssim", "ms_ssim_db"):
            assert np.isfinite(res[k]), k
        assert len(res["per_image"]) == 2


class TestEnhanceEval:
    def test_eval_enhance(self, key):
        from iclr_17_compression_tpu.eval import eval_enhance
        from iclr_17_compression_tpu.models import FinalEnhanceNet

        model = FinalEnhanceNet(n=8)
        ex = jnp.zeros((1, 64, 64, 6))
        params = model.init({"params": key}, ex)

        def triplet(i):
            orig, si = _pair(jax.random.fold_in(key, i), 64, 64)
            rec = np.clip(orig + 0.1 * np.random.default_rng(i).standard_normal(orig.shape), 0, 1)
            return si, rec.astype(np.float32), orig

        res = eval_enhance(model, params, [triplet(i) for i in range(2)])
        for k in ("psnr", "psnr_unenhanced", "ms_ssim", "ms_ssim_unenhanced"):
            assert np.isfinite(res[k]), k


class TestKodakRans:
    def test_auto_bounds_and_overflow_raise(self, key):
        from iclr_17_compression_tpu.eval import eval_kodak
        from iclr_17_compression_tpu.models import Balle17Compressor

        model = Balle17Compressor(out_channel_n=8)
        x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
        params = model.init({"params": key, "quant": key}, x, train=False)
        imgs = [np.asarray(jax.random.uniform(jax.random.fold_in(key, i), (64, 64, 3)))
                for i in range(2)]

        # auto-derived bounds: measured bpp present and finite
        res = eval_kodak(model, params, imgs, use_rans=True)
        assert np.isfinite(res["bpp"]) and res["bpp"] > 0

        # bounds too narrow → hard error, never a silent clip
        with pytest.raises(ValueError, match="rANS"):
            eval_kodak(model, params, imgs, use_rans=True, rans_bounds=(0, 0))


class TestBestWorstDump:
    def test_eval_single_image_dumps(self, key, tmp_path):
        import os

        from iclr_17_compression_tpu.eval import eval_single_image
        from iclr_17_compression_tpu.models import Balle17Compressor

        model = Balle17Compressor(out_channel_n=8)
        x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
        params = model.init({"params": key, "quant": key}, x, train=False)
        imgs = [np.asarray(jax.random.uniform(jax.random.fold_in(key, i), (64, 64, 3)))
                for i in range(3)]
        res = eval_single_image(model, params, imgs, dump_dir=str(tmp_path / "d"))
        assert res["best"]["psnr"] >= res["worst"]["psnr"]
        files = os.listdir(tmp_path / "d")
        assert sum(f.startswith("best_recon") for f in files) == 1
        assert sum(f.startswith("worst_original") for f in files) == 1
