"""Tests for attention / PASSR / enhancement / extra model components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.models import (
    PAM,
    PASSRnet,
    AdaptiveBatchNorm,
    AnalysisSmall,
    ConvBlock,
    FIF,
    FIFEnhance,
    FinalEnhanceNet,
    ImageCompressorFC,
    LatentCompressor,
    NLBlock,
    PatchMatchAttention,
    SynthesisSmall,
    bottleneck_attention,
    passr_losses,
)


def _u(key, shape):
    return jax.random.uniform(key, shape, jnp.float32)


class TestBottleneckAttention:
    def test_shapes_and_softmax(self, key):
        q = jax.random.normal(key, (1, 4, 6, 8))
        kv = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 6, 8))
        out = bottleneck_attention(q, kv)
        assert out.shape == q.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_attention_is_convex_combination(self, key):
        # output tokens must lie within [min, max] of value tokens per channel
        q = jax.random.normal(key, (1, 3, 3, 4))
        kv = jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 3, 4))
        out = np.asarray(bottleneck_attention(q, kv))
        kvf = np.asarray(kv).reshape(-1, 4)
        assert np.all(out.reshape(-1, 4) <= kvf.max(axis=0) + 1e-5)
        assert np.all(out.reshape(-1, 4) >= kvf.min(axis=0) - 1e-5)


class TestPatchMatchAttention:
    def test_shapes(self, key):
        m = PatchMatchAttention(dim=3)
        q = _u(key, (1, 27, 36, 3))
        kv = _u(jax.random.fold_in(key, 1), (1, 27, 36, 3))
        params = m.init(key, q, kv)
        out = m.apply(params, q, kv)
        # 27/9=3, 36/9=4 patch grid -> refold to 27x36
        assert out.shape == (1, 27, 36, 3)
        # weights: conv patch embeds q (9x9 s9) and k (9x9 s3)
        assert params["params"]["q_patches"]["weight"].shape == (9, 9, 3, 3)
        assert "scale_att" in params["params"]


class TestPAM:
    def test_eval_and_train_outputs(self, key):
        pam = PAM(16)
        xl = jax.random.normal(key, (1, 8, 12, 16))
        xr = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 12, 16))
        params = pam.init(key, xl, xr, train=False)
        out = pam.apply(params, xl, xr, train=False)
        assert out.shape == (1, 8, 12, 16)
        out, ms, cycles, vs = pam.apply(params, xl, xr, train=True)
        m_r2l, m_l2r = ms
        assert m_r2l.shape == (1, 8, 12, 12)
        # each attention row is a distribution
        np.testing.assert_allclose(
            np.asarray(jnp.sum(m_r2l, axis=-1)), 1.0, rtol=1e-5
        )
        v_l2r, v_r2l = vs
        assert set(np.unique(np.asarray(v_l2r))) <= {0.0, 1.0}

    def test_passr_net_and_losses(self, key):
        net = PASSRnet(upscale_factor=2, channels=8)
        xl = _u(key, (1, 16, 16, 3))
        xr = _u(jax.random.fold_in(key, 1), (1, 16, 16, 3))
        params = net.init(key, xl, xr, train=False)
        sr = net.apply(params, xl, xr, train=False)
        assert sr.shape == (1, 32, 32, 3)
        sr, ms, cycles, vs = net.apply(params, xl, xr, train=True)
        hr = _u(jax.random.fold_in(key, 2), (1, 32, 32, 3))
        losses = passr_losses(sr, hr, ms, cycles, vs, xl, xr)
        for v in losses.values():
            assert np.isfinite(float(v))


class TestEnhance:
    def test_conv_block_identity_init(self, key):
        blk = ConvBlock(8, 3, dilation=2)
        x = jax.random.normal(key, (1, 8, 8, 8))
        params = blk.init(key, x, train=False)
        out = blk.apply(params, x, train=False)
        # identity conv init + leaky relu + abn(a=1,b=0) -> leaky_relu(x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jax.nn.leaky_relu(x, 0.2)), rtol=1e-5, atol=1e-6
        )

    def test_fif_and_enhance_shapes(self, key):
        x = jax.random.normal(key, (1, 16, 16, 32))
        fif = FIF(features=32)
        params = fif.init(key, x, train=False)
        assert fif.apply(params, x, train=False).shape == x.shape

        img = _u(key, (1, 32, 32, 6))
        enh = FinalEnhanceNet(n=16)
        eparams = enh.init(key, img)
        out = enh.apply(eparams, img)
        assert out.shape == (1, 32, 32, 3)

        fe = FIFEnhance(features=16)
        feparams = fe.init(key, img, train=False)
        assert fe.apply(feparams, img, train=False).shape == (1, 32, 32, 3)

    def test_batchnorm_mutable_train(self, key):
        abn = AdaptiveBatchNorm()
        x = jax.random.normal(key, (2, 4, 4, 3))
        variables = abn.init(key, x, train=True)
        out, updates = abn.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape == x.shape
        assert "batch_stats" in updates


class TestExtraModels:
    def test_image_compressor_fc(self, key):
        m = ImageCompressorFC(out_channel_n=8)
        x = _u(key, (1, 32, 32, 3))
        params = m.init({"params": key, "quant": key}, x, train=False)
        out = m.apply(params, x, train=False)
        assert out["recon"].shape == x.shape
        assert np.isfinite(float(out["bpp"]))
        # fc operates on the flattened latent
        assert params["params"]["fc"]["kernel"].shape == (2 * 2 * 8, 2 * 2 * 8)

    def test_latent_compressor(self, key):
        m = LatentCompressor()
        z1 = jax.random.normal(key, (1, 8, 8, 128))
        z2 = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 128))
        params = m.init(key, z1, z2)
        out = m.apply(params, z1, z2)
        assert out["recon_z"].shape == z1.shape
        assert out["z1_down"].shape == (1, 8, 8, 32)
        assert np.isfinite(float(out["mse"]))

    def test_small_codec_roundtrip_shapes(self, key):
        enc = AnalysisSmall(out_channel_n=32, out_channel_m=16)
        # input: 1024-ch 16x16 latent grid (flattens to 4096 at m=16)
        x = jax.random.normal(key, (1, 16, 16, 1024))
        eparams = enc.init(key, x)
        code = enc.apply(eparams, x)
        assert code.shape == (1, 1024)
        dec = SynthesisSmall(out_channel_n=32, out_channel_m=16)
        dparams = dec.init(key, code)
        out = dec.apply(dparams, code)
        assert out.shape == (1, 16, 16, 1024)


class TestNLBlock:
    @pytest.mark.parametrize("mode", ["gaussian", "embedded", "dot"])
    def test_modes(self, key, mode):
        m = NLBlock(in_channels=8, mode=mode)
        x = jax.random.normal(key, (1, 4, 4, 8))
        params = m.init(key, x)
        out = m.apply(params, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))


class TestNLBlockDims:
    @pytest.mark.parametrize("dims,shape", [(1, (1, 12, 8)), (3, (1, 3, 4, 4, 8))])
    def test_1d_3d(self, key, dims, shape):
        m = NLBlock(in_channels=8, mode="embedded", dims=dims)
        x = jax.random.normal(key, shape)
        params = m.init(key, x)
        out = m.apply(params, x)
        assert out.shape == x.shape
        # W_z zero-init → the block starts as the identity
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_rank_mismatch_raises(self, key):
        m = NLBlock(in_channels=8, dims=1)
        x = jax.random.normal(key, (1, 4, 4, 8))
        with pytest.raises(ValueError, match="rank"):
            m.init(key, x)


class TestResidualUnits:
    def test_rb11_shapes_and_skip(self, key):
        from iclr_17_compression_tpu.nn import ResidualBlock11

        m = ResidualBlock11(features=16)
        x = jax.random.normal(key, (1, 8, 8, 8))
        params = m.init(key, x)
        out = m.apply(params, x)
        assert out.shape == (1, 8, 8, 16)
        assert "skip" in params["params"]  # 8→16 channels: projected skip
        # same-channels: identity skip, no extra params
        m2 = ResidualBlock11(features=8)
        p2 = m2.init(key, x)
        assert "skip" not in p2["params"]

    def test_rb33_valid_padding_no_skip(self, key):
        from iclr_17_compression_tpu.nn import ResidualBlock33

        m = ResidualBlock33(features=8)
        x = jax.random.normal(key, (1, 8, 8, 8))
        params = m.init(key, x)
        out = m.apply(params, x)
        # reference conv has no padding → spatial −2; skip is commented out
        assert out.shape == (1, 6, 6, 8)
        assert float(jnp.min(out)) >= 0.0  # ends in ReLU
