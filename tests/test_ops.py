"""Unit tests for the functional primitive ops.

Torch-parity tests build the comparison from torch *functional* primitives
(F.conv2d etc.) and the published formulas — never from reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from iclr_17_compression_tpu.ops import (
    add_uniform_noise,
    binarize_ste,
    bit_estimator_cdf,
    bit_estimator_init,
    conv2d,
    conv_transpose2d,
    estimate_bits,
    gdn,
    gdn_param_init,
    lower_bound,
    ms_ssim,
    ms_ssim_db,
    pixel_shuffle,
    psnr,
    quantize_coarse,
    quantize_coarse_ste,
    round_ste,
    ssim,
)
from iclr_17_compression_tpu.ops.gdn import GDNParams, PEDESTAL


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(lower_bound(x, 1.0), [1.0, 1.0, 2.0])

    def test_grad_gating(self):
        # below bound, positive upstream grad -> blocked
        # below bound, negative upstream grad -> passes (pulls value up)
        # above bound -> always passes
        def f(x):
            return lower_bound(x, 1.0)

        x = jnp.array([0.5, 0.5, 2.0, 2.0])
        g = jnp.array([1.0, -1.0, 1.0, -1.0])
        _, vjp = jax.vjp(f, x)
        (dx,) = vjp(g)
        np.testing.assert_allclose(dx, [0.0, -1.0, 1.0, -1.0])


class TestConvParity:
    @pytest.mark.parametrize(
        "cin,cout,k,s,p", [(3, 8, 9, 4, 4), (8, 8, 5, 2, 2), (4, 6, 3, 1, 1)]
    )
    def test_conv2d_matches_torch(self, rng, cin, cout, k, s, p):
        x = rng.standard_normal((2, 17, 23, cin), dtype=np.float32)
        w = rng.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.1
        b = rng.standard_normal((cout,), dtype=np.float32)

        ours = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=s, padding=p)

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
        ref = F.conv2d(xt, wt, torch.from_numpy(b), stride=s, padding=p)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize(
        "cin,cout,k,s,p,op",
        [(8, 8, 5, 2, 2, 1), (8, 3, 9, 4, 4, 3), (4, 6, 3, 1, 1, 0)],
    )
    def test_conv_transpose2d_matches_torch(self, rng, cin, cout, k, s, p, op):
        x = rng.standard_normal((2, 9, 11, cin), dtype=np.float32)
        # torch layout (Cin, Cout, kh, kw)
        wt_np = rng.standard_normal((cin, cout, k, k), dtype=np.float32) * 0.1
        b = rng.standard_normal((cout,), dtype=np.float32)

        # our layout: equivalent-forward-conv HWIO, pre-flipped
        w_ours = np.flip(wt_np, axis=(2, 3)).transpose(2, 3, 0, 1)  # (k,k,Cin,Cout)
        ours = conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w_ours.copy()), jnp.asarray(b),
            stride=s, padding=p, output_padding=op,
        )

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.conv_transpose2d(
            xt, torch.from_numpy(wt_np), torch.from_numpy(b),
            stride=s, padding=p, output_padding=op,
        )
        ref = ref.permute(0, 2, 3, 1).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    def test_pixel_shuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 5, 7, 12), dtype=np.float32)
        ours = pixel_shuffle(jnp.asarray(x), 2)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.pixel_shuffle(xt, 2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-6)


class TestGDN:
    def test_identity_init_formula(self, rng):
        """At init gamma=0.1*I, beta=1 -> y = x / sqrt(1 + 0.1 x^2)."""
        ch = 16
        params = gdn_param_init(ch)
        x = jnp.asarray(rng.standard_normal((2, 4, 4, ch), dtype=np.float32))
        y = gdn(x, params)
        expected = x / jnp.sqrt(1.0 + 0.1 * x * x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-4, atol=1e-5)

    def test_inverse_roundtrip_at_init(self, rng):
        ch = 8
        params = gdn_param_init(ch)
        x = jnp.asarray(rng.standard_normal((1, 4, 4, ch), dtype=np.float32))
        y = gdn(x, params, inverse=False)
        # IGDN is not the exact inverse pointwise (norm computed on its own
        # input), but at identity-ish init applying igdn to gdn output should
        # be close to x for small x.
        pass  # covered by formula test; roundtrip is not an invariant

    def test_general_gamma_formula(self, rng):
        """y_i = x_i / sqrt(beta_i + sum_j gamma_{ij} x_j^2) with random params."""
        ch = 6
        beta_eff = np.abs(rng.standard_normal(ch)).astype(np.float32) + 0.5
        gamma_eff = np.abs(rng.standard_normal((ch, ch))).astype(np.float32) * 0.05
        # store reparameterized
        params = GDNParams(
            beta=jnp.sqrt(jnp.asarray(beta_eff) + PEDESTAL),
            gamma=jnp.sqrt(jnp.asarray(gamma_eff) + PEDESTAL),
        )
        x = rng.standard_normal((2, 3, 3, ch), dtype=np.float32)
        y = gdn(jnp.asarray(x), params)
        norm = np.sqrt(beta_eff + np.einsum("nhwj,ij->nhwi", x ** 2, gamma_eff))
        np.testing.assert_allclose(np.asarray(y), x / norm, rtol=1e-4, atol=1e-5)


class TestQuant:
    def test_noise_bounds(self, key):
        x = jnp.zeros((1000,))
        y = add_uniform_noise(x, key, 8.0)
        assert float(jnp.max(jnp.abs(y))) <= 8.0
        assert float(jnp.std(y)) > 2.0

    def test_round_ste_grad(self):
        g = jax.grad(lambda x: jnp.sum(round_ste(x) ** 2))(jnp.array([1.2]))
        # d/dx (round(x))^2 with STE = 2*round(x)
        np.testing.assert_allclose(g, [2.0])

    def test_coarse(self):
        x = jnp.array([7.0, 9.0, 200.0, -200.0, -24.0])
        # -24/16 = -1.5 rounds half-to-even to -2 (torch.round parity)
        np.testing.assert_allclose(
            quantize_coarse(x), [0.0, 16.0, 128.0, -128.0, -32.0]
        )

    def test_coarse_ste_grad(self):
        g = jax.grad(lambda x: jnp.sum(quantize_coarse_ste(x)))(jnp.array([7.0]))
        np.testing.assert_allclose(g, [1.0])

    def test_binarize(self):
        x = jnp.array([0.2, 0.7])
        np.testing.assert_allclose(binarize_ste(x), [0.0, 1.0])
        g = jax.grad(lambda x: jnp.sum(binarize_ste(x) * 3.0))(x)
        np.testing.assert_allclose(g, [3.0, 3.0])


class TestBitEstimator:
    def test_cdf_monotone_and_bounded(self, key):
        params = bit_estimator_init(key, 8)
        xs = jnp.linspace(-50, 50, 201).reshape(-1, 1) * jnp.ones((1, 8))
        cdf = bit_estimator_cdf(xs, params)
        assert float(jnp.min(cdf)) >= 0.0 and float(jnp.max(cdf)) <= 1.0
        diffs = jnp.diff(cdf, axis=0)
        assert float(jnp.min(diffs)) >= -1e-7  # monotone nondecreasing

    def test_bits_positive(self, key):
        params = bit_estimator_init(key, 4)
        z = jnp.asarray(np.random.default_rng(0).integers(-10, 10, (2, 8, 8, 4)), jnp.float32)
        bits, prob = estimate_bits(z, params)
        assert float(bits) > 0
        assert prob.shape == z.shape


class TestMetrics:
    def test_psnr(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)

    def test_ssim_identical(self, rng):
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ms_ssim_range_and_db(self, rng):
        x = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))
        y = jnp.clip(x + 0.05 * jnp.asarray(rng.standard_normal((1, 192, 192, 3), dtype=np.float32)), 0, 1)
        v = float(ms_ssim(x, y))
        assert 0.0 < v < 1.0
        assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
        assert float(ms_ssim_db(jnp.float32(0.9))) == pytest.approx(10.0, rel=1e-5)

    def test_ms_ssim_ordering(self, rng):
        """More noise -> lower MS-SSIM."""
        x = jnp.asarray(rng.random((1, 160, 160, 3), dtype=np.float32))
        n = jnp.asarray(rng.standard_normal((1, 160, 160, 3), dtype=np.float32))
        a = float(ms_ssim(x, jnp.clip(x + 0.02 * n, 0, 1)))
        b = float(ms_ssim(x, jnp.clip(x + 0.10 * n, 0, 1)))
        assert a > b
