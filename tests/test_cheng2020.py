"""Joint-autoregressive hierarchical-prior codec (models/cheng2020.py).

Covers: shape laws of the four transforms (reference models/temp.py:62-107),
train/eval forward, causality of the mask-A context model, a train step, and
an exact bitstream round trip through the C++ rANS streaming decoder
(the entropy path the reference imports but never runs, SURVEY.md §2.6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.models import JointAutoregressive
from iclr_17_compression_tpu.models.cheng2020 import (
    ChengAnalysis,
    ChengHyperAnalysis,
    ChengHyperSynthesis,
    ChengSynthesis,
    compress,
    decompress,
)

N = 16  # small-N instance: same wiring, CI-sized


@pytest.fixture(scope="module")
def model_and_params():
    model = JointAutoregressive(n=N)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 64, 64, 3))
    params = model.init({"params": key, "quant": key}, x, train=False)
    return model, params, x


def test_transform_shape_laws(key):
    x = jnp.zeros((2, 64, 96, 3))
    y = ChengAnalysis(N).init_with_output(key, x)[0]
    assert y.shape == (2, 4, 6, N)  # ÷16
    z = ChengHyperAnalysis(N).init_with_output(key, y)[0]
    assert z.shape == (2, 1, 2, N)  # ÷4 on latent grid (pad-rounded)
    hyper = ChengHyperSynthesis(N).init_with_output(key, z)[0]
    assert hyper.shape == (2, 4, 8, 2 * N)  # ×4, 2N channels
    recon = ChengSynthesis(N).init_with_output(key, y)[0]
    assert recon.shape == (2, 64, 96, 3)  # ×16


def test_forward_eval_and_train(model_and_params):
    model, params, x = model_and_params
    out = model.apply(params, x, train=False)
    assert out["recon"].shape == x.shape
    assert out["latent"].shape == (1, 4, 4, N)
    # eval latent is integral
    np.testing.assert_allclose(out["latent"], jnp.round(out["latent"]))
    for k in ("bpp", "bpp_y", "bpp_z", "mse"):
        assert np.isfinite(float(out[k])), k
    assert float(out["bpp"]) > 0
    # sigma respects the lower bound used by the static scale table
    assert float(out["sigma"].min()) >= model.scale_bound - 1e-6

    out_t = model.apply(
        params, x, train=True, rngs={"quant": jax.random.PRNGKey(7)}
    )
    assert not np.allclose(np.asarray(out_t["latent"]), np.asarray(out["latent"]))


def test_context_model_is_causal(model_and_params):
    """Perturbing a later-in-raster-order latent pixel must not change the
    (mu, sigma) prediction at an earlier pixel — decodability condition."""
    model, params, x = model_and_params
    out = model.apply(params, x, train=False)
    y_hat = np.asarray(out["latent"])
    y_pert = y_hat.copy()
    y_pert[0, 2, 2, :] += 100.0  # pixel (2,2); earlier pixels: (1,3), (2,1)

    from iclr_17_compression_tpu.nn.layers import MaskedConv

    mc = MaskedConv(2 * N, 5, mask_type="A", padding=2)
    mc_params = {"params": params["params"]["context_prediction"]}
    c0 = np.asarray(mc.apply(mc_params, jnp.asarray(y_hat)))
    c1 = np.asarray(mc.apply(mc_params, jnp.asarray(y_pert)))
    np.testing.assert_array_equal(c0[0, :2], c1[0, :2])  # all earlier rows
    np.testing.assert_array_equal(c0[0, 2, :3], c1[0, 2, :3])  # incl. (2,2) itself
    assert not np.array_equal(c0[0, 2, 3:], c1[0, 2, 3:])  # later pixels do change


def test_train_step_runs_and_is_finite(model_and_params):
    from iclr_17_compression_tpu.train import create_train_state
    from iclr_17_compression_tpu.train.state import make_hyperprior_train_step

    model, _, x = model_and_params
    rng = jax.random.PRNGKey(3)
    state = create_train_state(model, rng, (x,), lr=1e-4)
    step = jax.jit(make_hyperprior_train_step(train_lambda=1024.0))
    state, metrics = step(state, x, rng)
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_bitstream_round_trip_exact(model_and_params):
    """compress → decompress reproduces the encoder's y_hat bit-exactly and
    the stream size is consistent with the model's own rate estimate."""
    model, params, x = model_and_params
    comp, y_hat_enc = compress(model, params, np.asarray(x), return_y_hat=True)
    recon, y_hat_dec = decompress(model, params, comp, return_y_hat=True)

    np.testing.assert_array_equal(y_hat_enc, y_hat_dec)
    assert recon.shape == x.shape
    assert recon.min() >= 0.0 and recon.max() <= 1.0

    # real rate within sanity distance of the differentiable estimate
    n_pixels = x.shape[1] * x.shape[2]
    real_bpp = comp.num_bits / n_pixels
    est_bpp = float(model.apply(params, x, train=False)["bpp"])
    assert real_bpp > 0
    # static tables + untrained net: allow generous headroom, but the order
    # of magnitude must match
    assert real_bpp < 12 * est_bpp + 2.0

    # decode determinism
    recon2 = decompress(model, params, comp)
    np.testing.assert_array_equal(recon, recon2)


def test_native_ar_context_matches_numpy(model_and_params):
    """The C++ AR context driver (coding/src/ar_ctx.cc) must agree with the
    numpy reference implementation front by front — encoder/decoder stream
    consistency rests on both sides sharing whichever backend loaded."""
    from iclr_17_compression_tpu.models.cheng2020 import _HostARContext, _wavefronts

    model, params, _ = model_and_params
    host = _HostARContext(params)
    if host._native is None:
        pytest.skip("native AR driver unavailable (BLAS not found)")

    m = model.n
    h, w = 8, 12
    pad = host.kh // 2
    rng = np.random.default_rng(0)
    y_hat_pad = rng.normal(0, 2.5, (h + 2 * pad, w + 2 * pad, m)).astype(np.float32)
    base = host.prep(rng.normal(0, 1.0, (h, w, 2 * m)).astype(np.float32))
    for ii, jj in _wavefronts(h, w):
        mu_n, sg_n = host._native.mu_sigma(y_hat_pad, base, ii, jj, 0.11)
        native, host._native = host._native, None
        mu_p, sg_p = host.mu_sigma_batch(y_hat_pad, base, ii, jj, 0.11)
        host._native = native
        np.testing.assert_allclose(mu_n, mu_p, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(sg_n, sg_p, rtol=2e-4, atol=2e-4)
        assert np.all(sg_n >= 0.11)
