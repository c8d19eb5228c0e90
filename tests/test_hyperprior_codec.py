"""Scale-hyperprior real-bitstream codec (models/hyperprior.py compress/
decompress + the codec_cli 'hyperprior' kind + the 2018-family torch import).

The reference models the σ-normalized quantization scheme in an executable
main (reference models/synthesis_prior.py:42-67) and a commented Laplace
rate (model.py:63-69) but never codes a file; these tests pin our codec's
round-trip exactness for both quantization modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models import ScaleHyperprior
from iclr_17_compression_tpu.models.hyperprior import compress, decompress

N, M = 8, 12


def _model_params(quant, key):
    model = ScaleHyperprior(out_channel_n=N, out_channel_m=M, quant=quant)
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    params = model.init({"params": key, "quant": key}, x, train=False)
    return model, params, x


@pytest.mark.parametrize("quant", ["round", "sigma-norm"])
def test_bitstream_round_trip_matches_eval_forward(quant, key):
    model, params, x = _model_params(quant, key)
    comp = compress(model, params, np.asarray(x))
    recon = decompress(model, params, comp)

    # eval forward builds the same y_hat (round(y) | round(y/σ)·σ) → the
    # decoded reconstruction must match the in-graph one
    out = model.apply(params, x, train=False)
    np.testing.assert_allclose(recon, np.asarray(out["recon"]), atol=1e-5)

    # real rate is positive and within sanity distance of the estimate
    n_pix = x.shape[1] * x.shape[2]
    assert comp.num_bits > 0
    assert comp.num_bits / n_pix < 12 * float(out["bpp"]) + 2.0

    # decode determinism
    recon2 = decompress(model, params, comp)
    np.testing.assert_array_equal(recon, recon2)


def test_codec_cli_hyperprior_roundtrip(key, tmp_path):
    from iclr_17_compression_tpu.coding.codec_cli import (
        KIND_HYPERPRIOR,
        build_model,
        decode_image,
        encode_image,
    )

    model, params, x = _model_params("round", key)
    kind, built, mult = build_model("hyperprior", N, M)
    assert kind == KIND_HYPERPRIOR and mult == 64
    assert built.out_channel_n == N and built.out_channel_m == M

    img = np.asarray(x)[0]
    data = encode_image(img, "hyperprior", params, n=N, m=M)
    recon = decode_image(data, params)
    assert recon.shape == img.shape
    out = model.apply(params, x, train=False)
    np.testing.assert_allclose(recon, np.asarray(out["recon"])[0], atol=1e-5)


def _fake_hyperprior_state_dict(rng):
    """Reference-schema 2018 state dict (models/analysis.py:14-28 etc.)."""
    import torch

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    ped = np.float32(np.sqrt(1.0 + 2.0 ** -36))
    sd = {}
    feats = [(3, N), (N, N), (N, N), (N, M)]
    for i, (ci, co) in enumerate(feats, 1):
        sd[f"Encoder.conv{i}.weight"] = t(co, ci, 5, 5)
        sd[f"Encoder.conv{i}.bias"] = t(co)
        if i < 4:
            sd[f"Encoder.gdn{i}.beta"] = torch.full((co,), ped)
            sd[f"Encoder.gdn{i}.gamma"] = torch.from_numpy(
                np.sqrt(0.1 * np.eye(co, dtype=np.float32) + 2.0 ** -36)
            )
    feats = [(M, N), (N, N), (N, N), (N, 3)]
    for i, (ci, co) in enumerate(feats, 1):
        sd[f"Decoder.deconv{i}.weight"] = t(ci, co, 5, 5)
        sd[f"Decoder.deconv{i}.bias"] = t(co)
        if i < 4:
            sd[f"Decoder.igdn{i}.beta"] = torch.full((co,), ped)
            sd[f"Decoder.igdn{i}.gamma"] = torch.from_numpy(
                np.sqrt(0.1 * np.eye(co, dtype=np.float32) + 2.0 ** -36)
            )
    sd["priorEncoder.conv1.weight"] = t(N, M, 3, 3)
    sd["priorEncoder.conv1.bias"] = t(N)
    sd["priorEncoder.conv2.weight"] = t(N, N, 5, 5)
    sd["priorEncoder.conv2.bias"] = t(N)
    sd["priorEncoder.conv3.weight"] = t(N, N, 5, 5)
    sd["priorEncoder.conv3.bias"] = t(N)
    sd["priorDecoder.deconv1.weight"] = t(N, N, 5, 5)
    sd["priorDecoder.deconv1.bias"] = t(N)
    sd["priorDecoder.deconv2.weight"] = t(N, N, 5, 5)
    sd["priorDecoder.deconv2.bias"] = t(N)
    sd["priorDecoder.deconv3.weight"] = t(N, M, 3, 3)
    sd["priorDecoder.deconv3.bias"] = t(M)
    for f in ("f1", "f2", "f3", "f4"):
        sd[f"bitEstimator_z.{f}.h"] = t(1, N, 1, 1)
        sd[f"bitEstimator_z.{f}.b"] = t(1, N, 1, 1)
        if f != "f4":
            sd[f"bitEstimator_z.{f}.a"] = t(1, N, 1, 1)
    return sd


def test_import_hyperprior_structure_and_forward(key, rng):
    from iclr_17_compression_tpu.train.torch_import import (
        import_hyperprior,
        load_torch_state_dict,
        merge_partial,
    )

    sd = load_torch_state_dict(_fake_hyperprior_state_dict(rng))
    imported = import_hyperprior(sd)

    model = ScaleHyperprior(out_channel_n=N, out_channel_m=M)
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    init = model.init({"params": key, "quant": key}, x, train=False)
    merged = {"params": merge_partial(init["params"], imported)}

    # every leaf slot of the model is covered by the reference schema
    flat_init = jax.tree_util.tree_leaves(init["params"])
    flat_imp = jax.tree_util.tree_leaves(imported)
    assert len(flat_imp) == len(flat_init)

    out = model.apply(merged, x, train=False)
    for k in ("mse", "bpp", "bpp_y", "bpp_z"):
        assert np.isfinite(float(out[k])), k
