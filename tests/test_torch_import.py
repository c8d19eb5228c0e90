"""PyTorch checkpoint importer tests.

Numeric parity is established layer-by-layer: torch layers built from torch
primitives (not reference code) → imported weights → identical outputs.
"""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from iclr_17_compression_tpu.models import Balle17Compressor
from iclr_17_compression_tpu.train.torch_import import (
    import_balle17,
    load_torch_state_dict,
    merge_partial,
    torch_conv_weight_to_hwio,
    torch_deconv_weight_to_hwio,
)
from iclr_17_compression_tpu.ops import conv2d, conv_transpose2d


def test_conv_weight_roundtrip(rng):
    x = rng.standard_normal((1, 12, 12, 4), dtype=np.float32)
    layer = nn.Conv2d(4, 6, 5, stride=2, padding=2)
    with torch.no_grad():
        ref = layer(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    w = torch_conv_weight_to_hwio(layer.weight.detach().numpy())
    b = layer.bias.detach().numpy()
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=2)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_deconv_weight_roundtrip(rng):
    x = rng.standard_normal((1, 6, 6, 4), dtype=np.float32)
    layer = nn.ConvTranspose2d(4, 6, 5, stride=2, padding=2, output_padding=1)
    with torch.no_grad():
        ref = layer(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    w = torch_deconv_weight_to_hwio(layer.weight.detach().numpy())
    b = layer.bias.detach().numpy()
    ours = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=2, padding=2, output_padding=1,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def _fake_balle17_state_dict(n=8, rng=None):
    """Random state dict with the reference ImageCompressor key/shape schema
    (reference model.py:38-44)."""
    g = rng or np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(g.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {}
    sd["Encoder.conv1.weight"] = t(n, 3, 9, 9)
    sd["Encoder.conv1.bias"] = t(n)
    sd["Encoder.conv2.weight"] = t(n, n, 5, 5)
    sd["Encoder.conv2.bias"] = t(n)
    sd["Encoder.conv3.weight"] = t(n, n, 5, 5)
    for i in (1, 2):
        sd[f"Encoder.gdn{i}.beta"] = torch.from_numpy(
            np.sqrt(np.ones(n, np.float32) + 2.0 ** -36)
        )
        sd[f"Encoder.gdn{i}.gamma"] = torch.from_numpy(
            np.sqrt(0.1 * np.eye(n, dtype=np.float32) + 2.0 ** -36)
        )
    sd["Decoder.deconv1.weight"] = t(n, n, 5, 5)
    sd["Decoder.deconv1.bias"] = t(n)
    sd["Decoder.deconv2.weight"] = t(n, n, 5, 5)
    sd["Decoder.deconv2.bias"] = t(n)
    sd["Decoder.deconv3.weight"] = t(n, 3, 9, 9)
    sd["Decoder.deconv3.bias"] = t(3)
    for i in (1, 2):
        sd[f"Decoder.igdn{i}.beta"] = sd["Encoder.gdn1.beta"].clone()
        sd[f"Decoder.igdn{i}.gamma"] = sd["Encoder.gdn1.gamma"].clone()
    for f in ("f1", "f2", "f3", "f4"):
        sd[f"bitEstimator.{f}.h"] = t(1, n, 1, 1)
        sd[f"bitEstimator.{f}.b"] = t(1, n, 1, 1)
        if f != "f4":
            sd[f"bitEstimator.{f}.a"] = t(1, n, 1, 1)
    return sd


def test_import_balle17_structure_and_forward(key, rng):
    n = 8
    sd = load_torch_state_dict(_fake_balle17_state_dict(n, rng))
    imported = import_balle17(sd)

    model = Balle17Compressor(out_channel_n=n)
    import jax

    x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    init = model.init({"params": key, "quant": key}, x, train=False)
    merged = {"params": merge_partial(init["params"], imported)}

    # every imported leaf must have found a matching slot
    flat_init = jax.tree_util.tree_leaves(init)
    flat_merged = jax.tree_util.tree_leaves(merged)
    assert len(flat_init) == len(flat_merged)

    out = model.apply(merged, x, train=False)
    assert np.isfinite(float(out["mse"]))
    assert np.isfinite(float(out["bpp"]))


def test_partial_load_shape_mismatch_raises(key, rng):
    n = 8
    sd = load_torch_state_dict(_fake_balle17_state_dict(n, rng))
    imported = import_balle17(sd)
    model = Balle17Compressor(out_channel_n=16)  # wrong width
    import jax, pytest

    x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    init = model.init({"params": key, "quant": key}, x, train=False)
    with pytest.raises(ValueError):
        merge_partial(init["params"], imported)
