"""Torch importers for the last remaining families: PASSRnet, FIF,
finalEnhanceNet (reference models/PASSRnet.py, fast_image_filters/). No
reference checkpoints survive for these, so the tests build state dicts with
the reference code's exact key/shape schema and assert full structural
coverage + a finite forward through the merged tree."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models.enhance import FIF, FinalEnhanceNet
from iclr_17_compression_tpu.models.passr import PASSRnet
from iclr_17_compression_tpu.train.torch_import import (
    import_fif,
    import_final_enhance,
    import_passr,
    load_torch_state_dict,
    merge_partial,
)

C = 8


def _t(rng, *shape):
    return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)


def _resb_keys(sd, base, c, rng):
    sd[f"{base}.body.0.weight"] = _t(rng, c, c, 3, 3)
    sd[f"{base}.body.2.weight"] = _t(rng, c, c, 3, 3)


def _aspp_keys(sd, base, c, rng):
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            sd[f"{base}.conv{j}_{i}.0.weight"] = _t(rng, c, c, 3, 3)
        sd[f"{base}.b_{i}.weight"] = _t(rng, c, 3 * c, 1, 1)


def _fake_passr_state_dict(rng):
    sd = {}
    for eye in ("init_feature_left", "init_feature_right"):
        sd[f"{eye}.0.weight"] = _t(rng, C, 3, 3, 3)
        _resb_keys(sd, f"{eye}.2", C, rng)
        _aspp_keys(sd, f"{eye}.3", C, rng)
        _resb_keys(sd, f"{eye}.4", C, rng)
        _aspp_keys(sd, f"{eye}.5", C, rng)
        _resb_keys(sd, f"{eye}.6", C, rng)
    for b in ("b1", "b2", "b3"):
        sd[f"pam.{b}.weight"] = _t(rng, C, C, 1, 1)
        sd[f"pam.{b}.bias"] = _t(rng, C)
    _resb_keys(sd, "pam.rb", C, rng)
    sd["pam.fusion.weight"] = _t(rng, C, 2 * C + 1, 1, 1)
    sd["pam.fusion.bias"] = _t(rng, C)
    for i in range(4):
        _resb_keys(sd, f"upscale.{i}", C, rng)
    sd["upscale.4.weight"] = _t(rng, C * 4, C, 1, 1)
    sd["upscale.6.weight"] = _t(rng, 3, C, 3, 3)
    sd["upscale.7.weight"] = _t(rng, 3, 3, 3, 3)
    return sd


def test_import_passr_structure_and_forward(key, rng):
    sd = load_torch_state_dict(_fake_passr_state_dict(rng))
    imported = import_passr(sd)

    model = PASSRnet(upscale_factor=2, channels=C)
    xl = jax.random.uniform(key, (1, 16, 32, 3), jnp.float32)
    xr = jax.random.uniform(jax.random.fold_in(key, 1), (1, 16, 32, 3))
    init = model.init(key, xl, xr, train=False)
    merged = {"params": merge_partial(init["params"], imported)}

    assert len(jax.tree_util.tree_leaves(imported)) == len(
        jax.tree_util.tree_leaves(init["params"])
    )
    out = model.apply(merged, xl, xr, train=False)
    assert out.shape == (1, 32, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def _fake_fif_state_dict(rng, feat, prefix=""):
    sd = {}
    pre = prefix + "." if prefix else ""
    for name in ("conv1", "conv2", "conv3", "conv4", "conv8"):
        sd[f"{pre}{name}.convblk.0.weight"] = _t(rng, feat, feat, 3, 3)
        sd[f"{pre}{name}.convblk.0.bias"] = _t(rng, feat)
        sd[f"{pre}{name}.convblk.2.a"] = torch.ones(1, 1, 1, 1)
        sd[f"{pre}{name}.convblk.2.b"] = torch.zeros(1, 1, 1, 1)
        sd[f"{pre}{name}.convblk.2.bn.weight"] = _t(rng, feat)
        sd[f"{pre}{name}.convblk.2.bn.bias"] = _t(rng, feat)
        sd[f"{pre}{name}.convblk.2.bn.running_mean"] = _t(rng, feat)
        sd[f"{pre}{name}.convblk.2.bn.running_var"] = torch.ones(feat)
    return sd


def test_import_fif_with_batch_stats(key, rng):
    feat = C
    sd = load_torch_state_dict(_fake_fif_state_dict(rng, feat, prefix="fif"))
    params, stats = import_fif(sd, torch_prefix="fif")

    model = FIF(features=feat)
    x = jax.random.uniform(key, (1, 16, 16, feat), jnp.float32)
    init = model.init(key, x, train=False)
    merged = {
        "params": merge_partial(init["params"], params),
        "batch_stats": merge_partial(init["batch_stats"], stats),
    }
    assert len(jax.tree_util.tree_leaves(params)) == len(
        jax.tree_util.tree_leaves(init["params"])
    )
    assert len(jax.tree_util.tree_leaves(stats)) == len(
        jax.tree_util.tree_leaves(init["batch_stats"])
    )
    out = model.apply(merged, x, train=False)
    assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))


def _fake_final_enhance_state_dict(rng, n):
    def rb(sd, base, ci, co):
        sd[f"{base}.conv1.weight"] = _t(rng, co, ci, 3, 3)
        sd[f"{base}.conv1.bias"] = _t(rng, co)
        sd[f"{base}.conv2.weight"] = _t(rng, co, co, 3, 3)
        sd[f"{base}.conv2.bias"] = _t(rng, co)
        if ci != co:
            sd[f"{base}.skip.weight"] = _t(rng, co, ci, 1, 1)
            sd[f"{base}.skip.bias"] = _t(rng, co)

    def att(sd, base, n):
        for br in ("conv_a", "conv_b"):
            for u in range(3):
                sd[f"{base}.{br}.{u}.conv.0.weight"] = _t(rng, n // 2, n, 1, 1)
                sd[f"{base}.{br}.{u}.conv.0.bias"] = _t(rng, n // 2)
                sd[f"{base}.{br}.{u}.conv.2.weight"] = _t(rng, n // 2, n // 2, 3, 3)
                sd[f"{base}.{br}.{u}.conv.2.bias"] = _t(rng, n // 2)
                sd[f"{base}.{br}.{u}.conv.4.weight"] = _t(rng, n, n // 2, 1, 1)
                sd[f"{base}.{br}.{u}.conv.4.bias"] = _t(rng, n)
        sd[f"{base}.conv_b.3.weight"] = _t(rng, n, n, 1, 1)
        sd[f"{base}.conv_b.3.bias"] = _t(rng, n)

    sd = {}
    rb(sd, "conv_a.0", 6, n)
    rb(sd, "conv_a.1", n, n)
    rb(sd, "conv_a.2", n, n)
    rb(sd, "conv_b.0", 6, n)
    rb(sd, "conv_b.1", n, n)
    rb(sd, "conv_b.2", n, n)
    sd["conv_b.3.weight"] = _t(rng, n, n, 1, 1)
    sd["conv_b.3.bias"] = _t(rng, n)
    rb(sd, "final_block.0", n, n)
    rb(sd, "final_block.1", n, n)
    att(sd, "final_block.2", n)
    rb(sd, "final_block.3", n, n)
    rb(sd, "final_block.4", n, 3)
    return sd


def test_import_final_enhance_structure_and_forward(key, rng):
    sd = load_torch_state_dict(_fake_final_enhance_state_dict(rng, C))
    imported = import_final_enhance(sd)

    model = FinalEnhanceNet(n=C)
    x = jax.random.uniform(key, (1, 16, 16, 6), jnp.float32)
    init = model.init(key, x)
    merged = {"params": merge_partial(init["params"], imported)}
    assert len(jax.tree_util.tree_leaves(imported)) == len(
        jax.tree_util.tree_leaves(init["params"])
    )
    out = model.apply(merged, x)
    assert out.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))
