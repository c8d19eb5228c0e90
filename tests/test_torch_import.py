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


# ---------------------------------------------------------------------------
# Joint-autoregressive (Cheng2020Anchor) import parity.
# Torch side is built here from torch primitives with the CompressAI key
# layout the reference uses (reference models/temp.py:45-112); forward math
# mirrors our modules so outputs must match bit-for-bit up to float error.
# ---------------------------------------------------------------------------

_PED = 2.0 ** -36
_BETA_BOUND = (1e-6 + _PED) ** 0.5
_GAMMA_BOUND = 2.0 ** -18


class _TGDN(nn.Module):
    def __init__(self, ch, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(torch.sqrt(torch.ones(ch) + _PED))
        self.gamma = nn.Parameter(torch.sqrt(0.1 * torch.eye(ch) + _PED))

    def forward(self, x):
        c = x.shape[1]
        beta = torch.clamp(self.beta, min=_BETA_BOUND) ** 2 - _PED
        gamma = torch.clamp(self.gamma, min=_GAMMA_BOUND) ** 2 - _PED
        norm = torch.nn.functional.conv2d(x * x, gamma.view(c, c, 1, 1), beta)
        norm = torch.sqrt(norm)
        return x * norm if self.inverse else x / norm


def _lrelu(x):
    return torch.nn.functional.leaky_relu(x, 0.01)


class _TRB(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        out = _lrelu(self.conv1(x))
        out = _lrelu(self.conv2(out))
        return out + x


class _TRBS(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, c, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)
        self.gdn = _TGDN(c)
        self.skip = nn.Conv2d(cin, c, 1, stride=2)

    def forward(self, x):
        out = _lrelu(self.conv1(x))
        out = self.gdn(self.conv2(out))
        return out + self.skip(x)


def _tsubpel(cin, cout, r):
    return nn.Sequential(nn.Conv2d(cin, cout * r * r, 3, padding=1), nn.PixelShuffle(r))


class _TRBU(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.subpel_conv = _tsubpel(c, c, 2)
        self.conv = nn.Conv2d(c, c, 3, padding=1)
        self.igdn = _TGDN(c, inverse=True)
        self.upsample = _tsubpel(c, c, 2)

    def forward(self, x):
        out = _lrelu(self.subpel_conv(x))
        out = self.igdn(self.conv(out))
        return out + self.upsample(x)


class _TMaskedConvA(nn.Conv2d):
    def forward(self, x):
        kh, kw = self.kernel_size
        mask = torch.ones(1, 1, kh, kw)
        mask[:, :, kh // 2, kw // 2:] = 0.0
        mask[:, :, kh // 2 + 1:] = 0.0
        return torch.nn.functional.conv2d(
            x, self.weight * mask, self.bias, padding=self.padding
        )


class _TJoint(nn.Module):
    """Tiny torch twin of models/cheng2020.JointAutoregressive with
    CompressAI state_dict keys (reference models/temp.py:45-112)."""

    def __init__(self, n):
        super().__init__()
        self.g_a = nn.Sequential(
            _TRBS(3, n), _TRB(n), _TRBS(n, n), _TRB(n), _TRBS(n, n), _TRB(n),
            nn.Conv2d(n, n, 3, stride=2, padding=1),
        )
        lr = nn.LeakyReLU(0.01)
        self.h_a = nn.Sequential(
            nn.Conv2d(n, n, 3, padding=1), lr,
            nn.Conv2d(n, n, 3, padding=1), lr,
            nn.Conv2d(n, n, 3, stride=2, padding=1), lr,
            nn.Conv2d(n, n, 3, padding=1), lr,
            nn.Conv2d(n, n, 3, stride=2, padding=1),
        )
        m32 = n * 3 // 2
        self.h_s = nn.Sequential(
            nn.Conv2d(n, n, 3, padding=1), lr,
            _tsubpel(n, n, 2), lr,
            nn.Conv2d(n, m32, 3, padding=1), lr,
            _tsubpel(m32, m32, 2), lr,
            nn.Conv2d(m32, n * 2, 3, padding=1),
        )
        self.g_s = nn.Sequential(
            _TRB(n), _TRBU(n), _TRB(n), _TRBU(n), _TRB(n), _TRBU(n), _TRB(n),
            _tsubpel(n, 3, 2),
        )
        self.context_prediction = _TMaskedConvA(n, 2 * n, 5, padding=2)
        self.entropy_parameters = nn.Sequential(
            nn.Conv2d(n * 4, n * 10 // 3, 1), lr,
            nn.Conv2d(n * 10 // 3, n * 8 // 3, 1), lr,
            nn.Conv2d(n * 8 // 3, n * 2, 1),
        )

    def forward(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat = torch.round(z)
        hyper = self.h_s(z_hat)
        y_hat = torch.round(y)
        ctx = self.context_prediction(y_hat)
        gp = self.entropy_parameters(torch.cat([hyper, ctx], dim=1))
        sigma, mu = gp.chunk(2, dim=1)
        return self.g_s(y_hat), sigma, mu


def test_import_joint_forward_parity(key, rng):
    from iclr_17_compression_tpu.models.cheng2020 import JointAutoregressive
    from iclr_17_compression_tpu.train.torch_import import import_joint
    import jax

    n = 8
    torch.manual_seed(0)
    tm = _TJoint(n).eval()
    x = rng.uniform(0.0, 1.0, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_recon, t_sigma, t_mu = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    t_recon = t_recon.permute(0, 2, 3, 1).numpy()
    t_sigma = np.maximum(np.abs(t_sigma.permute(0, 2, 3, 1).numpy()), 0.11)
    t_mu = t_mu.permute(0, 2, 3, 1).numpy()

    imported = import_joint(load_torch_state_dict(tm.state_dict()))
    model = JointAutoregressive(n=n)
    init = model.init({"params": key, "quant": key}, jnp.asarray(x), train=False)
    # everything except the z prior (bit_estimator_z) must be covered
    covered = set(init["params"]) - {"bit_estimator_z"}
    assert set(imported) == covered
    merged = {"params": merge_partial(init["params"], imported)}
    assert len(jax.tree_util.tree_leaves(merged)) == len(
        jax.tree_util.tree_leaves(init)
    )

    out = model.apply(merged, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(out["recon"]), np.clip(t_recon, 0.0, 1.0), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out["sigma"]), t_sigma, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mu"]), t_mu, rtol=1e-4, atol=1e-4)


class _TRU(nn.Module):
    """CompressAI ResidualUnit (reference models/layers_GELU.py:180-201)."""

    def __init__(self, c, k=3):
        super().__init__()
        half = c // 2
        self.conv = nn.Sequential(
            nn.Conv2d(c, half, 1), nn.ReLU(),
            nn.Conv2d(half, half, k, padding=k // 2), nn.ReLU(),
            nn.Conv2d(half, c, 1),
        )

    def forward(self, x):
        return torch.relu(self.conv(x) + x)


class _TAtt(nn.Module):
    """Cheng-2020 attention block (reference models/layers_GELU.py:176-224)."""

    def __init__(self, c):
        super().__init__()
        self.conv_a = nn.Sequential(_TRU(c), _TRU(c), _TRU(c))
        self.conv_b = nn.Sequential(_TRU(c), _TRU(c), _TRU(c), nn.Conv2d(c, c, 1))

    def forward(self, x):
        return x + self.conv_a(x) * torch.sigmoid(self.conv_b(x))


def test_import_dsc_stack_with_attention_parity(key, rng):
    """import_stack parity on a mini DSC-style stack exercising every block
    kind the DSC presets use, incl. the attention ('att') import path."""
    from iclr_17_compression_tpu.models.dsc import _Stack
    from iclr_17_compression_tpu.train.torch_import import import_stack
    import jax

    c = 8
    torch.manual_seed(1)
    tm = nn.Sequential(
        _TRB(3),
        _TRBS(3, c),
        _TAtt(c),
        nn.Conv2d(c, c, 3, stride=2, padding=1),
    ).eval()
    sd = {f"g_a.{k}": v for k, v in tm.state_dict().items()}

    specs = (("rb", 3), ("rbs", c, 2), ("att", c), ("conv3", c, 2))
    stack = _Stack(specs)
    x = rng.uniform(0.0, 1.0, (1, 32, 32, 3)).astype(np.float32)
    init = stack.init(key, jnp.asarray(x))

    imported = import_stack(load_torch_state_dict(sd), "g_a", specs)
    merged = {"params": merge_partial(init["params"], imported)}
    assert len(jax.tree_util.tree_leaves(merged)) == len(
        jax.tree_util.tree_leaves(init)
    )

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(stack.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


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
