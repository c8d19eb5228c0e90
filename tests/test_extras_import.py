"""Torch-checkpoint import parity for the secondary experimental models
(reference model_fc.py, model_small.py, models/analysis_small.py,
models/synthesis_small.py) — the last importer gaps. Torch twins are built
from torch primitives per the reference layer layouts, not copied code."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models.extra import (
    AnalysisSmall,
    ImageCompressorFC,
    LatentCompressor,
    SynthesisSmall,
)
from iclr_17_compression_tpu.train.torch_import import (
    import_analysis_small,
    import_fc,
    import_latent_compressor,
    import_synthesis_small,
    load_torch_state_dict,
    merge_partial,
)

from test_torch_import import _TGDN, _fake_balle17_state_dict


def _t(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def _n(y):
    return y.permute(0, 2, 3, 1).detach().numpy()


# ---------------------------------------------------------------------------
# ImageCompressor_fc (reference model_fc.py:38-86)
# ---------------------------------------------------------------------------

def test_import_fc_forward_parity(key, rng):
    n_ch, hw = 8, 64  # latent 4×4×8 → fc dim 128 (reference: 16384 at N=64/256²)
    torch.manual_seed(5)
    sd = dict(_fake_balle17_state_dict(n_ch, rng))
    gh = hw // 16
    dim = gh * gh * n_ch
    fc = nn.Linear(dim, dim)
    sd["fc.weight"] = fc.weight.detach().numpy()
    sd["fc.bias"] = fc.bias.detach().numpy()

    model = ImageCompressorFC(out_channel_n=n_ch)
    x = rng.uniform(0.0, 1.0, (1, hw, hw, 3)).astype(np.float32)
    init = model.init({"params": key, "quant": key}, jnp.asarray(x), train=False)
    imported = import_fc(load_torch_state_dict(sd), (gh, gh))
    merged = {"params": merge_partial(init["params"], imported)}
    out = model.apply(merged, jnp.asarray(x), train=False)

    # torch side: Encoder from the same fake state dict via the balle17 twin
    # pathway is exercised in test_torch_import; here we pin the fc layer's
    # permutation by checking against an explicit NCHW reference on the
    # latent produced by OUR encoder (isolates the fc mapping).
    latent = np.asarray(out["latent"])
    lat_chw = np.transpose(latent, (0, 3, 1, 2)).reshape(1, -1)  # torch flatten order
    with torch.no_grad():
        y_chw = fc(torch.from_numpy(lat_chw)).numpy()
    y_hwc_ref = y_chw.reshape(1, n_ch, gh, gh).transpose(0, 2, 3, 1)

    fc_kernel = merged["params"]["fc"]["kernel"]
    y_ours = (latent.reshape(1, -1) @ np.asarray(fc_kernel)
              + np.asarray(merged["params"]["fc"]["bias"]))
    np.testing.assert_allclose(
        y_ours.reshape(y_hwc_ref.shape), y_hwc_ref, rtol=1e-4, atol=1e-5
    )
    assert out["recon"].shape == x.shape


# ---------------------------------------------------------------------------
# ImageCompressor_small (reference model_small.py:44-87)
# ---------------------------------------------------------------------------

class _TLatentSmall(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_down_zx = nn.Sequential(
            nn.Conv2d(128, 64, 3, padding=1), nn.ReLU(),
            nn.Conv2d(64, 64, 1), nn.ReLU(),
            nn.Conv2d(64, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 32, 1), nn.ReLU(),
        )
        self.fc_combine_zx_zy = nn.Sequential(
            nn.Conv2d(256, 256, 7, padding=3),
            nn.Conv2d(256, 256, 7, padding=3),
            nn.Conv2d(256, 128, 3, padding=1),
            nn.Conv2d(128, 128, 3, padding=1),
            nn.Conv2d(128, 128, 3, padding=1),
        )

    def forward(self, z1, z2):
        z1_down = self.conv_down_zx(z1)
        recon_z = self.fc_combine_zx_zy(torch.cat((z1, z2), 1))
        return recon_z, z1_down


def test_import_latent_compressor_parity(key, rng):
    torch.manual_seed(7)
    tm = _TLatentSmall().eval()
    z1 = rng.standard_normal((1, 6, 6, 128)).astype(np.float32)
    z2 = rng.standard_normal((1, 6, 6, 128)).astype(np.float32)
    with torch.no_grad():
        ref_z, ref_down = tm(_t(z1), _t(z2))

    model = LatentCompressor()
    init = model.init(key, jnp.asarray(z1), jnp.asarray(z2))
    imported = import_latent_compressor(load_torch_state_dict(tm.state_dict()))
    merged = {"params": merge_partial(init["params"], imported)}
    out = model.apply(merged, jnp.asarray(z1), jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(out["recon_z"]), _n(ref_z), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["z1_down"]), _n(ref_down), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Analysis_small_net / Synthesis_small_net (reference models/analysis_small.py,
# models/synthesis_small.py) — shrunk widths, same layout
# ---------------------------------------------------------------------------

class _TAnalysisSmall(nn.Module):
    def __init__(self, n=12, m=16, g=16):
        super().__init__()
        self.conv1 = nn.Conv2d(1024, n, 3, padding=1)
        self.gdn1 = _TGDN(n)
        self.conv2 = nn.Conv2d(n, n, 1)
        self.gdn2 = _TGDN(n)
        self.conv3 = nn.Conv2d(n, n, 3, padding=1)
        self.gdn3 = _TGDN(n)
        self.conv4 = nn.Conv2d(n, m, 1)
        self.fc1 = nn.Sequential(nn.Linear(m * g * g, 2048), nn.ReLU())
        self.fc2 = nn.Linear(2048, 1024)

    def forward(self, x):
        x = self.gdn1(self.conv1(x))
        x = self.gdn2(self.conv2(x))
        x = self.gdn3(self.conv3(x))
        x = self.conv4(x)
        x = self.fc1(x.reshape(x.shape[0], -1))
        return self.fc2(x)


class _TSynthesisSmall(nn.Module):
    def __init__(self, n=12, m=16):
        super().__init__()
        self.fc1 = nn.Sequential(nn.Linear(1024, 2048), nn.ReLU())
        self.fc2 = nn.Sequential(nn.Linear(2048, 4096), nn.ReLU())
        self.deconv1 = nn.ConvTranspose2d(m, n, 1)
        self.igdn1 = _TGDN(n, inverse=True)
        self.deconv2 = nn.ConvTranspose2d(n, n, 3, padding=1)
        self.igdn2 = _TGDN(n, inverse=True)
        self.deconv3 = nn.ConvTranspose2d(n, n, 1)
        self.igdn3 = _TGDN(n, inverse=True)
        self.deconv4 = nn.ConvTranspose2d(n, 1024, 3, padding=1)

    def forward(self, code):
        x = self.fc2(self.fc1(code))
        x = x.reshape(x.shape[0], 16, 16, 16)  # NCHW latent view
        x = self.igdn1(self.deconv1(x))
        x = self.igdn2(self.deconv2(x))
        x = self.igdn3(self.deconv3(x))
        return self.deconv4(x)


def test_import_analysis_small_parity(key, rng):
    torch.manual_seed(9)
    n, m, g = 12, 16, 16
    tm = _TAnalysisSmall(n, m, g).eval()
    x = rng.standard_normal((1, g, g, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(_t(x)).numpy()

    model = AnalysisSmall(out_channel_n=n, out_channel_m=m)
    init = model.init(key, jnp.asarray(x))
    imported = import_analysis_small(load_torch_state_dict(tm.state_dict()))
    merged = {"params": merge_partial(init["params"], imported)}
    ours = np.asarray(model.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_import_synthesis_small_parity(key, rng):
    torch.manual_seed(11)
    n, m = 12, 16
    tm = _TSynthesisSmall(n, m).eval()
    code = rng.standard_normal((1, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = _n(tm(torch.from_numpy(code)))

    model = SynthesisSmall(out_channel_n=n, out_channel_m=m)
    init = model.init(key, jnp.asarray(code))
    imported = import_synthesis_small(load_torch_state_dict(tm.state_dict()))
    merged = {"params": merge_partial(init["params"], imported)}
    ours = np.asarray(model.apply(merged, jnp.asarray(code)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
