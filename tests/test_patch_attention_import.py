"""PatchMatchAttention torch-checkpoint import parity.

Covers the ONE real checkpoint the reference ships: ``model_weights.pth``
(repo root, 21 KB) is a ``BottleneckAttention_modified`` state dict with
q_patches/k_patches conv weights at dim=3, dim_head=10 (reference
models/bottleneck_Att.py:133-135, trained by train_Att_EXP.py on raw
images). The torch twin here is built from torch primitives following the
reference forward semantics (bottleneck_Att.py:171-265), not copied code.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models.attention import PatchMatchAttention
from iclr_17_compression_tpu.train.torch_import import (
    import_patch_attention,
    load_torch_state_dict,
    merge_partial,
)

REAL_CKPT = "/root/reference/model_weights.pth"


class _TPatchAtt(nn.Module):
    """Torch twin of BottleneckAttention_modified's live forward path:
    q tokens = Conv(9,s9)+ReLU positions, k tokens = Conv(9,s3)+ReLU
    positions, v = raw 9x9 s3 image patches (channel-major flatten),
    att = softmax(-cdist(q,k) * scale_att), refold on the q grid."""

    def __init__(self, dim, dim_head, scale_att=1.0):
        super().__init__()
        self.dim_head = dim_head
        self.q_patches = nn.Sequential(nn.Conv2d(dim, dim_head, 9, stride=9), nn.ReLU())
        self.k_patches = nn.Sequential(nn.Conv2d(dim, dim_head, 9, stride=3), nn.ReLU())
        self.scale_att = nn.Parameter(torch.tensor(float(scale_att)))

    def forward(self, q_img, kv_img):
        q = self.q_patches(q_img)
        k = self.k_patches(kv_img)
        n, d, hq, wq = q.shape
        qf = q.permute(0, 2, 3, 1).reshape(hq * wq, d)
        kf = k.permute(0, 2, 3, 1).reshape(-1, d)
        v = kv_img.unfold(2, 9, 3).unfold(3, 9, 3)  # (1, C, nh, nw, 9, 9)
        c = v.shape[1]
        vf = v.permute(0, 2, 3, 1, 4, 5).reshape(-1, c * 81)
        att = torch.softmax(-torch.cdist(qf, kf, p=2.0) * self.scale_att, dim=-1)
        out = att @ vf  # (hq*wq, C*81)
        out = out.view(1, hq, wq, c, 9, 9).permute(0, 3, 1, 4, 2, 5)
        return out.reshape(1, c, hq * 9, wq * 9)


def _forward_ours(sd, q_np, k_np, dim, dim_head):
    model = PatchMatchAttention(dim=dim, dim_head=dim_head)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(q_np), jnp.asarray(k_np))
    imported = import_patch_attention(load_torch_state_dict(sd))
    merged = {"params": merge_partial(init["params"], imported)}
    return np.asarray(model.apply(merged, jnp.asarray(q_np), jnp.asarray(k_np)))


def test_patch_attention_import_parity(rng):
    torch.manual_seed(3)
    tm = _TPatchAtt(dim=3, dim_head=10, scale_att=1.7).eval()
    q = rng.uniform(0.0, 1.0, (1, 36, 45, 3)).astype(np.float32)
    k = rng.uniform(0.0, 1.0, (1, 36, 45, 3)).astype(np.float32)

    with torch.no_grad():
        ref = (
            tm(
                torch.from_numpy(q).permute(0, 3, 1, 2),
                torch.from_numpy(k).permute(0, 3, 1, 2),
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
    ours = _forward_ours(tm.state_dict(), q, k, dim=3, dim_head=10)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(REAL_CKPT), reason="reference tree absent")
def test_real_model_weights_pth_loads_and_attends(rng):
    """Decode the reference's shipped checkpoint and run it: the imported
    q/k conv weights must drive the attention to the same output as the
    torch twin carrying the identical weights. The file predates the
    scale_att parameter, so both sides run it at the init value 1.0."""
    sd = load_torch_state_dict(REAL_CKPT)
    assert {"q_patches.0.weight", "q_patches.0.bias",
            "k_patches.0.weight", "k_patches.0.bias"} <= set(sd)
    assert sd["q_patches.0.weight"].shape == (10, 3, 9, 9)

    imported = import_patch_attention(sd)
    assert imported["q_patches"]["weight"].shape == (9, 9, 3, 10)
    assert "scale_att" not in imported  # absent in the real file

    tm = _TPatchAtt(dim=3, dim_head=10, scale_att=1.0)
    tm.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    tm.eval()

    q = rng.uniform(0.0, 1.0, (1, 45, 36, 3)).astype(np.float32)
    k = rng.uniform(0.0, 1.0, (1, 45, 36, 3)).astype(np.float32)
    with torch.no_grad():
        ref = (
            tm(
                torch.from_numpy(q).permute(0, 3, 1, 2),
                torch.from_numpy(k).permute(0, 3, 1, 2),
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
    ours = _forward_ours(sd, q, k, dim=3, dim_head=10)
    # fp32 noise floor, not an import defect: with the real (ReLU, near-
    # parallel) features, torch.cdist itself deviates 2.3e-3 from a float64
    # ground truth on these inputs; ours sits at the same floor via the
    # matmul expansion. Weight mapping correctness is pinned tightly by
    # test_patch_attention_import_parity above.
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-2)
    # the attention output is a convex combination of SI patches → in [0,1]
    assert float(ours.min()) >= -1e-5 and float(ours.max()) <= 1.0 + 1e-5
