"""PyTorch checkpoint importer.

Maps reference PyTorch ``state_dict`` keys/layouts onto this framework's
Flax param trees so reference-trained weights run here with matching
numerics (BASELINE.json requires checkpoint-import parity; see tests).

Layout conversions:
- Conv2d weight (O, I, kh, kw)            → HWIO (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw)   → spatial flip + (kh, kw, I, O)
  (equivalent-forward-conv layout used by ops.conv.conv_transpose2d)
- GDN beta (C,), gamma (C, C)             → unchanged (reparameterized form,
  reference models/GDN.py:52-61)
- Bitparm h/b/a (1, C, 1, 1)              → (C,)

Key-name mapping per model family is table-driven below. Partial loading
(only intersecting keys) matches reference load_model (model.py:26-27).
"""

from typing import Any, Dict, Mapping

import numpy as np


def torch_conv_weight_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def torch_deconv_weight_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1))


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict[str, Any], path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_torch_state_dict(path_or_dict) -> Dict[str, np.ndarray]:
    if isinstance(path_or_dict, Mapping):
        sd = path_or_dict
    else:
        import torch

        sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
        if isinstance(sd, Mapping) and "model_state_dict" in sd:
            # rich checkpoint dict (reference train_2StepsNet.py:204-220)
            sd = sd["model_state_dict"]
    return {k: _to_np(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Ballé-17 ImageCompressor (reference model.py:38-44)
# ---------------------------------------------------------------------------

def import_balle17(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch ImageCompressor state_dict → Balle17Compressor params tree."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.startswith("Encoder.conv") and k.endswith(".weight"):
            i = k[len("Encoder.conv")]
            _set(params, f"encoder/conv{i}/weight", torch_conv_weight_to_hwio(v))
        elif k.startswith("Encoder.conv") and k.endswith(".bias"):
            i = k[len("Encoder.conv")]
            _set(params, f"encoder/conv{i}/bias", v)
        elif k.startswith("Encoder.gdn"):
            i = k[len("Encoder.gdn")]
            leaf = k.rsplit(".", 1)[1]
            _set(params, f"encoder/gdn{i}/{leaf}", v)
        elif k.startswith("Decoder.deconv") and k.endswith(".weight"):
            i = k[len("Decoder.deconv")]
            _set(params, f"decoder/deconv{i}/weight", torch_deconv_weight_to_hwio(v))
        elif k.startswith("Decoder.deconv") and k.endswith(".bias"):
            i = k[len("Decoder.deconv")]
            _set(params, f"decoder/deconv{i}/bias", v)
        elif k.startswith("Decoder.igdn"):
            i = k[len("Decoder.igdn")]
            leaf = k.rsplit(".", 1)[1]
            _set(params, f"decoder/igdn{i}/{leaf}", v)
        elif k.startswith("bitEstimator.f"):
            # bitEstimator.f1.h -> bit_estimator/f1_h, squeeze (1,C,1,1)->(C,)
            _, f, leaf = k.split(".")
            _set(params, f"bit_estimator/{f}_{leaf}", v.reshape(-1))
    return params


# ---------------------------------------------------------------------------
# Ballé-2018 scale hyperprior (reference models/analysis.py, synthesis.py,
# analysis_prior.py, synthesis_prior.py — no surviving reference trainer, so
# the module names follow the reference's own ImageCompressor convention
# extended the way liujiaheng-lineage repos name the 2018 nets:
# Encoder / Decoder / priorEncoder / priorDecoder / bitEstimator_z)
# ---------------------------------------------------------------------------

_HYPER_PREFIXES = {
    "Encoder": "g_a",
    "Decoder": "g_s",
    "priorEncoder": "h_a",
    "priorDecoder": "h_s",
}


def import_hyperprior(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch 2018-transform state_dict → models.hyperprior.ScaleHyperprior
    params tree. Layer names (conv{i}/gdn{i}/deconv{i}/igdn{i}) are identical
    on both sides; only prefixes and tensor layouts are mapped."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        mod, _, rest = k.partition(".")
        if mod == "bitEstimator_z" and rest.startswith("f"):
            f, leaf = rest.split(".")
            _set(params, f"bit_estimator_z/{f}_{leaf}", v.reshape(-1))
            continue
        ours = _HYPER_PREFIXES.get(mod)
        if ours is None:
            continue
        layer, leaf = rest.split(".", 1)
        if layer.startswith("deconv") and leaf == "weight":
            _set(params, f"{ours}/{layer}/weight", torch_deconv_weight_to_hwio(v))
        elif layer.startswith("conv") and leaf == "weight":
            _set(params, f"{ours}/{layer}/weight", torch_conv_weight_to_hwio(v))
        else:  # biases, gdn/igdn beta/gamma
            _set(params, f"{ours}/{layer}/{leaf.replace('.', '/')}", v)
    return params


# ---------------------------------------------------------------------------
# CompressAI-style sequential stacks (DSC family)
# ---------------------------------------------------------------------------

def _import_block_params(params, base_out, rest, v, kind):
    """Map one torch key inside a block to our naming."""
    # rest examples: 'conv1.weight', 'gdn.beta', 'subpel_conv.0.weight',
    # 'upsample.0.weight', 'conv_a.1.conv.2.weight', 'conv_b.3.weight'
    parts = rest.split(".")
    is_weight = parts[-1] == "weight"

    def put(sub, val, deconv=False):
        if is_weight and val.ndim == 4:
            val = (
                torch_deconv_weight_to_hwio(val)
                if deconv
                else torch_conv_weight_to_hwio(val)
            )
        _set(params, f"{base_out}/{sub}/{parts[-1]}", val)

    if kind == "att":
        # conv_a.{u}.conv.{0,2,4}.* -> a_ru{u}/conv_{in,mid,out}
        # conv_b.{u}.conv.{0,2,4}.* -> b_ru{u}/...
        # conv_b.3.*                -> b_conv
        branch = parts[0]  # conv_a | conv_b
        if branch == "conv_b" and parts[1] == "3":
            put("b_conv", v)
            return
        u = parts[1]
        conv_idx = parts[3]
        sub = {"0": "conv_in", "2": "conv_mid", "4": "conv_out"}[conv_idx]
        prefix = "a" if branch == "conv_a" else "b"
        put(f"{prefix}_ru{u}/{sub}", v)
    elif kind in ("rb", "rbs"):
        name = parts[0]  # conv1 | conv2 | gdn | skip
        if name == "gdn":
            _set(params, f"{base_out}/gdn/{parts[-1]}", v)
        else:
            put(name, v)
    elif kind == "rbu":
        name = parts[0]
        if name == "igdn":
            _set(params, f"{base_out}/igdn/{parts[-1]}", v)
        elif name in ("subpel_conv", "upsample"):
            put(f"{name}/conv", v)  # torch Sequential idx 0 = the conv
        else:  # conv
            put("conv", v)
    elif kind == "subpel":
        put("conv", v)  # torch key: '<i>.0.weight' handled by caller
    elif kind == "conv3":
        if is_weight and v.ndim == 4:
            v = torch_conv_weight_to_hwio(v)
        _set(params, f"{base_out}/{parts[-1]}", v)
    else:
        raise ValueError(kind)


def import_stack(sd: Dict[str, np.ndarray], torch_prefix: str, specs) -> Dict[str, Any]:
    """Import a torch nn.Sequential stack (e.g. 'g_a') given our spec list."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        if not k.startswith(torch_prefix + "."):
            continue
        rest = k[len(torch_prefix) + 1:]
        idx_s, sub = rest.split(".", 1)
        idx = int(idx_s)
        kind = specs[idx][0]
        base_out = f"l{idx}_{kind}"
        if kind == "subpel":
            # torch: '<i>.0.weight' (Sequential(conv, PixelShuffle))
            sub = sub.split(".", 1)[1]  # drop the inner '0.'
            _import_block_params(params, base_out, sub, v, "conv3")
            # place under .../conv
            leaf = sub.split(".")[-1]
            val = params[base_out].pop(leaf)
            params[base_out].setdefault("conv", {})[leaf] = val
        elif kind == "conv3":
            _import_block_params(params, base_out, sub, v, "conv3")
        else:
            _import_block_params(params, base_out, sub, v, kind)
    return params


def import_dsc(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """torch Cheng2020Attention* state_dict → DSCStereoModel params tree."""
    params: Dict[str, Any] = {}
    params["g_a"] = import_stack(sd, "g_a", config.ga)
    if not config.shared_encoder:
        for pfx in ("g_a_Y", "g_a_SI"):
            if any(k.startswith(pfx + ".") for k in sd):
                params["g_a_y"] = import_stack(sd, pfx, config.ga)
    params["g_s"] = import_stack(sd, "g_s", config.gs)
    params["g_a22"] = import_stack(sd, "g_a22", config.ga22)
    params["g_s22"] = import_stack(sd, "g_s22", config.gs22)
    params["g_z1hat_z2"] = import_stack(sd, "g_z1hat_z2", config.gz)
    if config.recon_residual and any(k.startswith("g_rec1_im2_new.") for k in sd):
        from ..models.dsc import _GREC_SPECS

        params["g_rec1_im2_new"] = import_stack(sd, "g_rec1_im2_new", _GREC_SPECS)
    return params


# ---------------------------------------------------------------------------
# Joint-autoregressive hierarchical prior (Cheng2020Anchor;
# reference models/temp.py:45-112, CompressAI layout)
# ---------------------------------------------------------------------------

# torch Sequential index → (our submodule name, block kind)
_JOINT_GA = {
    "0": ("rbs0", "rbs"), "1": ("rb1", "rb"), "2": ("rbs2", "rbs"),
    "3": ("rb3", "rb"), "4": ("rbs4", "rbs"), "5": ("rb5", "rb"),
    "6": ("conv6", "conv3"),
}
_JOINT_HA = {str(i): (f"conv{i // 2}", "conv3") for i in (0, 2, 4, 6, 8)}
_JOINT_HS = {
    "0": ("conv0", "conv3"), "2": ("subpel1", "subpel"),
    "4": ("conv2", "conv3"), "6": ("subpel3", "subpel"),
    "8": ("conv4", "conv3"),
}
_JOINT_GS = {
    "0": ("rb0", "rb"), "1": ("rbu1", "rbu"), "2": ("rb2", "rb"),
    "3": ("rbu3", "rbu"), "4": ("rb4", "rb"), "5": ("rbu5", "rbu"),
    "6": ("rb6", "rb"), "7": ("subpel7", "subpel"),
}
_JOINT_EP = {str(i): (f"conv{i // 2}", "conv3") for i in (0, 2, 4)}


def _import_named_stack(sd, torch_prefix: str, table) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        if not k.startswith(torch_prefix + "."):
            continue
        rest = k[len(torch_prefix) + 1:]
        idx_s, sub = rest.split(".", 1)
        if idx_s not in table:
            continue
        name, kind = table[idx_s]
        if kind == "subpel":
            sub = sub.split(".", 1)[1]  # Sequential(conv, PixelShuffle): drop '0.'
            _import_block_params(params, name, sub, v, "conv3")
            leaf = sub.split(".")[-1]
            params[name].setdefault("conv", {})[leaf] = params[name].pop(leaf)
        else:
            _import_block_params(params, name, sub, v, kind)
    return params


def import_joint(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """CompressAI Cheng2020Anchor/JointAutoregressiveHierarchicalPriors
    state_dict → models.cheng2020.JointAutoregressive params tree.

    ``entropy_bottleneck.*`` (CompressAI's matrix/bias/factor factorized
    prior) and ``gaussian_conditional.*`` (scale-table buffers) have no
    parameter-level equivalent here — our z prior is the reference's own
    Bitparm stack (models/bitEstimator.py) — so those keys are skipped;
    use merge_partial over an init tree and fine-tune the z prior briefly.
    """
    params: Dict[str, Any] = {
        "g_a": _import_named_stack(sd, "g_a", _JOINT_GA),
        "h_a": _import_named_stack(sd, "h_a", _JOINT_HA),
        "h_s": _import_named_stack(sd, "h_s", _JOINT_HS),
        "g_s": _import_named_stack(sd, "g_s", _JOINT_GS),
        "entropy_parameters": _import_named_stack(sd, "entropy_parameters", _JOINT_EP),
    }
    ctx = {}
    for leaf in ("weight", "bias"):
        k = f"context_prediction.{leaf}"
        if k in sd:
            v = sd[k]
            ctx[leaf] = torch_conv_weight_to_hwio(v) if v.ndim == 4 else v
    if ctx:
        params["context_prediction"] = ctx
    return params


# ---------------------------------------------------------------------------
# PASSRnet (reference models/PASSRnet.py:7-58) — the last families without a
# key map. No reference checkpoints survive; maps follow the reference's own
# module attribute names.
# ---------------------------------------------------------------------------

_PASSR_FEAT_IDX = {"2": "resb1", "3": "aspp1", "4": "resb2", "5": "aspp2", "6": "resb3"}
_PASSR_UP_IDX = {"4": "up_conv1", "6": "up_conv2", "7": "up_conv3"}


def _put_conv(params, path, v):
    _set(params, path, torch_conv_weight_to_hwio(v) if v.ndim == 4 else v)


def _import_resb(params, base, rest, v):
    """torch ResB: body.0 → conv1, body.2 → conv2 (PASSRnet.py:63-69)."""
    parts = rest.split(".")
    name = {"0": "conv1", "2": "conv2"}[parts[1]]
    _put_conv(params, f"{base}/{name}/{parts[-1]}", v)


def import_passr(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch PASSRnet state_dict → models.passr.PASSRnet params tree."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        mod, _, rest = k.partition(".")
        if mod in ("init_feature_left", "init_feature_right"):
            idx, _, sub = rest.partition(".")
            if idx == "0":
                _put_conv(params, f"{mod}_conv0/weight", v)
            elif _PASSR_FEAT_IDX[idx].startswith("resb"):
                _import_resb(params, f"{mod}_{_PASSR_FEAT_IDX[idx]}", sub, v)
            else:  # ResASPPB: conv{j}_{i}.0.weight / b_{i}.weight — names match
                _put_conv(
                    params,
                    f"{mod}_{_PASSR_FEAT_IDX[idx]}/{sub.split('.')[0]}/{sub.split('.')[-1]}",
                    v,
                )
        elif mod == "pam":
            if rest.startswith("rb."):
                _import_resb(params, "pam/rb", rest[3:], v)
            else:
                layer, leaf = rest.split(".")
                _put_conv(params, f"pam/{layer}/{leaf}", v)
        elif mod == "upscale":
            idx, _, sub = rest.partition(".")
            if idx in ("0", "1", "2", "3"):
                _import_resb(params, f"up_resb{idx}", sub, v)
            else:
                _put_conv(params, f"{_PASSR_UP_IDX[idx]}/{sub}", v)
    return params


# ---------------------------------------------------------------------------
# FIF / finalEnhanceNet (reference fast_image_filters/)
# ---------------------------------------------------------------------------

# reference FIF_net.py names its 5 active ConvBlocks conv1..conv4, conv8
_FIF_CONV_MAP = {"conv1": "conv1", "conv2": "conv2", "conv3": "conv3",
                 "conv4": "conv4", "conv8": "conv5"}


def import_fif(sd: Dict[str, np.ndarray], torch_prefix: str = ""):
    """torch FIF trunk → (params, batch_stats) for models.enhance.FIF.

    ConvBlock = Sequential(conv, LeakyReLU, AdaptiveBatchNorm)
    (reference basic_blocks.py:27-59); BN running stats land in flax's
    ``batch_stats`` collection, returned separately."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    pre = torch_prefix + "." if torch_prefix else ""
    for k, v in sd.items():
        if pre and not k.startswith(pre):
            continue
        rest = k[len(pre):]
        top, _, tail = rest.partition(".")
        ours = _FIF_CONV_MAP.get(top)
        if ours is None or not tail.startswith("convblk."):
            continue
        sub = tail[len("convblk."):]
        if sub == "0.weight":
            _set(params, f"{ours}/weight", torch_conv_weight_to_hwio(v))
        elif sub == "0.bias":
            _set(params, f"{ours}/bias", v)
        elif sub == "2.a":
            _set(params, f"{ours}/abn/a", v.reshape(()))
        elif sub == "2.b":
            _set(params, f"{ours}/abn/b", v.reshape(()))
        elif sub == "2.bn.weight":
            _set(params, f"{ours}/abn/bn/scale", v)
        elif sub == "2.bn.bias":
            _set(params, f"{ours}/abn/bn/bias", v)
        elif sub == "2.bn.running_mean":
            _set(stats, f"{ours}/abn/bn/mean", v)
        elif sub == "2.bn.running_var":
            _set(stats, f"{ours}/abn/bn/var", v)
    return params, stats


_FINAL_BLOCK_IDX = {"0": "final_rb0", "1": "final_rb1", "3": "final_rb2", "4": "final_rb3"}


def import_final_enhance(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch finalEnhanceNet → models.enhance.FinalEnhanceNet params tree
    (reference final_enhance_net.py:32-64: two gated ResidualBlock branches
    + attention tail)."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        mod, _, rest = k.partition(".")
        idx, _, sub = rest.partition(".")
        if mod == "conv_a":
            _import_block_params(params, f"conv_a_rb{idx}", sub, v, "rb")
        elif mod == "conv_b":
            if idx == "3":  # bare 1×1 conv after the blocks
                _put_conv(params, f"conv_b_conv/{sub}", v)
            else:
                _import_block_params(params, f"conv_b_rb{idx}", sub, v, "rb")
        elif mod == "final_block":
            if idx == "2":
                _import_block_params(params, "final_att", sub, v, "att")
            else:
                _import_block_params(params, _FINAL_BLOCK_IDX[idx], sub, v, "rb")
    return params


def _fc_perm(h: int, w: int, c: int) -> np.ndarray:
    """Flat-index map between torch's NCHW latent flatten (c,h,w order) and
    this framework's NHWC flatten (h,w,c order): position j of the hwc-flat
    vector holds chw-flat element perm[j]."""
    return np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).ravel()


def _import_linear(params, path, w, b, in_perm=None, out_perm=None):
    """torch Linear (out,in) weight → flax Dense (in,out) kernel, with
    optional flatten-order permutations on either side (y' = Pᵀ(W·Px + b))."""
    w = np.asarray(w)
    if out_perm is not None:
        w = w[out_perm]
    if in_perm is not None:
        w = w[:, in_perm]
    _set(params, f"{path}/kernel", np.ascontiguousarray(w.T))
    if b is not None:
        b = np.asarray(b)
        if out_perm is not None:
            b = b[out_perm]
        _set(params, f"{path}/bias", b)


def import_fc(sd: Dict[str, np.ndarray], latent_hw) -> Dict[str, Any]:
    """torch ImageCompressor_fc → models.extra.ImageCompressorFC params.

    Encoder/Decoder/bitEstimator reuse the Ballé-17 map (reference
    model_fc.py:41-43); ``fc`` (Linear over the NCHW-flattened latent,
    model_fc.py:45,60-62) needs the chw↔hwc flatten permutation on both
    sides, derived from ``latent_hw`` = (h, w) of the latent grid (input
    H/16, W/16) and the conv3 output channels."""
    params = import_balle17(sd)
    if "fc.weight" in sd:
        h, w = latent_hw
        c = sd["fc.weight"].shape[1] // (h * w)
        perm = _fc_perm(h, w, c)
        _import_linear(params, "fc", sd["fc.weight"], sd.get("fc.bias"),
                       in_perm=perm, out_perm=perm)
    return params


def import_latent_compressor(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch ImageCompressor_small → models.extra.LatentCompressor params
    (reference model_small.py:54-65: conv_down_zx Sequential indices
    0/2/4/6 interleaved with ReLU; fc_combine_zx_zy indices 0..4)."""
    params: Dict[str, Any] = {}
    down = {"0": "down1", "2": "down2", "4": "down3", "6": "down4"}
    comb = {str(i): f"comb{i + 1}" for i in range(5)}
    for k, v in sd.items():
        mod, _, rest = k.partition(".")
        idx, _, leaf = rest.partition(".")
        if mod == "conv_down_zx" and idx in down:
            _put_conv(params, f"{down[idx]}/{leaf}", v)
        elif mod == "fc_combine_zx_zy" and idx in comb:
            _put_conv(params, f"{comb[idx]}/{leaf}", v)
    return params


def import_analysis_small(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """torch Analysis_small_net → models.extra.AnalysisSmall params
    (reference models/analysis_small.py:19-35: conv1..4 + gdn1..3 + FC head
    over the NCHW-flattened conv4 output — 4096 = M×16×16)."""
    params: Dict[str, Any] = {}
    m = sd[prefix + "conv4.weight"].shape[0]
    g = int(round((sd[prefix + "fc1.0.weight"].shape[1] / m) ** 0.5))
    perm = _fc_perm(g, g, m)
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        if k.startswith("conv"):
            _put_conv(params, f"{k[:5]}/{k.rsplit('.', 1)[1]}", v)
        elif k.startswith("gdn"):
            _set(params, f"{k[:4]}/{k.rsplit('.', 1)[1]}", v)
    _import_linear(params, "fc1", sd[prefix + "fc1.0.weight"],
                   sd.get(prefix + "fc1.0.bias"), in_perm=perm)
    _import_linear(params, "fc2", sd[prefix + "fc2.weight"],
                   sd.get(prefix + "fc2.bias"))
    return params


def import_synthesis_small(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """torch Synthesis_small_net → models.extra.SynthesisSmall params
    (reference models/synthesis_small.py:15-29; fc2's 4096-dim output is
    viewed as an NCHW (16,16,16) latent, so its rows get the chw→hwc
    permutation before the deconv stack)."""
    params: Dict[str, Any] = {}
    perm = _fc_perm(16, 16, 16)
    _import_linear(params, "fc1", sd[prefix + "fc1.0.weight"],
                   sd.get(prefix + "fc1.0.bias"))
    _import_linear(params, "fc2", sd[prefix + "fc2.0.weight"],
                   sd.get(prefix + "fc2.0.bias"), out_perm=perm)
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        if k.startswith("deconv"):
            name, leaf = k.split(".", 1)
            if leaf == "weight":
                _set(params, f"{name}/weight", torch_deconv_weight_to_hwio(v))
            else:
                _set(params, f"{name}/bias", v)
        elif k.startswith("igdn"):
            _set(params, f"{k.split('.')[0]}/{k.rsplit('.', 1)[1]}", v)
    return params


def import_patch_attention(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch BottleneckAttention_modified → models.attention.PatchMatchAttention.

    Mapping (reference models/bottleneck_Att.py:133-135):
      q_patches.0.{weight,bias}  (Sequential[Conv2d, ReLU])  → q_patches/{weight,bias}
      k_patches.0.{weight,bias}                              → k_patches/{weight,bias}
      scale_att  (scalar)                                    → scale_att

    This is the map for the ONE real checkpoint the reference ships
    (``model_weights.pth`` at the repo root: q/k patch convs with
    dim=3, dim_head=10, trained by train_Att_EXP.py on raw images; it
    predates the ``scale_att`` parameter, which merge_partial leaves at the
    init value 1.0)."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        mod, _, rest = k.partition(".")
        if mod in ("q_patches", "k_patches"):
            # strip the Sequential index ('0.weight' → 'weight')
            leaf = rest.split(".")[-1]
            if leaf == "weight":
                _set(params, f"{mod}/weight", torch_conv_weight_to_hwio(v))
            else:
                _set(params, f"{mod}/bias", v)
        elif mod == "scale_att":
            _set(params, "scale_att", np.asarray(v).reshape(()))
    return params


def merge_partial(init_params: Dict[str, Any], imported: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay imported leaves onto an init tree (partial-load semantics of
    reference model.py:26-27); shapes must match where keys intersect."""
    import copy

    out = copy.deepcopy(init_params)

    def rec(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                rec(dst.setdefault(k, {}), v, path + "/" + k)
            else:
                if k in dst and hasattr(dst[k], "shape"):
                    if tuple(dst[k].shape) != tuple(v.shape):
                        raise ValueError(
                            f"shape mismatch at {path}/{k}: "
                            f"{dst[k].shape} vs {v.shape}"
                        )
                dst[k] = v

    rec(out, imported)
    return out
