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
