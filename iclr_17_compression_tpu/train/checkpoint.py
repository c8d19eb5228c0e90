"""Checkpoint save/restore.

Reference parity targets (SURVEY.md §5): (a) bare params snapshots
``iter_N.ckpt`` with partial-key load (reference model.py:18-35), and (b)
rich checkpoints carrying optimizer state, step, epoch, loss and data-iter
seed (reference train_2StepsNet.py:204-220), plus best-train/best-val files.

Format: flax.serialization msgpack for the pytree + JSON sidecar for
metadata. No external deps; works from any host.
"""

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    """Device→host fetch with PIPELINED transfers.

    ``serialization.to_bytes`` on a device pytree converts leaf-by-leaf;
    through the remote device tunnel that is one blocking round trip per
    leaf (~600 leaves × ~23 ms RTT ≈ 14 s per DSC TrainState — measured as
    ~20 s/checkpoint in round 4). Kicking off every leaf's async copy first
    overlaps the RTTs; the subsequent np.asarray calls then hit local
    buffers."""
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, "copy_to_host_async"):
            try:
                x.copy_to_host_async()
            except Exception:  # non-device leaf / backend without async copy
                pass
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, tree
    )


def _atomic_write(path: str, data: bytes):
    """tmp + rename so concurrent readers (eval tools snapshotting
    ``latest.ckpt`` mid-training) never see a truncated msgpack."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_params(params, directory: str, step: int, prefix: str = "iter") -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{prefix}_{step}.ckpt")
    _atomic_write(path, serialization.to_bytes(_to_host(params)))
    return path


def load_params(template, path: str):
    """Restore ``template`` (a ``model.init`` variables dict) from any
    msgpack layout the framework writes: an exact variables dict, a rich
    TrainState dict (extra keys like opt_state ignored), or a **bare params
    subtree** — the layout of the committed ``results/ckpts/*_params.msgpack``
    archives (tools/export_params.py), which outlive the gitignored run
    dirs and must stay loadable by every CLI."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tmpl_state = serialization.to_state_dict(template)
    if isinstance(raw, dict) and isinstance(tmpl_state, dict):
        if "params" in tmpl_state and "params" not in raw:
            raw = {"params": raw}
        raw = {k: v for k, v in raw.items() if k in tmpl_state}
    return serialization.from_state_dict(template, raw)


def load_params_partial(template, path: str):
    """Load only the intersecting keys (with matching shapes) of a native
    checkpoint over ``template`` — the reference's partial state_dict load
    (reference model.py:26-27 filters the loaded dict to intersecting keys).
    Needed for decoder-only / stage-2 finetunes from full-model checkpoints.
    """
    from flax import traverse_util

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tmpl_state = serialization.to_state_dict(template)
    flat_t = traverse_util.flatten_dict(tmpl_state)
    flat_r = traverse_util.flatten_dict(raw)
    merged = {}
    for k, v in flat_t.items():
        r = flat_r.get(k)
        if r is not None and getattr(r, "shape", None) == getattr(v, "shape", None):
            merged[k] = r
        else:
            merged[k] = v
    return serialization.from_state_dict(
        template, traverse_util.unflatten_dict(merged)
    )


def save_train_state(
    state,
    directory: str,
    name: str,
    epoch: int = 0,
    loss: float = 0.0,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Rich checkpoint: full TrainState + metadata sidecar."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.ckpt")
    _atomic_write(path, serialization.to_bytes(_to_host(state)))
    meta = {"epoch": epoch, "loss": loss, "step": int(state.step)}
    if extra:
        meta.update(extra)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return path


def load_train_state(state_template, path: str) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def step_from_filename(path: str) -> int:
    """Parse global step from 'iter_<N>.ckpt' (the reference had this but
    disabled it, model.py:30-35)."""
    m = re.search(r"iter_(\d+)\.ckpt$", path)
    return int(m.group(1)) if m else 0


def latest_checkpoint(directory: str, prefix: str = "iter") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for f in os.listdir(directory):
        m = re.match(rf"{prefix}_(\d+)\.ckpt$", f)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, f), int(m.group(1))
    return best


def resolve_resume(path: str) -> Optional[str]:
    """Resolve a ``--resume`` argument: an explicit .ckpt file, or a run
    directory — in which case prefer ``latest.ckpt``, then the highest
    ``epoch_N.ckpt``, then ``best_train.ckpt``."""
    if os.path.isfile(path):
        return path
    if not os.path.isdir(path):
        return None
    latest = os.path.join(path, "latest.ckpt")
    if os.path.exists(latest):
        return latest
    best, best_epoch = None, -1
    for f in os.listdir(path):
        m = re.match(r"epoch_(\d+)\.ckpt$", f)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = os.path.join(path, f), int(m.group(1))
    if best:
        return best
    bt = os.path.join(path, "best_train.ckpt")
    return bt if os.path.exists(bt) else None
