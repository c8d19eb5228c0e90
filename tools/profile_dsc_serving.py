"""Prefix-ablation profile of the DSC serving paths (round-3 verdict #3).

Times the REAL encode/decode graphs at each stage prefix (same discipline as
tools/profile_prefix.py — consecutive jitted-prefix differences cancel the
dispatch tax) so the marginal in-graph cost of every _Stack layer is
measured where XLA actually schedules it. Suspect list from the verdict:
AttentionBlock branches, the 8-channel code convs (off the 128-lane grid),
and the cat-256 fusion stage.

Usage: [ICLR17C_DSC_BATCH=16] python tools/profile_dsc_serving.py
Writes /tmp/dsc_profile.json and prints a per-stage table.
"""

import json
import os
import sys
import time

os.environ.setdefault("ICLR17C_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models import DSC_PRESETS, DSCStereoModel
from iclr_17_compression_tpu.models.dsc import _Stack
from iclr_17_compression_tpu.ops.precision import cast_storage
from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

H, W = 320, 1216
BATCH = int(os.environ.get("ICLR17C_DSC_BATCH", "16"))
ITERS = 4


def measure(fn, inputs, rounds=3):
    for _ in range(2):
        t = float(sum(fn(x) for x in inputs))
        assert t == t
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        t = float(sum(fn(x) for x in inputs))
        best = min(best, time.perf_counter() - t0)
        assert t == t
    return best


def distinct(x, iters):
    xs = [x + 0.001 * i for i in range(iters)]
    for v in xs:
        float(jnp.sum(v[:1, :1, :1].astype(jnp.float32)))
    return xs


def stack_prefix_apply(specs, params, x, k):
    """Apply the first k layers of a _Stack (layer names are index-based, so
    the prefix sub-dict of params addresses them exactly)."""
    sub_specs = tuple(specs[:k])
    names = [f"l{i}_{s[0]}" for i, s in enumerate(sub_specs)]
    sub_params = {n: params[n] for n in names}
    return _Stack(sub_specs).apply({"params": sub_params}, x)


def profile_stack(tag, specs, params, x):
    """Marginal ms per layer of one stack at input x.

    ICLR17C_DSC_STAGES=coarse → one timing per stack (5 remote compiles
    total instead of ~40; each tunnel compile is 30-90 s). Fine-grained
    per-layer rows for a single module via ICLR17C_DSC_FINE=<tag>."""
    coarse = os.environ.get("ICLR17C_DSC_STAGES", "fine") == "coarse"
    fine_only = os.environ.get("ICLR17C_DSC_FINE", "")
    ks = range(1, len(specs) + 1)
    if coarse and tag != fine_only:
        ks = [len(specs)]
    rows = []
    prev = None
    for k in ks:
        fn = jax.jit(
            lambda v, k=k: jnp.sum(
                stack_prefix_apply(specs, params, v, k)[::3, ::5, ::7].astype(jnp.float32)
            )
        )
        dt = measure(fn, distinct(x, ITERS)) / ITERS * 1000.0
        rows.append(
            {
                "stage": f"{tag}.l{k - 1}_{specs[k - 1][0]}{specs[k - 1][1]}",
                "cum_ms": round(dt, 2),
                "marginal_ms": round(dt - prev, 2) if prev is not None else round(dt, 2),
            }
        )
        prev = dt
    return rows


def main():
    enable_compilation_cache()
    cfg = DSC_PRESETS["temp_0031bpp"]
    model = DSCStereoModel(cfg)
    rng = jax.random.PRNGKey(1)
    im1 = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)
    im2 = jax.random.uniform(jax.random.fold_in(rng, 1), (BATCH, H, W, 3), jnp.float32)
    params = model.init({"params": rng, "quant": rng}, im1, im2, train=False)
    params = cast_storage(params, jnp.bfloat16)
    p = params["params"]
    im1 = im1.astype(jnp.bfloat16)
    im2 = im2.astype(jnp.bfloat16)

    report = {"batch": BATCH, "shape": [H, W]}

    # --- encoder: g_a then g_a22 -----------------------------------------
    report["g_a"] = profile_stack("g_a", cfg.ga, p["g_a"], im1)
    z1 = _Stack(cfg.ga).apply({"params": p["g_a"]}, im1)
    z1 = jax.block_until_ready(z1)
    report["g_a22"] = profile_stack("g_a22", cfg.ga22, p["g_a22"], z1)

    # --- decoder: g_a(SI) + g_s22(code) + fusion + g_s --------------------
    code = jnp.clip(
        jnp.round(_Stack(cfg.ga22).apply({"params": p["g_a22"]}, z1) / cfg.coarse_step)
        * cfg.coarse_step,
        -cfg.code_clip,
        cfg.code_clip,
    )
    code = jax.block_until_ready(code)
    report["g_s22"] = profile_stack("g_s22", cfg.gs22, p["g_s22"], code)
    z1_hat = _Stack(cfg.gs22).apply({"params": p["g_s22"]}, code)
    z2 = _Stack(cfg.ga).apply({"params": p["g_a"]}, im2)
    z_cat = jax.block_until_ready(jnp.concatenate([z1_hat, z2], axis=-1))
    report["g_z1hat_z2"] = profile_stack("gz", cfg.gz, p["g_z1hat_z2"], z_cat)
    fused = _Stack(cfg.gz).apply({"params": p["g_z1hat_z2"]}, z_cat)
    fused = jax.block_until_ready(fused)
    report["g_s"] = profile_stack("g_s", cfg.gs, p["g_s"], fused)

    for sect in ("g_a", "g_a22", "g_s22", "g_z1hat_z2", "g_s"):
        print(f"--- {sect} ---")
        for r in report[sect]:
            print(f"  {r['stage']:<28} {r['marginal_ms']:>8.2f} ms")
        print(f"  total {report[sect][-1]['cum_ms']:.2f} ms")

    with open("/tmp/dsc_profile.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote /tmp/dsc_profile.json")


if __name__ == "__main__":
    main()
