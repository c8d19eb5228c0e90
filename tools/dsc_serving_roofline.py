"""Compute (not assert) the DSC serving bandwidth ceiling — round-4 review
item: the "near the stacks' bandwidth-weighted ceiling" conclusion was
argued from module shares; this derives the number the same way the Ballé
roofline was.

Method: lower + compile the exact serving encode/decode graphs bench.py
measures (b=16, 320×1216, bf16 storage) and read XLA's own cost analysis —
bytes accessed (HBM traffic as scheduled) and FLOPs — then:

    hbm-bound time  = bytes / 670e9      (measured sustained read BW, r3)
    mxu-bound time  = flops / 394e12
    ceiling Mpix/s  = pixels / max(hbm, mxu)

and compare with the measured rate. Prints one JSON line; run on the TPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ICLR17C_PRECISION", "default")

import jax
import jax.numpy as jnp

HBM_BPS = float(os.environ.get("ICLR17C_HBM_GBS", "670")) * 1e9
PEAK_FLOPS = float(os.environ.get("ICLR17C_PEAK_TFLOPS", "394")) * 1e12


def main():
    from iclr_17_compression_tpu.models import DSC_PRESETS, DSCStereoModel
    from iclr_17_compression_tpu.models.dsc import DSCDecoder, _Stack
    from iclr_17_compression_tpu.ops.precision import cast_storage
    from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    h, w, batch = 320, 1216, 16
    rng = jax.random.PRNGKey(1)
    im1 = jax.random.uniform(rng, (batch, h, w, 3), jnp.bfloat16)
    im2 = jax.random.uniform(jax.random.fold_in(rng, 1), (batch, h, w, 3), jnp.bfloat16)

    model = DSCStereoModel(DSC_PRESETS["temp_0031bpp"])
    cfg = model.config
    params = model.init(
        {"params": rng, "quant": rng},
        im1.astype(jnp.float32), im2.astype(jnp.float32), train=False,
    )
    params = cast_storage(params, jnp.bfloat16)

    def encode(x):
        z1 = _Stack(cfg.ga).apply({"params": params["params"]["g_a"]}, x)
        code = _Stack(cfg.ga22).apply({"params": params["params"]["g_a22"]}, z1)
        code = jnp.round(code / cfg.coarse_step) * cfg.coarse_step
        return jnp.clip(code, -cfg.code_clip, cfg.code_clip)

    code = jax.jit(encode)(im1)
    decoder = DSCDecoder(cfg)

    def decode(c):
        return decoder.apply(params, c, im2)

    out = {"batch": batch, "shape": [h, w]}
    px = batch * h * w
    for name, fn, x in (("encode", encode, im1), ("decode", decode, code)):
        ca = jax.jit(fn).lower(x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        byts = float(ca["bytes accessed"])
        t_hbm = byts / HBM_BPS
        t_mxu = flops / PEAK_FLOPS
        out[name] = {
            "gflops": round(flops / 1e9, 1),
            "hbm_gb": round(byts / 1e9, 3),
            "hbm_bound_ms": round(t_hbm * 1e3, 2),
            "mxu_bound_ms": round(t_mxu * 1e3, 2),
            "ceiling_mpix_s": round(px / max(t_hbm, t_mxu) / 1e6, 1),
            "bound": "hbm" if t_hbm > t_mxu else "mxu",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
