"""Bench the quantize+clamp+pack epilogue: XLA vs Pallas lowering.

Shapes: the DSC coarse code (b, H/32, W/32, 8) and — as a heavier
elementwise workload — the Ballé-17 latent (b, H/16, W/16, 128).
Run on the TPU: python tools/exp_quant_pack.py
"""

import json
import os
import sys
import time

os.environ.setdefault("ICLR17C_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from iclr_17_compression_tpu.ops.pallas.quant_pack_kernel import (
    quantize_pack_pallas,
    quantize_pack_xla,
)
from iclr_17_compression_tpu.utils.cache import enable_compilation_cache


def meas(fn, xs, rounds=4):
    for _ in range(2):
        t = float(sum(fn(x) for x in xs))
        assert t == t
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        t = float(sum(fn(x) for x in xs))
        best = min(best, time.perf_counter() - t0)
    return best / len(xs) * 1e3


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    out = {}
    for name, shape, step, clip in (
        ("dsc_code", (4, 10, 38, 8), 16.0, 128.0),
        ("balle_latent", (128, 32, 48, 128), 1.0, 127.0),
    ):
        x = jax.random.normal(rng, shape, jnp.float32) * 40.0
        xs = [x + 0.001 * i for i in range(8)]
        [float(jnp.sum(v[:1, :1, :1])) for v in xs]

        fx = jax.jit(lambda v: quantize_pack_xla(v, step, clip)[0].astype(jnp.int32).sum())
        fp = jax.jit(lambda v: quantize_pack_pallas(v, step, clip)[0].astype(jnp.int32).sum())
        sx, dx = jax.jit(lambda v: quantize_pack_xla(v, step, clip))(x)
        sp, dp = jax.jit(lambda v: quantize_pack_pallas(v, step, clip))(x)
        assert np.array_equal(np.asarray(sx), np.asarray(sp)), name
        assert np.allclose(np.asarray(dx), np.asarray(dp)), name
        out[name] = {
            "xla_ms": round(meas(fx, xs), 4),
            "pallas_ms": round(meas(fp, xs), 4),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
