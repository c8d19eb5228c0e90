"""Prefix-ablation profile of the Ballé-17 pipeline (in-graph stage costs).

Standalone stage microbenches mislead (XLA lays out / fuses differently in
isolation): profile_balle17.py measured conv1 alone at 11.6 ms while the
whole 5-stage encoder runs in 17.4 ms. This script times the REAL graph at
each prefix — conv1; conv1+gdn1; ... full decoder — so consecutive
differences are the marginal in-graph cost of each stage. Same
batch/shape/dtype/sync discipline as bench.py.
"""

import json
import os
import sys
import time

os.environ.setdefault("ICLR17C_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models.balle17 import Balle17Compressor
from iclr_17_compression_tpu.nn.layers import GDN, TorchConvTranspose
from iclr_17_compression_tpu.ops.conv import conv2d, conv_transpose2d
from iclr_17_compression_tpu.ops.gdn import GDNParams, gdn
from iclr_17_compression_tpu.ops.precision import cast_storage
from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

H, W, BATCH, N = 512, 768, 128, 128
ITERS = 8


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
        float(jnp.sum(v))
    return xs


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)
    model = Balle17Compressor(out_channel_n=N)
    params = model.init({"params": rng, "quant": rng}, images, train=False)
    params = cast_storage(params, jnp.bfloat16)
    images = images.astype(jnp.bfloat16)
    ep = params["params"]["encoder"]
    dp = params["params"]["decoder"]

    def fold(v):
        return jnp.sum(v[::3, ::7, ::11].astype(jnp.float32))

    def g(p):
        return GDNParams(p["beta"], p["gamma"])

    def stage_fns():
        def s_conv1(x):
            return conv2d(x, ep["conv1"]["weight"], ep["conv1"]["bias"], stride=4, padding=4)

        def s_gdn1(x):
            return gdn(x, g(ep["gdn1"]))

        def s_conv2(x):
            return conv2d(x, ep["conv2"]["weight"], ep["conv2"]["bias"], stride=2, padding=2)

        def s_gdn2(x):
            return gdn(x, g(ep["gdn2"]))

        def s_conv3(x):
            return conv2d(x, ep["conv3"]["weight"], None, stride=2, padding=2)

        def s_round(x):
            return jnp.round(x)

        def s_deconv1(x):
            return conv_transpose2d(x, dp["deconv1"]["weight"], dp["deconv1"]["bias"],
                                    stride=2, padding=2, output_padding=1)

        def s_igdn1(x):
            return gdn(x, g(dp["igdn1"]), inverse=True)

        def s_deconv2(x):
            return conv_transpose2d(x, dp["deconv2"]["weight"], dp["deconv2"]["bias"],
                                    stride=2, padding=2, output_padding=1)

        def s_igdn2(x):
            return gdn(x, g(dp["igdn2"]), inverse=True)

        def s_deconv3(x):
            return conv_transpose2d(x, dp["deconv3"]["weight"], dp["deconv3"]["bias"],
                                    stride=4, padding=4, output_padding=3)

        return [
            ("conv1", s_conv1), ("gdn1", s_gdn1), ("conv2", s_conv2),
            ("gdn2", s_gdn2), ("conv3", s_conv3), ("round", s_round),
            ("deconv1", s_deconv1), ("igdn1", s_igdn1), ("deconv2", s_deconv2),
            ("igdn2", s_igdn2), ("deconv3", s_deconv3),
        ]

    stages = stage_fns()
    inputs = distinct(images, ITERS)
    results = []
    prev_ms = 0.0
    for k in range(1, len(stages) + 1):
        chain = stages[:k]

        @jax.jit
        def prefix(x, _chain=tuple(f for _, f in chain)):
            for f in _chain:
                x = f(x)
            return fold(x)

        dt = measure(prefix, inputs)
        ms = dt / ITERS * 1e3
        results.append({
            "prefix": "+".join(name for name, _ in chain),
            "ms": round(ms, 3),
            "marginal_ms": round(ms - prev_ms, 3),
        })
        prev_ms = ms
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"batch": BATCH, "prefix_profile": results}))


if __name__ == "__main__":
    main()
