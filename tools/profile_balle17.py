"""Per-stage wall-clock breakdown of the bench.py Ballé-17 pipeline.

Round-2 verdict: the headline number (1244 Mpix/s, 18.1% MFU) sits at half
the utilization-weighted speed-of-light bound with no committed profile
explaining the gap. This script measures each stage of the exact bench
pipeline in isolation (same batch/shape/dtype/sync discipline as bench.py)
so the gap decomposes into named sinks. Results are committed to BASELINE.md.

Stages:
  encoder        Analysis17 (s2d conv + GDN + conv + GDN + conv)
  enc_conv1      first 9x9/s4 conv alone (space-to-depth path)
  enc_gdn        one GDN at the /16 grid
  decoder        Synthesis17 (phase-fused deconvs + IGDN)
  dec_deconv3    last 9x9/s4 deconv alone (the 16x upsample to RGB)
  rate           BitEstimator CDF double-eval + bits reduction (fp32)
  enc_dec        encoder + round + decoder (no rate)
  full           encoder + round + decoder + rate  (the bench headline graph)

Run:  python tools/profile_balle17.py            (on the TPU)
"""

import json
import os
import sys
import time

os.environ.setdefault("ICLR17C_PRECISION", "default")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.models.balle17 import Analysis17, Balle17Compressor, Synthesis17
from iclr_17_compression_tpu.nn.layers import BitEstimator
from iclr_17_compression_tpu.ops.entropy import LOG2
from iclr_17_compression_tpu.ops.precision import cast_storage
from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

H, W, BATCH, N = 512, 768, 128, 128
ITERS = 8


def measure(fn, inputs, rounds=3):
    for _ in range(2):
        total = float(sum(fn(x) for x in inputs))
        assert total == total
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        total = float(sum(fn(x) for x in inputs))
        dt = time.perf_counter() - t0
        assert total == total
        best = min(best, dt)
    return best


def distinct(x, iters):
    xs = [x + 0.001 * i for i in range(iters)]
    for v in xs:
        float(jnp.sum(v))
    return xs


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)

    model = Balle17Compressor(out_channel_n=N)
    params = model.init({"params": rng, "quant": rng}, images, train=False)
    params = cast_storage(params, jnp.bfloat16)
    images = images.astype(jnp.bfloat16)

    enc_p = {"params": params["params"]["encoder"]}
    dec_p = {"params": params["params"]["decoder"]}

    # representative latent (what the decoder/rate stages actually see)
    latent = jax.jit(
        lambda x: jnp.round(Analysis17(N).apply(enc_p, x))
    )(images)
    float(jnp.sum(latent))

    be = BitEstimator(N, name="bit_estimator")
    be_p = {"params": params["params"]["bit_estimator"]}

    def fold(v):
        return jnp.sum(v[::3, ::7, ::11].astype(jnp.float32))

    stages = {}

    @jax.jit
    def full(x):
        out = model.apply(params, x, train=False)
        return fold(out["recon"]) + fold(out["latent"]) + out["bpp"]

    @jax.jit
    def enc_dec(x):
        lat = jnp.round(Analysis17(N).apply(enc_p, x))
        rec = jnp.clip(Synthesis17(N).apply(dec_p, lat), 0.0, 1.0)
        return fold(rec) + fold(lat)

    @jax.jit
    def encoder(x):
        return fold(jnp.round(Analysis17(N).apply(enc_p, x)))

    @jax.jit
    def decoder(lat):
        return fold(jnp.clip(Synthesis17(N).apply(dec_p, lat), 0.0, 1.0))

    @jax.jit
    def rate(lat):
        lat32 = lat.astype(jnp.float32)
        prob = be.apply(be_p, lat32 + 0.5) - be.apply(be_p, lat32 - 0.5)
        bits = jnp.sum(jnp.clip(-jnp.log(prob + 1e-10) / LOG2, 0.0, 50.0))
        return bits

    # sub-stage microscopes
    from iclr_17_compression_tpu.ops.conv import conv2d
    from iclr_17_compression_tpu.ops.gdn import gdn
    from iclr_17_compression_tpu.ops.gdn import GDNParams

    w1 = params["params"]["encoder"]["conv1"]["weight"]
    b1 = params["params"]["encoder"]["conv1"]["bias"]
    g1 = params["params"]["encoder"]["gdn1"]

    @jax.jit
    def enc_conv1(x):
        return fold(conv2d(x, w1, b1, stride=4, padding=4))

    feat16 = jax.jit(lambda x: conv2d(x, w1, b1, stride=4, padding=4))(images)
    float(jnp.sum(feat16))

    @jax.jit
    def enc_gdn(f):
        return fold(gdn(f, GDNParams(g1["beta"], g1["gamma"])))

    w3 = params["params"]["decoder"]["deconv3"]["weight"]
    b3 = params["params"]["decoder"]["deconv3"]["bias"]
    from iclr_17_compression_tpu.ops.conv import conv_transpose2d

    # build the real /16 input of deconv3 by running the first two stages
    import flax.linen as fnn

    class _Part(fnn.Module):
        n: int = N

        @fnn.compact
        def __call__(self, x):
            from iclr_17_compression_tpu.nn.layers import GDN as LGDN, TorchConvTranspose
            import math
            sq2 = math.sqrt(2)
            from iclr_17_compression_tpu.models.balle17 import _B001, xavier_normal_gain
            x = TorchConvTranspose(self.n, 5, stride=2, padding=2, output_padding=1,
                                   weight_init=xavier_normal_gain(sq2), bias_init=_B001,
                                   name="deconv1")(x)
            x = LGDN(inverse=True, name="igdn1")(x)
            x = TorchConvTranspose(self.n, 5, stride=2, padding=2, output_padding=1,
                                   weight_init=xavier_normal_gain(sq2), bias_init=_B001,
                                   name="deconv2")(x)
            x = LGDN(inverse=True, name="igdn2")(x)
            return x

    feat_dec16 = jax.jit(lambda l: _Part().apply(dec_p, l))(latent)
    float(jnp.sum(feat_dec16))

    @jax.jit
    def dec_deconv3(f):
        return fold(conv_transpose2d(f, w3, b3, stride=4, padding=4, output_padding=3))

    jobs = [
        ("full", full, images),
        ("enc_dec", enc_dec, images),
        ("encoder", encoder, images),
        ("decoder", decoder, latent),
        ("rate", rate, latent),
        ("enc_conv1", enc_conv1, images),
        ("enc_gdn", enc_gdn, feat16),
        ("dec_deconv3", dec_deconv3, feat_dec16),
    ]
    mpix = BATCH * H * W * ITERS / 1e6
    for name, fn, x in jobs:
        inputs = distinct(x, ITERS)
        dt = measure(fn, inputs)
        fl = flops_of(fn, inputs[0])
        stages[name] = {
            "ms_per_iter": round(dt / ITERS * 1e3, 3),
            "mpix_s": round(mpix / dt, 1),
            "tflops_s": round(fl * ITERS / dt / 1e12, 2) if fl else None,
            "gflops_per_iter": round(fl / 1e9, 2) if fl else None,
        }
        print(name, json.dumps(stages[name]), flush=True)

    print(json.dumps({"batch": BATCH, "shape": [H, W], "stages": stages}))


if __name__ == "__main__":
    main()
