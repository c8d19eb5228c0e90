"""Benchmark: Kodak-size encode+decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mpixels/s/chip", "vs_baseline": N}

Measures the flagship Ballé-17 codec (BASELINE config #1: 768×512 Kodak
frames) end-to-end on-device: analysis transform + rounding + synthesis
transform + rate estimation, jitted, steady-state.

Measurement rules learned the hard way on this backend:
- repeated identical-arg dispatches can be elided → distinct input buffers;
- ``block_until_ready`` does not synchronize through the remote tunnel →
  every output is folded into a device-side scalar fetched to host once;
- inference runs in bf16 MXU mode (``ICLR17C_PRECISION=default``): the
  ~3e-3 conv error is far below the quantizer's step; training keeps the
  exact-fp32 policy (see ops/precision.py).

The reference publishes no throughput numbers (SURVEY.md §6), so
``vs_baseline`` compares against ``bench_baseline.json`` (previous best,
committed when improved); 1.0 on first run.
"""

import json
import os
import time

os.environ.setdefault("ICLR17C_PRECISION", "default")  # bf16 inference mode

import jax
import jax.numpy as jnp


def main():
    from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from iclr_17_compression_tpu.models import Balle17Compressor

    h, w, batch = 512, 768, 128  # Kodak-size frames; batch amortizes dispatch
    # (throughput metric: 32 frames in flight is a realistic serving batch;
    #  measured 394 Mpix/s at batch 8 vs 530 at batch 32 - the ~2 ms/dispatch
    #  tunnel floor dominates small batches)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)

    model = Balle17Compressor(out_channel_n=128)
    params = model.init({"params": rng, "quant": rng}, images, train=False)

    # bf16 STORAGE inference: params + input cast once, every inter-stage
    # activation then lives in HBM as bf16 (the pipeline is HBM-bound).
    # Measured +32% over fp32 storage; error is quantizer-dominated.
    # Opt out with ICLR17C_BENCH_STORAGE=float32.
    if os.environ.get("ICLR17C_BENCH_STORAGE", "bfloat16") == "bfloat16":
        from iclr_17_compression_tpu.ops.precision import cast_storage

        params = cast_storage(params, jnp.bfloat16)
        images = images.astype(jnp.bfloat16)

    @jax.jit
    def encode_decode(params, x):
        out = model.apply(params, x, train=False)
        # fold every output into one scalar so a single host fetch
        # synchronizes the full computation
        probe = (
            jnp.sum(out["recon"][::3, ::7, ::11])
            + jnp.sum(out["latent"][::5, ::3, ::13])
            + out["bpp"]
        )
        return probe

    iters = 8
    inputs = [images + 0.001 * i for i in range(iters)]
    for x in inputs:
        float(jnp.sum(x))  # materialize distinct buffers

    # Warmup: compile + drain the tunnel's cold-start (the first ~1 s of
    # dispatches in a fresh process run 5-10x slower than steady state;
    # measured 72 ms/iter cold vs 9 ms warm). Two full passes, synced.
    for _ in range(2):
        total = float(sum(encode_decode(params, x) for x in inputs))
        assert total == total  # NaN guard

    # Steady state: best of 3 rounds (one sync point per round).
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        total = float(sum(encode_decode(params, x) for x in inputs))
        dt = time.perf_counter() - t0
        assert total == total
        best_dt = min(best_dt, dt)

    mpix = batch * h * w * iters / best_dt / 1e6

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("value", mpix)
        vs = mpix / base if base else 1.0

    print(
        json.dumps(
            {
                "metric": "balle17_kodak768x512_encode_decode_throughput",
                "value": round(mpix, 3),
                "unit": "Mpixels/s/chip",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
