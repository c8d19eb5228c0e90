"""bf16-storage inference path tests (the bench default)."""

import jax
import jax.numpy as jnp
import numpy as np

from iclr_17_compression_tpu.models import Balle17Compressor
from iclr_17_compression_tpu.ops.precision import cast_storage


def test_bf16_storage_close_to_fp32(key):
    """cast_storage(bf16) keeps recon within quantizer-dominated error and —
    because the rate term upcasts to fp32 internally — keeps the bpp
    estimate sane (no catastrophic CDF cancellation)."""
    model = Balle17Compressor(out_channel_n=8)
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    params = model.init({"params": key, "quant": key}, x, train=False)

    out32 = jax.jit(lambda p, x: model.apply(p, x, train=False))(params, x)
    pb = cast_storage(params, jnp.bfloat16)
    outbf = jax.jit(lambda p, x: model.apply(p, x, train=False))(
        pb, x.astype(jnp.bfloat16)
    )

    r32 = np.asarray(out32["recon"], np.float32)
    rbf = np.asarray(outbf["recon"], np.float32)
    # recon error well below the ±0.5 rounding quantizer's distortion
    assert np.mean((r32 - rbf) ** 2) < np.mean((r32 - np.asarray(x)) ** 2) * 0.05
    assert np.max(np.abs(r32 - rbf)) < 0.1

    # rate estimate: fp32 rate path keeps bf16 bpp within a few percent
    b32, bbf = float(out32["bpp"]), float(outbf["bpp"])
    assert abs(b32 - bbf) / max(b32, 1e-9) < 0.05

    # integer leaves pass through cast_storage untouched
    tree = {"a": jnp.ones(3, jnp.float32), "s": jnp.arange(3, dtype=jnp.int32)}
    casted = cast_storage(tree, jnp.bfloat16)
    assert casted["a"].dtype == jnp.bfloat16
    assert casted["s"].dtype == jnp.int32
