"""Kernel-variant experiments for the round-3 MFU push.

Targets the top sinks from tools/profile_prefix.py (batch-128 Kodak bf16,
marginal ms/iter): conv1 11.1, deconv2 9.6, igdn2 5.7, deconv3 3.8, gdn1 3.4.
Each experiment benches alternative lowerings of one stage, checking
numerics against the current path first. Winners get promoted into ops/.

Run on the TPU: python tools/exp_kernels.py
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
from jax import lax

from iclr_17_compression_tpu.ops.conv import _conv_s2d, conv2d, conv_transpose2d
from iclr_17_compression_tpu.ops.gdn import GDNParams, gdn
from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

BATCH, H, W, N = 128, 512, 768, 128
ITERS = 8
_DIMNUMS = ("NHWC", "HWIO", "NHWC")
PREC = lax.Precision.DEFAULT


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
    return best / ITERS * 1e3  # ms/iter


def distinct(x, iters=ITERS):
    xs = [x + 0.001 * i for i in range(iters)]
    for v in xs:
        float(jnp.sum(v))
    return xs


def fold(v):
    return jnp.sum(v[::3, ::7, ::11].astype(jnp.float32))


def check(name, a, b, tol=2e-2):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9
    ok = err / scale < tol
    print(f"  [{name}] rel_err={err / scale:.2e} {'OK' if ok else 'MISMATCH'}")
    return ok


def exp_conv1():
    """First layer: 9x9 s4, 3->128."""
    print("== conv1 variants ==")
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.fold_in(rng, 1), (9, 9, 3, N)) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((N,), jnp.bfloat16)

    @jax.jit
    def cur(x):
        return conv2d(x, w, b, stride=4, padding=4)

    @jax.jit
    def direct(x):
        return lax.conv_general_dilated(
            x, w, (4, 4), ((4, 4), (4, 4)), dimension_numbers=_DIMNUMS,
            precision=PREC) + b

    # W-merge only (pure reshape, no transpose): (n,h,w/4,12), kernel (9,3,12,N), stride (4,1)
    @jax.jit
    def wmerge(x):
        n, h, win, c = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0)))
        lw = xp.shape[2] - xp.shape[2] % 4
        xw = xp[:, :, :lw].reshape(n, h, lw // 4, 4 * c)
        # fold kernel width taps: tap kw hits (block, phase): with left pad 4,
        # output col ow reads input cols 4*ow + kw for kw in 0..8 →
        # block (4*ow+kw)//4 = ow + kw//4, phase kw%4 → kernel width 3 blocks
        w2 = jnp.pad(w, ((0, 0), (0, 3), (0, 0), (0, 0)))  # width 12 taps
        w2 = w2.reshape(9, 3, 4, c, N).transpose(0, 1, 2, 3, 4).reshape(9, 3, 4 * c, N)
        out = lax.conv_general_dilated(
            xw, w2, (4, 1), ((4, 4), (0, 0)), dimension_numbers=_DIMNUMS,
            precision=PREC)
        return out + b

    ref = cur(x)
    ok_d = check("direct", direct(x), ref)
    ok_w = check("wmerge", wmerge(x), ref)
    xs = distinct(x)
    res = {"s2d_current": measure(lambda v: fold(cur(v)), xs)}
    if ok_d:
        res["direct"] = measure(lambda v: fold(direct(v)), xs)
    if ok_w:
        res["wmerge"] = measure(lambda v: fold(wmerge(v)), xs)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))
    return res


def exp_deconv2():
    """Decoder stage: 5x5 s2 transposed conv 128->128 at the /8 grid."""
    print("== deconv2 variants ==")
    rng = jax.random.PRNGKey(2)
    x = (jax.random.normal(rng, (BATCH, 64, 96, N)) * 1.0).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.fold_in(rng, 1), (5, 5, N, N)) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((N,), jnp.bfloat16)

    @jax.jit
    def cur(x):
        return conv_transpose2d(x, w, b, stride=2, padding=2, output_padding=1)

    @jax.jit
    def dilated(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((2, 3), (2, 3)), lhs_dilation=(2, 2),
            dimension_numbers=_DIMNUMS, precision=PREC) + b

    ref = cur(x)
    ok = check("lhs_dilated_s2", dilated(x), ref)
    # cross-check against CPU fp32 ground truth on a small slice
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        xs32 = jnp.asarray(np.asarray(x[:1], np.float32))
        ws32 = jnp.asarray(np.asarray(w, np.float32))
        truth = lax.conv_general_dilated(
            xs32, ws32, (1, 1), ((2, 3), (2, 3)), lhs_dilation=(2, 2),
            dimension_numbers=_DIMNUMS, precision=lax.Precision.HIGHEST)
    ok2 = check("dilated_vs_cpu", dilated(x)[:1] - b, truth, tol=3e-2)
    xs = distinct(x)
    res = {"phase_fused": measure(lambda v: fold(cur(v)), xs)}
    if ok and ok2:
        res["lhs_dilated"] = measure(lambda v: fold(dilated(v)), xs)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))
    return res


def exp_deconv3():
    """Final decoder stage: 9x9 s4 transposed conv 128->3 at the /4 grid."""
    print("== deconv3 variants ==")
    rng = jax.random.PRNGKey(3)
    x = (jax.random.normal(rng, (BATCH, 128, 192, N))).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.fold_in(rng, 1), (9, 9, N, 3)) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((3,), jnp.bfloat16)

    @jax.jit
    def cur(x):
        return conv_transpose2d(x, w, b, stride=4, padding=4, output_padding=3)

    xs = distinct(x)
    res = {"phase_fused": measure(lambda v: fold(cur(v)), xs)}
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))
    return res


def exp_gdn():
    """IGDN at the /4 grid (the igdn2 sink)."""
    print("== gdn variants ==")
    rng = jax.random.PRNGKey(4)
    x = (jax.random.normal(rng, (BATCH, 128, 192, N))).astype(jnp.bfloat16)
    beta = jnp.ones((N,), jnp.float32)
    gamma = (jnp.eye(N) * 0.1 + 0.001).astype(jnp.float32)
    p = GDNParams(beta, gamma)

    @jax.jit
    def cur(x):
        return gdn(x, p, inverse=True)

    @jax.jit
    def bf16_params(x):
        pb = GDNParams(beta.astype(jnp.bfloat16), gamma.astype(jnp.bfloat16))
        return gdn(x, pb, inverse=True)

    ref = cur(x)
    ok = check("bf16_params", bf16_params(x), ref)
    xs = distinct(x)
    res = {"current": measure(lambda v: fold(cur(v)), xs)}
    if ok:
        res["bf16_params"] = measure(lambda v: fold(bf16_params(v)), xs)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))
    return res


if __name__ == "__main__":
    enable_compilation_cache()
    out = {}
    out["conv1"] = exp_conv1()
    out["deconv2"] = exp_deconv2()
    out["deconv3"] = exp_deconv3()
    out["gdn"] = exp_gdn()
    print(json.dumps(out))
