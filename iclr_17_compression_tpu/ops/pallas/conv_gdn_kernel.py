"""Fused strided-conv + GDN Pallas kernel (the SURVEY §7.3 conv-epilogue
fusion, attempted for real this round).

Idea: a k×k stride-s conv is exactly a 3×3 stride-1 conv over the
*phase-stacked* input (the s² interleaved sub-grids concatenated on the
channel axis) with a re-scattered weight tensor — the same phase
decomposition ops/conv.py uses for transposed convs, applied to the forward
direction. That turns both hot Ballé-17 encoder stages into dense
1-strided convs whose taps are plain MXU matmuls:

    conv 9×9 s4  3→128  → conv 3×3 s1 over 48-ch phases  (lane util 3→48)
    conv 5×5 s2 128→128 → conv 3×3 s1 over 512-ch phases

and the GDN that follows — per-pixel C×C matmul + rsqrt·mul — becomes the
epilogue of the SAME kernel: the conv accumulator never round-trips to HBM,
killing the fusion barrier that made the standalone GDN kernel a net loss
(ops/gdn.py:62-75).

Kernel structure per grid step (one (TH, TW) output tile of one image):
  DMA the halo'd (TH+2, TW+2, s²Cin) phase block HBM→VMEM, 9 tap matmuls
  into an f32 VMEM accumulator, + bias, then norm = (y²)·γᵀ + β and
  y·rsqrt(norm) (or ·sqrt for IGDN) — one VMEM pass, one HBM write.

Forward-only fusion: the custom VJP's backward is the plain-XLA math
(identical gradients incl. the LowerBound gating), same policy as
ops/pallas/gdn_kernel.py.

MEASURED RESULT (one TPU v5 lite, Kodak 768×512 b=128 bf16 storage, the
full 3-stage encoder):

    XLA encoder                         36.4 ms/iter   1384 Mpix/s
    fused kernel, blocking DMA          61.5 ms/iter    819 Mpix/s
    fused kernel, double-buffered DMA   59.4 ms/iter    847 Mpix/s

i.e. the hand fusion LOSES to XLA by ~1.6×, and overlapping the halo DMA
with the tap matmuls recovers only ~3%. Diagnosis: the kernel re-reads
halo overlaps (~1.9× input traffic at 32×48 tiles), pays unaligned-sublane
window shifts for 8 of the 9 taps, and wastes 2.7× FLOPs on the lane-padded
48→128 phase channels of conv1 — while XLA's conv already pipelines HBM
traffic and fuses the GDN elementwise chain, leaving only the γ-matmul
unfused. Conclusion recorded in ops/gdn.py's dispatch policy: the XLA path
stays the default; this kernel remains as tested opt-in infrastructure and
as the template for epilogues XLA cannot express (e.g. fused
quantize+bitpack emission directly into entropy-coder symbol buffers).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..gdn import GDNParams, gdn_reparam


def phase_stack(x: jax.Array, s: int) -> jax.Array:
    """NHWC → (N, H/s, W/s, s²·C); phase (py, px) at channel block py·s+px."""
    n, h, w, c = x.shape
    assert h % s == 0 and w % s == 0
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, H/s, W/s, py, px, c
    return x.reshape(n, h // s, w // s, s * s * c)


def phase_weights(w: jax.Array, s: int, pad: int) -> jax.Array:
    """(k, k, Cin, Cout) → (K', K', s²·Cin, Cout) with
    K' = ay_max − ay_min + 1 where dy − pad = s·ay + py.

    Built with static .at[].set taps (k² of them) at trace time.
    """
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    ay_min = -((pad + s - 1) // s)
    ay_max = (k - 1 - pad) // s
    kp = ay_max - ay_min + 1
    wp = jnp.zeros((kp, kp, s * s * cin, cout), w.dtype)
    for dy in range(k):
        vy = dy - pad
        ay, py = vy // s, vy % s
        for dx in range(k):
            vx = dx - pad
            ax, px = vx // s, vx % s
            ch0 = (py * s + px) * cin
            # ax_min == ay_min (square kernel/stride/padding)
            wp = wp.at[ay - ay_min, ax - ay_min, ch0: ch0 + cin, :].set(w[dy, dx])
    return wp


def _conv_gdn_kernel(
    x_hbm, w_ref, bias_ref, gt_ref, beta_ref, o_ref, xs, sem,
    *, th: int, tw: int, kp: int, gw: int, inverse: bool, gdn_on: bool,
):
    """One grid step = one (th × full-W) output row band of one image; the
    W axis is swept in ``gw`` column tiles with DOUBLE-BUFFERED halo DMA —
    the next tile's halo window loads while the current tile's 9 tap matmuls
    and the GDN epilogue run."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    i = pl.program_id(1)

    # DMA slice shapes must be sublane-aligned (Mosaic: dim -2 multiple of
    # 8); the scratch is therefore the halo window rounded up to 8, and the
    # source array carries matching extra trail padding.
    th_s, tw_s = xs.shape[1], xs.shape[2]
    cp = xs.shape[-1]
    cout = o_ref.shape[-1]

    def dma(slot, j):
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * th, th_s), pl.ds(j * tw, tw_s), :],
            xs.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < gw)
        def _():
            dma(nxt, j + 1).start()

        dma(slot, j).wait()

        acc = jnp.zeros((th * tw, cout), jnp.float32)
        for dy in range(kp):
            for dx in range(kp):
                patch = xs[slot, dy: dy + th, dx: dx + tw, :].reshape(th * tw, cp)
                acc = acc + jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        acc = acc + bias_ref[:]

        if gdn_on:
            x2 = acc * acc
            norm = (
                jnp.dot(x2, gt_ref[:], preferred_element_type=jnp.float32)
                + beta_ref[:]
            )
            if inverse:
                acc = acc * jnp.sqrt(norm)
            else:
                acc = acc * jax.lax.rsqrt(norm)

        o_ref[0, :, pl.ds(j * tw, tw), :] = acc.reshape(th, tw, cout).astype(
            o_ref.dtype
        )
        return _

    jax.lax.fori_loop(0, gw, body, None)


def _pick_tile(n: int, cap: int) -> int:
    """Largest divisor of n that is ≤ cap (tiny tiles are slow but correct)."""
    for t in range(min(cap, n), 0, -1):
        if n % t == 0:
            return t
    return 0


def conv_gdn_fused_raw(
    xp_pad: jax.Array,       # (N, H2+kp-1, W2+kp-1, s²Cin) zero-padded phases
    wp: jax.Array,           # (kp, kp, s²Cin, Cout)
    bias: jax.Array,         # (1, Cout) f32
    gamma_t: jax.Array,      # (Cout, Cout) — γᵀ, effective (not reparam) — f32
    beta: jax.Array,         # (1, Cout) f32
    h2: int,
    w2: int,
    inverse: bool,
    gdn_on: bool,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = xp_pad.shape[0]
    kp = wp.shape[0]
    cout = wp.shape[-1]
    th = _pick_tile(h2, 32)
    tw = _pick_tile(w2, 64)
    if th == 0 or tw == 0:
        raise ValueError(f"untileable output grid {h2}x{w2}")
    cp = xp_pad.shape[-1]

    # align the DMA'd halo window to the (8, 128) sublane tiling; over-read
    # into extra zero trail padding
    th_s = -(-(th + kp - 1) // 8) * 8
    tw_s = -(-(tw + kp - 1) // 8) * 8
    eh = (th_s - (kp - 1)) - th   # extra rows the last tile over-reads
    ew = (tw_s - (kp - 1)) - tw
    xp_pad = jnp.pad(xp_pad, ((0, 0), (0, eh), (0, ew), (0, 0)))

    gw = w2 // tw
    # the padded source must also be lane-aligned at this point
    cp = xp_pad.shape[-1]
    kernel = functools.partial(
        _conv_gdn_kernel, th=th, tw=tw, kp=kp, gw=gw, inverse=inverse, gdn_on=gdn_on
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h2 // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # phases stay in HBM; DMA'd
            pl.BlockSpec((kp, kp, cp, cout), lambda n, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, cout), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w2, cout), lambda n, i: (n, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, cout), xp_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th_s, tw_s, cp), xp_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp_pad, wp, bias, gamma_t, beta)


def _conv_gdn_fwd_impl(x, w, b, gdn_params, stride, padding, inverse, interpret):
    """Fused torch-semantics strided conv + optional (I)GDN epilogue.

    x: (N, H, W, Cin), H and W divisible by ``stride``; w: (k, k, Cin, Cout).
    Equivalent to ``gdn(conv2d(x, w, b, stride, padding), gdn_params)`` —
    asserted in tests — in ONE kernel pass. Public entry: ``conv_gdn``.
    """
    s = stride
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = phase_stack(x, s)
    wp = phase_weights(w, s, padding)
    kp = wp.shape[0]
    lead = -(-padding // s)          # = ceil(padding/s) = -ay_min
    trail = kp - 1 - lead
    xp_pad = jnp.pad(xp, ((0, 0), (lead, trail), (lead, trail), (0, 0)))
    # lane (last-dim) slices must be 128-aligned on TPU: zero-pad the phase
    # channels (conv1's 48 → 128; the zero lanes multiply zero weight rows)
    cp = xp_pad.shape[-1]
    cpad = (-cp) % 128
    if cpad:
        xp_pad = jnp.pad(xp_pad, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        wp = jnp.pad(wp, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    bias = (b if b is not None else jnp.zeros((cout,), jnp.float32))
    bias = bias.reshape(1, cout).astype(jnp.float32)
    if gdn_params is not None:
        beta_eff, gamma_eff = gdn_reparam(gdn_params)
        gamma_t = gamma_eff.T.astype(jnp.float32)
        beta = beta_eff.reshape(1, cout).astype(jnp.float32)
        gdn_on = True
    else:
        gamma_t = jnp.zeros((cout, cout), jnp.float32)
        beta = jnp.zeros((1, cout), jnp.float32)
        gdn_on = False
    return conv_gdn_fused_raw(
        xp_pad, wp.astype(x.dtype), bias, gamma_t, beta,
        h // s, wd // s, inverse, gdn_on, interpret,
    )


def _ref_conv_gdn(x, w, b, gdn_params, stride, padding, inverse):
    """Pure-XLA reference (identical math; backward target)."""
    from ..conv import conv2d
    from ..gdn import gdn_xla

    y = conv2d(x, w, b, stride=stride, padding=padding)
    if gdn_params is not None:
        y = gdn_xla(y, gdn_params, inverse=inverse)
    return y


def _conv_gdn_fwd(x, w, b, gdn_params, stride, padding, inverse, interpret):
    out = _conv_gdn_fwd_impl(x, w, b, gdn_params, stride, padding, inverse, interpret)
    return out, (x, w, b, gdn_params)


def _conv_gdn_bwd(stride, padding, inverse, interpret, res, g):
    x, w, b, gdn_params = res

    def ref(x_, w_, b_, p_):
        return _ref_conv_gdn(x_, w_, b_, p_, stride, padding, inverse)

    _, vjp = jax.vjp(ref, x, w, b, gdn_params)
    return vjp(g)


# nondiff argnums: gdn_params must be differentiable → it is argnum 3, keep
# diffable; nondiff are (stride, padding, inverse, interpret) = argnums 4-7.
conv_gdn = jax.custom_vjp(_conv_gdn_fwd_impl, nondiff_argnums=(4, 5, 6, 7))
conv_gdn.defvjp(_conv_gdn_fwd, _conv_gdn_bwd)


def analysis17_fused(enc_params, x, interpret: bool = False):
    """Ballé-17 analysis transform with every stage as a fused conv(+GDN)
    Pallas kernel — numerically the Analysis17 module's forward, driven from
    its param subtree (``params["params"]["encoder"]``). Inference fast path;
    gradients flow via each stage's custom VJP."""
    gp1 = GDNParams(enc_params["gdn1"]["beta"], enc_params["gdn1"]["gamma"])
    gp2 = GDNParams(enc_params["gdn2"]["beta"], enc_params["gdn2"]["gamma"])
    y = conv_gdn(
        x, enc_params["conv1"]["weight"], enc_params["conv1"]["bias"],
        gp1, 4, 4, False, interpret,
    )
    y = conv_gdn(
        y, enc_params["conv2"]["weight"], enc_params["conv2"]["bias"],
        gp2, 2, 2, False, interpret,
    )
    return conv_gdn(
        y, enc_params["conv3"]["weight"], None, None, 2, 2, False, interpret
    )
