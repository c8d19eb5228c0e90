"""Ring-attention PAM: W-sharded parallax attention via ppermute.

PAM (models/passr.py, reference models/PASSRnet.py:124-136) computes a full
W×W attention per image row — the one module whose K/V span the entire
width, making it the image-codec analog of long-context attention
(SURVEY.md §5). H-sharding needs no communication (rows are independent;
``make_tiled_dsc(..., axis='height')``); THIS module is the W-sharding
alternative: the classic ring-attention construction, TPU-native —

- every conv of the PAM block runs in the outer GSPMD-sharded graph (halo
  exchanges auto-inserted);
- the attention core runs under ``shard_map``: K/V shards rotate around the
  'tile' mesh axis via ``lax.ppermute`` while each device folds them into a
  flash-attention-style online softmax (running max / denominator /
  numerator), so no device ever materializes the full W×W score matrix or
  the gathered K/V;
- the validity mask needs COLUMN sums of the opposite-direction attention
  (Σ over queries of softmax mass landing on each key position,
  reference PASSRnet.py:141-146): a second ring rotates (query, max,
  denominator) triples so each device accumulates the mass received by its
  local key shard.

Numerics match the replicated PAM up to fp32 associativity (parity test in
tests/test_tiled.py asserts ≤1e-5).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.conv import conv2d
from ..ops.precision import get_precision
from .mesh import tile_sharding

_NEG_INF = -1e30


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _scores(q, k):
    """(n,h,i,c) x (n,h,j,c) -> fp32 (n,h,i,j)."""
    return jnp.einsum(
        "nhic,nhjc->nhij",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=get_precision(None),
    )


def _ring_softmax_apply(q, k, v, axis_name: str):
    """Online-softmax ring: returns (softmax(q·kᵀ) @ v, running max, denom)
    over the FULL (ring-gathered) key axis; q stays local."""
    p_n = lax.axis_size(axis_name)
    n, h, wq, c = q.shape
    m = jnp.full((n, h, wq), _NEG_INF, jnp.float32)
    l = jnp.zeros((n, h, wq), jnp.float32)
    acc = jnp.zeros((n, h, wq, v.shape[-1]), jnp.float32)
    k_cur, v_cur = k, v
    for step in range(p_n):
        s = _scores(q, k_cur)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        scale = jnp.exp(m - m_new)
        p_ij = jnp.exp(s - m_new[..., None])
        l = l * scale + jnp.sum(p_ij, axis=-1)
        acc = acc * scale[..., None] + jnp.einsum(
            "nhij,nhjc->nhic",
            p_ij,
            v_cur.astype(jnp.float32),
            precision=get_precision(None),
        )
        m = m_new
        if step < p_n - 1:
            perm = _ring_perm(p_n)
            k_cur = lax.ppermute(k_cur, axis_name, perm)
            v_cur = lax.ppermute(v_cur, axis_name, perm)
    return acc / l[..., None], m, l


def _ring_column_mass(q, k, m, l, axis_name: str):
    """Σ_i softmax(q·kᵀ)[i, j] for the LOCAL key shard j, ring-rotating the
    (query, max, denom) triples computed by a prior ring pass."""
    p_n = lax.axis_size(axis_name)
    n, h, wk, _ = k.shape
    col = jnp.zeros((n, h, wk), jnp.float32)
    q_cur, m_cur, l_cur = q, m, l
    for step in range(p_n):
        s = _scores(q_cur, k)  # (n,h,i,j_local)
        mass = jnp.exp(s - m_cur[..., None]) / l_cur[..., None]
        col = col + jnp.sum(mass, axis=2)
        if step < p_n - 1:
            perm = _ring_perm(p_n)
            q_cur = lax.ppermute(q_cur, axis_name, perm)
            m_cur = lax.ppermute(m_cur, axis_name, perm)
            l_cur = lax.ppermute(l_cur, axis_name, perm)
    return col


def _tc(x, p, padding=0):
    return conv2d(x, p["weight"], p.get("bias"), stride=1, padding=padding)


def pam_eval_ring(pam_params, x_left, x_right, mesh: Mesh) -> jax.Array:
    """W-sharded PAM eval forward (models/passr.py PAM, ``train=False``).

    ``pam_params``: the PAM module's param subtree (rb/b1/b2/b3/fusion).
    Inputs are NHWC feature maps; returns the fused left features, W-sharded
    over the 'tile' mesh axis. Convs run under GSPMD; the two attention
    directions run as ppermute rings.
    """
    from ..models.passr import clean_mask

    x_shard = tile_sharding(mesh)
    spec = P(None, None, "tile", None)

    def resb(x):
        p = pam_params["rb"]
        h = _tc(x, p["conv1"], padding=1)
        h = jax.nn.leaky_relu(h, 0.1)
        h = _tc(h, p["conv2"], padding=1)
        return h + x

    ring_fused = functools.partial(_ring_softmax_apply, axis_name="tile")
    ring_mass = _ring_column_mass

    @functools.partial(
        jax.jit,
        in_shardings=(x_shard, x_shard),
        out_shardings=x_shard,
    )
    def forward(xl, xr):
        buf_l = resb(xl)
        buf_r = resb(xr)
        q_l = _tc(buf_l, pam_params["b1"])
        k_r = _tc(buf_r, pam_params["b2"])
        q_r = _tc(buf_r, pam_params["b1"])
        k_l = _tc(buf_l, pam_params["b2"])
        val = _tc(xr, pam_params["b3"])

        def core(q_l, k_r, val, q_r, k_l):
            fused, _, _ = ring_fused(q_l, k_r, val)
            # mask direction: m_l2r = softmax over left positions for right
            # queries; column mass = attention received per left position
            _, m, l = ring_fused(q_r, k_l, jnp.zeros_like(val))
            col = ring_mass(q_r, k_l, m, l, "tile")
            return fused, col

        from .halo import _shard_map

        fused, col = _shard_map()(
            core,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec),
            out_specs=(spec, P(None, None, "tile")),
        )(q_l, k_r, val, q_r, k_l)

        v_mask = (col > 0.1).astype(jnp.float32)[..., None]
        v_mask = clean_mask(v_mask)
        cat = jnp.concatenate(
            [fused.astype(xl.dtype), xl, v_mask.astype(xl.dtype)], axis=-1
        )
        return _tc(cat, pam_params["fusion"])

    return forward(
        jax.device_put(x_left, x_shard), jax.device_put(x_right, x_shard)
    )
