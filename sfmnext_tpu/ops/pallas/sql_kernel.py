"""Pallas TPU kernels: fused SQL-decoder attention + bins head.

Why: the SQL decoder's two hot ops materialize [B, H*W/4, Q] energy /
logits volumes (335 MB in f32 at 320x1024) several times each through
XLA — softmax-over-81920-pixels and softmax-over-bins both round-trip
HBM per pass. Measured (tools/micro_bench.py sqlparts, bs8 320x1024):
full_query fwd+bwd 7.6 ms + energy->bins->depth fwd+bwd 7.9 ms for a
combined ~20 GFLOP — 4% MFU, pure bandwidth waste. Both ops are
streaming-friendly:

  * ``flash_full_query`` — the FullQueryLayer softmax-over-pixels
    summary (reference networks/layers.py:4-21) IS flash attention with
    Q=128 query rows, KV = the 81920-pixel feature map, head dim 32.
    One pass over the features with online max/sum, never storing the
    energy. Residuals (row max m, partition z) are [B,Q,1] scalars.
  * ``flash_bins_depth`` — the bins head (depth_decoder_QTR.py:61-70:
    1x1 conv Q->D on the energy, softmax over D, dot with bin centers)
    is per-pixel local: energy is recomputed tile-by-tile from the
    features (5 GFLOP) and the [N,D] logits volume never leaves VMEM.

Backward: custom VJPs, one streaming pass each, recomputing the tile
energies; parameter cotangents (dqueries, dW, db, dcenters) accumulate
in VMEM scratch across the sequential TPU grid and flush on the last
step. Layouts are chosen so no lane<->sublane relayout occurs: the
flash part runs energy as [Q, T] (queries in sublanes), the bins part
as [T, D] (pixels in sublanes); all matmuls are plain MXU dots.

Numerics match the XLA path (ops/sql_attention.py): bf16 matmuls with
f32 accumulation; softmax statistics in f32; the logits matmul eats a
bf16-cast energy exactly like the XLA path's ``energy.astype(cd)``.
Exactness tests: tests/test_sql_kernel.py (interpret mode vs XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large tiles amortize the per-grid-step overhead (~5 us/step measured at
# tile 1024: 640 steps ate 4.5 ms on <1 ms of work). The f32 [T, 128]
# temporaries at T=4096 are ~2 MB each — well inside scoped VMEM.
_TILES = (4096, 2048, 1024, 512, 256, 128)


def _pick_tile(n: int) -> int | None:
    for t in _TILES:
        if n % t == 0:
            return t
    return None


def supports(n: int) -> bool:
    """True if the pixel count can ride the kernels (tile-divisible)."""
    return _pick_tile(n) is not None


def _bf16(x):
    return x.astype(jnp.bfloat16)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# flash_full_query: summary = softmax_over_pixels(S @ Q^T)^T @ S
# --------------------------------------------------------------------------


def _fq_fwd_kernel(s_ref, q_ref, out_ref, m_ref, z_ref,
                   m_sc, z_sc, acc_sc, *, n_tiles):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        m_sc[...] = jnp.full(m_sc.shape, -jnp.inf, jnp.float32)
        z_sc[...] = jnp.zeros(z_sc.shape, jnp.float32)
        acc_sc[...] = jnp.zeros(acc_sc.shape, jnp.float32)

    s_t = s_ref[0]                          # [T, E] bf16
    q = q_ref[0]                            # [Q, E] bf16
    e_t = _dot(q, s_t, ((1,), (1,)))        # [Q, T] f32
    m_old = m_sc[...]                       # [Q, 1]
    m_new = jnp.maximum(m_old, jnp.max(e_t, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)          # [Q, 1]
    p_t = jnp.exp(e_t - m_new)              # [Q, T]
    m_sc[...] = m_new
    z_sc[...] = z_sc[...] * alpha + jnp.sum(p_t, axis=1, keepdims=True)
    acc_sc[...] = acc_sc[...] * alpha + _dot(
        _bf16(p_t), s_t, ((1,), (0,))
    )                                       # [Q, E] f32

    @pl.when(ri == n_tiles - 1)
    def _():
        out_ref[0] = acc_sc[...] / z_sc[...]
        m_ref[0] = m_sc[...]
        z_ref[0] = z_sc[...]


def _fq_bwd_kernel(s_ref, q_ref, g_ref, m_ref, z_ref, d_ref,
                   ds_ref, dq_ref, dq_sc, *, n_tiles):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        dq_sc[...] = jnp.zeros(dq_sc.shape, jnp.float32)

    s_t = s_ref[0]                          # [T, E] bf16
    q = q_ref[0]                            # [Q, E] bf16
    g = g_ref[0]                            # [Q, E] f32 (dsummary)
    m = m_ref[0]                            # [Q, 1]
    z = z_ref[0]                            # [Q, 1]
    delta = d_ref[0]                        # [Q, 1] = sum_e G*summary

    e_t = _dot(q, s_t, ((1,), (1,)))        # [Q, T]
    p_t = jnp.exp(e_t - m) / z              # [Q, T] attn (normalized)
    dattn = _dot(_bf16(g), s_t, ((1,), (1,)))   # [Q, T]
    de_t = p_t * (dattn - delta)                # [Q, T]
    # value path (attn^T @ G) + energy path (de^T @ q), both [T, E]
    ds = _dot(_bf16(de_t), q, ((0,), (0,))) + _dot(
        _bf16(p_t), _bf16(g), ((0,), (0,))
    )
    ds_ref[0] = ds.astype(ds_ref.dtype)
    dq_sc[...] += _dot(_bf16(de_t), s_t, ((1,), (0,)))  # [Q, E]

    @pl.when(ri == n_tiles - 1)
    def _():
        dq_ref[0] = dq_sc[...]


def _fq_call_fwd(s, q, tile):
    b, n, e = s.shape
    qn = q.shape[1]
    n_tiles = n // tile
    kern = functools.partial(_fq_fwd_kernel, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, e), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, qn, 1), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, qn, 1), lambda bi, ri: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, qn, e), jnp.float32),
            jax.ShapeDtypeStruct((b, qn, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, qn, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qn, 1), jnp.float32),
            pltpu.VMEM((qn, 1), jnp.float32),
            pltpu.VMEM((qn, e), jnp.float32),
        ],
    )(s, q)


def _fq_call_bwd(s, q, g, m, z, delta, tile):
    b, n, e = s.shape
    qn = q.shape[1]
    n_tiles = n // tile
    kern = functools.partial(_fq_bwd_kernel, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, e), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, qn, 1), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, qn, 1), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, qn, 1), lambda bi, ri: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, e), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, e), s.dtype),
            jax.ShapeDtypeStruct((b, qn, e), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((qn, e), jnp.float32)],
    )(s, q, g, m, z, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def flash_full_query(s, q, tile: int):
    """Softmax-over-pixels summary [B,Q,E] of feats s [B,N,E] / queries q.

    Matches ops.sql_attention.sql_full_query's ``summary`` output. The
    energy volume is never materialized (use the XLA path when the raw
    energy maps are needed, e.g. ``--log_attn``).
    """
    out, _, _ = _fq_call_fwd(s, q, tile)
    return out


def _fq_vjp_fwd(s, q, tile):
    out, m, z = _fq_call_fwd(s, q, tile)
    return out, (s, q, m, z, out)


def _fq_vjp_bwd(tile, res, g):
    s, q, m, z, out = res
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out, axis=-1, keepdims=True)  # [B,Q,1]
    ds, dq = _fq_call_bwd(s, q, g, m, z, delta, tile)
    return ds, dq.astype(q.dtype)


flash_full_query.defvjp(_fq_vjp_fwd, _fq_vjp_bwd)


# --------------------------------------------------------------------------
# flash_bins_depth: depth = softmax_D(cast_bf16(S@Q^T) @ W + b) @ centers
# --------------------------------------------------------------------------


def _bins_fwd_body(s_t, q, w, bias):
    e_t = _dot(s_t, q, ((1,), (1,)))                 # [T, Q] f32
    l_t = _dot(_bf16(e_t), w, ((1,), (0,))) + bias   # [T, D] f32
    mx = jnp.max(l_t, axis=1, keepdims=True)
    p = jnp.exp(l_t - mx)                            # [T, D]
    return e_t, p


def _bins_fwd_kernel(s_ref, q_ref, w_ref, b_ref, c_ref, out_ref):
    _, p = _bins_fwd_body(s_ref[0], q_ref[0], w_ref[...], b_ref[...])
    c = c_ref[0]                                     # [1, D]
    num = jnp.sum(p * c, axis=1, keepdims=True)      # [T, 1]
    den = jnp.sum(p, axis=1, keepdims=True)
    out_ref[0] = num / den


def _bins_bwd_kernel(s_ref, q_ref, w_ref, b_ref, c_ref, g_ref,
                     ds_ref, dq_ref, dw_ref, db_ref, dc_ref,
                     dq_sc, dw_sc, db_sc, dc_sc, *, n_tiles):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    @pl.when((bi == 0) & (ri == 0))
    def _():
        dw_sc[...] = jnp.zeros(dw_sc.shape, jnp.float32)
        db_sc[...] = jnp.zeros(db_sc.shape, jnp.float32)

    @pl.when(ri == 0)
    def _():
        dq_sc[...] = jnp.zeros(dq_sc.shape, jnp.float32)
        dc_sc[...] = jnp.zeros(dc_sc.shape, jnp.float32)

    s_t = s_ref[0]                                   # [T, E] bf16
    q = q_ref[0]                                     # [Q, E] bf16
    w = w_ref[...]                                   # [Q, D] bf16
    e_t, p = _bins_fwd_body(s_t, q, w, b_ref[...])
    den = jnp.sum(p, axis=1, keepdims=True)          # [T, 1]
    pn = p / den                                     # [T, D] softmax
    c = c_ref[0]                                     # [1, D]
    g = g_ref[0]                                     # [T, 1] ddepth

    dpn = g * c                                      # [T, D]
    dot_pd = jnp.sum(pn * dpn, axis=1, keepdims=True)
    dl = pn * (dpn - dot_pd)                         # [T, D]
    dc_sc[...] += jnp.sum(pn * g, axis=0, keepdims=True)      # [1, D]
    db_sc[...] += jnp.sum(dl, axis=0, keepdims=True)          # [1, D]
    dw_sc[...] += _dot(_bf16(e_t), _bf16(dl), ((0,), (0,)))   # [Q, D]
    de_t = _dot(_bf16(dl), w, ((1,), (1,)))                   # [T, Q]
    ds_ref[0] = _dot(_bf16(de_t), q, ((1,), (0,))).astype(ds_ref.dtype)
    dq_sc[...] += _dot(_bf16(de_t), s_t, ((0,), (0,)))        # [Q, E]

    @pl.when(ri == n_tiles - 1)
    def _():
        dq_ref[0] = dq_sc[...]
        dc_ref[0] = dc_sc[...]

    @pl.when((bi == pl.num_programs(0) - 1) & (ri == n_tiles - 1))
    def _():
        dw_ref[...] = dw_sc[...]
        db_ref[...] = db_sc[...]


def _bins_call_fwd(s, q, w, bias, centers, tile):
    b, n, e = s.shape
    qn, d = w.shape
    return pl.pallas_call(
        _bins_fwd_kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, e), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((qn, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ri: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, 1), lambda bi, ri: (bi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
    )(s, q, w, bias, centers)


def _bins_call_bwd(s, q, w, bias, centers, g, tile):
    b, n, e = s.shape
    qn, d = w.shape
    n_tiles = n // tile
    kern = functools.partial(_bins_bwd_kernel, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, e), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((qn, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda bi, ri: (bi, ri, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, e), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, qn, e), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((qn, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ri: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, e), s.dtype),
            jax.ShapeDtypeStruct((b, qn, e), jnp.float32),
            jax.ShapeDtypeStruct((qn, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qn, e), jnp.float32),
            pltpu.VMEM((qn, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )(s, q, w, bias, centers, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_bins_depth(s, q, w, bias, centers, tile: int):
    """Per-pixel depth [B,N,1] from feats s [B,N,E], queries q [B,Q,E],
    bins conv (w [Q,D], bias [1,D]) and centers [B,1,D].

    Equals ops.sql_attention.sql_bins_to_depth(energy, w, bias, centers,
    compute_dtype=bf16) with energy = einsum('bne,bqe->bnq', s, q) — the
    energy/logits volumes stay in VMEM, recomputed per tile.
    """
    return _bins_call_fwd(s, q, w, bias, centers, tile)


def _bins_vjp_fwd(s, q, w, bias, centers, tile):
    return _bins_call_fwd(s, q, w, bias, centers, tile), (
        s, q, w, bias, centers,
    )


def _bins_vjp_bwd(tile, res, g):
    s, q, w, bias, centers = res
    ds, dq, dw, db, dc = _bins_call_bwd(
        s, q, w, bias, centers, g.astype(jnp.float32), tile
    )
    return (
        ds,
        dq.astype(q.dtype),
        dw.astype(w.dtype),
        db.astype(bias.dtype),
        dc.astype(centers.dtype),
    )


flash_bins_depth.defvjp(_bins_vjp_fwd, _bins_vjp_bwd)


# --------------------------------------------------------------------------
# Decoder-facing wrappers
# --------------------------------------------------------------------------


def sql_summary(features, queries):
    """Drop-in for the summary half of sql_full_query on [B,H,W,E] feats."""
    b, h, w, e = features.shape
    tile = _pick_tile(h * w)
    s = features.reshape(b, h * w, e)
    return flash_full_query(_bf16(s), _bf16(queries), tile)


def sql_depth(features, queries, w, bias, centers):
    """Drop-in for sql_bins_to_depth over recomputed energy: [B,H,W,1]."""
    b, h, wd, e = features.shape
    tile = _pick_tile(h * wd)
    s = features.reshape(b, h * wd, e)
    depth = flash_bins_depth(
        _bf16(s), _bf16(queries), _bf16(w),
        bias.astype(jnp.float32).reshape(1, -1),
        centers.astype(jnp.float32)[:, None, :], tile,
    )
    return depth.reshape(b, h, wd, 1)
