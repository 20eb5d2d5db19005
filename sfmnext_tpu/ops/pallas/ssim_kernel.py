"""Pallas TPU kernel: fused stacked SSIM+L1 reprojection loss.

Why: the XLA path (ops.image.ssim_multi via ops.losses.
reprojection_losses_stacked) runs the k=7 box filters as MXU matmuls but
still materializes every pooled map ([B,H,W,3N] f32 = 335 MB each at
320x1024 bs16) in HBM between passes — measured 9 ms fwd+bwd for the
2-source stack plus 2.5 ms for the identity stack at bs8 (floor-
corrected, tools/micro_bench.py ssim_bf16). Fused here: one grid step
per batch image holds the whole [C,H,W] stack in VMEM, runs the
reflection box filters as band-matrix matmuls (the SAME integer
matrices as ops.image.box_filter_reflect, passed in as constants), and
writes only the [N,H,W] loss map. Traffic drops ~50x.

Math (identical to reprojection_loss, reference trainer.py:441-453):
  l1   = mean_c |T - P|
  ssim = clip(((1 - SSIM_k7(P, T)) / 2), 0, 1)   (reference layers.py:13-46)
  out  = w * mean_c ssim + (1 - w) * l1

Backward: custom VJP to ``preds`` only. The target is training data on
every call site (the identity stack is stop_gradient'ed wholesale and
the warped stack's target is batch color), so its cotangent is
structurally zero — the wrapper stop_gradients the target to make that
explicit. The bwd kernel recomputes the pooled stats and pushes the
three pooled cotangents back through the transposed band matrices
(B^T is the same matmul with the transposed integer matrix).

Numerics: bf16 inputs, f32 accumulation — matching the XLA bf16 path
(box_filter_reflect with bf16 inputs). Exactness tests:
tests/test_ssim_kernel.py (interpret mode vs the XLA path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfmnext_tpu.ops.image import _box_reflect_matrix

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2
_K = 7


def _bf16(x):
    return x.astype(jnp.bfloat16)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=((((a.ndim - 1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _box1_mm(x2d, my, mx):
    """Box *sum* of one [H, W] plane: (my @ X) @ mx. Returns f32."""
    return _mm(_bf16(_mm(my, x2d)), mx)


# --- VPU shift-add reflect box filter (measured SLOWER; A/B knob) ---------
# Hypothesis: the [H,H]/[W,W] band matrices burn ~880 MFLOP of MXU per
# plane for what is a 7-tap running sum; as shifted adds the filter is
# ~40 VPU passes over a VMEM-resident plane. Measured (v5e, bs8 320x1024,
# tools/micro_bench.py reproj_kernel): shift LOSES — fwd+bwd 5.98 vs
# 5.15 ms, min-fused 7.36 vs 6.26 ms. The grid pipeline hides the MXU
# matmul latency, while the 14 concat-shifted VPU passes serialize.
# Kept behind SFMNEXT_SSIM_BOX=shift as a documented negative result.
_BOX_MODE = os.environ.get("SFMNEXT_SSIM_BOX", "matmul")
_R = _K // 2  # 3


def _shift(x, d, axis):
    """Zero-padded shift: out[i] = x[i+d] (static d)."""
    if d == 0:
        return x
    h, w = x.shape
    if axis == 0:
        z = jnp.zeros((abs(d), w), x.dtype)
        return (
            jnp.concatenate([x[d:], z], 0)
            if d > 0
            else jnp.concatenate([z, x[:d]], 0)
        )
    z = jnp.zeros((h, abs(d)), x.dtype)
    return (
        jnp.concatenate([x[:, d:], z], 1)
        if d > 0
        else jnp.concatenate([z, x[:, :d]], 1)
    )


def _axis_box_reflect(x, axis):
    """7-tap reflect box sum along one axis (shift-add, f32).

    Interior rows are the plain zero-padded 7-tap sum; the 3 edge rows on
    each side add the reflected taps (torch reflect: -j -> j,
    n-1+j -> n-1-j) via row-masked shifted planes.
    """
    n = x.shape[axis]
    s = {d: _shift(x, d, axis) for d in range(-_R, _R + 1)}
    c = s[-3] + s[-2] + s[-1] + s[0] + s[1] + s[2] + s[3]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    z = jnp.float32(0.0)
    c = c + jnp.where(iota == 0, s[1] + s[2] + s[3], z)
    c = c + jnp.where(iota == 1, s[0] + s[1], z)
    c = c + jnp.where(iota == 2, s[-1], z)
    c = c + jnp.where(iota == n - 1, s[-1] + s[-2] + s[-3], z)
    c = c + jnp.where(iota == n - 2, s[0] + s[-1], z)
    c = c + jnp.where(iota == n - 3, s[1], z)
    return c


def _axis_box_reflect_t(g, axis):
    """Adjoint of _axis_box_reflect (edge taps scatter back)."""
    n = g.shape[axis]
    s = {d: _shift(g, d, axis) for d in range(-_R, _R + 1)}
    c = s[-3] + s[-2] + s[-1] + s[0] + s[1] + s[2] + s[3]
    iota = jax.lax.broadcasted_iota(jnp.int32, g.shape, axis)
    z = jnp.float32(0.0)
    m0 = jnp.where(iota == 0, g, z)
    m1 = jnp.where(iota == 1, g, z)
    m2 = jnp.where(iota == 2, g, z)
    mn1 = jnp.where(iota == n - 1, g, z)
    mn2 = jnp.where(iota == n - 2, g, z)
    mn3 = jnp.where(iota == n - 3, g, z)
    c = c + _shift(m0, -1, axis) + _shift(m0, -2, axis) + _shift(m0, -3, axis)
    c = c + m1 + _shift(m1, -1, axis)
    c = c + _shift(m2, 1, axis)
    c = c + _shift(mn1, 1, axis) + _shift(mn1, 2, axis) + _shift(mn1, 3, axis)
    c = c + mn2 + _shift(mn2, 1, axis)
    c = c + _shift(mn3, -1, axis)
    return c


def _box1(x2d, my, mx):
    """Reflect box sum; forward orientation. f32 out."""
    if _BOX_MODE == "matmul":
        return _box1_mm(x2d, my, mx)
    xf = x2d.astype(jnp.float32)
    return _axis_box_reflect(_axis_box_reflect(xf, 0), 1)


def _box1_t(g2d, myt, mxt):
    """Adjoint reflect box sum (the B^T of the backward pass)."""
    if _BOX_MODE == "matmul":
        return _box1_mm(g2d, myt, mxt)
    gf = g2d.astype(jnp.float32)
    return _axis_box_reflect_t(_axis_box_reflect_t(gf, 1), 0)


def _chan_stats(p_ch, t_ch, my, mx):
    """Pooled stats for one (pred, target) channel pair, all [H, W] f32.

    Channel-at-a-time on purpose: the whole-stack formulation allocated
    ~60 MB of f32 temporaries and blew Mosaic's 16 MB scoped-vmem stack;
    per-channel the peak live set is a handful of 1.3 MB planes.
    """
    inv_k2 = jnp.float32(1.0 / (_K * _K))
    pf = p_ch.astype(jnp.float32)
    tf = t_ch.astype(jnp.float32)
    mu_p = _box1(p_ch, my, mx) * inv_k2
    mu_t = _box1(t_ch, my, mx) * inv_k2
    sp = _box1(_bf16(pf * pf), my, mx) * inv_k2 - mu_p * mu_p
    st = _box1(_bf16(tf * tf), my, mx) * inv_k2 - mu_t * mu_t
    spt = _box1(_bf16(pf * tf), my, mx) * inv_k2 - mu_p * mu_t
    return pf, tf, mu_p, sp, spt, mu_t, st


def _ssim_terms(mu_p, sp, spt, mu_t, st):
    num = (2.0 * mu_p * mu_t + _C1) * (2.0 * spt + _C2)
    den = (mu_p * mu_p + mu_t * mu_t + _C1) * (sp + st + _C2)
    s = (1.0 - num / den) * 0.5
    return num, den, jnp.clip(s, 0.0, 1.0), s


def _fwd_only_kernel(p_ref, t_ref, my_ref, mx_ref, out_ref, *,
                     ct, weight):
    # residual-free forward for stop-gradient call sites (the identity
    # stack): skips ~5 bf16 plane stores per channel that XLA cannot DCE
    # out of a pallas_call
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    pf, tf, mu_p, sp, spt, mu_t, st = _chan_stats(
        p_ref[0, 0, 0], t_ref[0, 0], my_ref[...], mx_ref[...]
    )
    _, _, s_clip, _ = _ssim_terms(mu_p, sp, spt, mu_t, st)
    contrib = weight * s_clip + (1.0 - weight) * jnp.abs(tf - pf)
    out_ref[0, 0] += contrib * (1.0 / ct)


def _fwd_kernel(p_ref, t_ref, my_ref, mx_ref,
                out_ref, mup_ref, sp_ref, spt_ref, mut_ref, st_ref, *,
                ct, weight):
    # grid (B, n_src, ct): ONE channel per step — even channel-looped,
    # unrolled iterations kept ~28 MB live on the Mosaic scoped-vmem
    # stack (16 MB limit); per-step the live set is ~6 [H,W] planes.
    # The pooled stats are emitted as bf16 residuals so the backward
    # never recomputes the box filters (Mosaic does not reuse stack
    # slots across the stats chain — recomputing blew the stack).
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    pf, tf, mu_p, sp, spt, mu_t, st = _chan_stats(
        p_ref[0, 0, 0], t_ref[0, 0], my_ref[...], mx_ref[...]
    )
    _, _, s_clip, _ = _ssim_terms(mu_p, sp, spt, mu_t, st)
    contrib = weight * s_clip + (1.0 - weight) * jnp.abs(tf - pf)
    out_ref[0, 0] += contrib * (1.0 / ct)
    mup_ref[0, 0, 0] = _bf16(mu_p)
    sp_ref[0, 0, 0] = _bf16(sp)
    spt_ref[0, 0, 0] = _bf16(spt)
    # duplicated per source (a (bi, ci)-indexed block would be revisited
    # non-contiguously across the si grid dim, which is illegal)
    mut_ref[0, 0, 0] = _bf16(mu_t)
    st_ref[0, 0, 0] = _bf16(st)


def _bwd_kernel(p_ref, t_ref, mup_ref, sp_ref, spt_ref, mut_ref, st_ref,
                myt_ref, mxt_ref, g_ref, dp_ref, *, ct, weight):
    # Working set discipline: recomputing the pooled stats held ~19
    # [H,W] planes live and blew the 16 MB scoped-vmem stack (Mosaic
    # does not reuse stack slots across the chain). The stats arrive as
    # bf16 residuals from the forward; the chain-rule algebra runs in
    # bf16 (~0.4% relative — under the bf16 forward's own rounding),
    # with f32 only for the den division and the dp accumulator.
    inv_k2 = jnp.float32(1.0 / (_K * _K))
    pf = p_ref[0, 0, 0].astype(jnp.float32)
    tf = t_ref[0, 0].astype(jnp.float32)
    mu_p = mup_ref[0, 0, 0]
    sp = sp_ref[0, 0, 0]
    spt = spt_ref[0, 0, 0]
    mu_t = mut_ref[0, 0, 0]
    st = st_ref[0, 0, 0]
    num32, den32, _, _ = _ssim_terms(
        mu_p.astype(jnp.float32), sp.astype(jnp.float32),
        spt.astype(jnp.float32), mu_t.astype(jnp.float32),
        st.astype(jnp.float32),
    )
    g = g_ref[0, 0]                                      # [H, W] f32
    # L1 part: d|T-P|/dP = -sign(T-P), /ct channel mean
    dp = g * ((1.0 - weight) / ct) * (-jnp.sign(tf - pf))
    # SSIM part through the clip mask: s in (0,1) <=> |num| < den
    mask = (jnp.abs(num32) < den32).astype(jnp.bfloat16)
    gss = _bf16(g) * jnp.bfloat16(weight / ct) * mask
    dnum = _bf16(gss.astype(jnp.float32) * (-0.5 / den32))
    dden = _bf16(gss.astype(jnp.float32) * (0.5 * num32 / (den32 * den32)))
    # num = (2 mu_p mu_t + c1)(2 spt + c2)
    # den = (mu_p^2 + mu_t^2 + c1)(sp + st + c2)
    two = jnp.bfloat16(2.0)
    gmu = (
        dnum * two * mu_t * (two * spt + jnp.bfloat16(_C2))
        + dden * two * mu_p * (sp + st + jnp.bfloat16(_C2))
    )
    gsp = dden * (mu_p * mu_p + mu_t * mu_t + jnp.bfloat16(_C1))
    gspt = dnum * two * (two * mu_p * mu_t + jnp.bfloat16(_C1))
    # pooled-map cotangents -> input cotangent through B^T (with the
    # product rules of sp = B(P^2)/k^2 - mu_p^2 and
    # spt = B(PT)/k^2 - mu_p mu_t); fold each B^T into dp immediately
    myt = myt_ref[...]
    mxt = mxt_ref[...]
    gmu_tot = gmu - two * mu_p * gsp - mu_t * gspt
    dp = dp + _box1_t(gmu_tot, myt, mxt) * inv_k2
    dp = dp + 2.0 * pf * (_box1_t(gsp, myt, mxt) * inv_k2)
    dp = dp + tf * (_box1_t(gspt, myt, mxt) * inv_k2)
    dp_ref[0, 0, 0] = dp.astype(dp_ref.dtype)



def _call_fwd_only(p_t, t_t, my, mx, weight):
    b, n, ct, h, w = p_t.shape
    kern = functools.partial(_fwd_only_kernel, ct=ct, weight=weight)
    return pl.pallas_call(
        kern,
        grid=(b, n, ct),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, h, w), lambda bi, si, ci: (bi, si, ci, 0, 0)
            ),
            pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (bi, ci, 0, 0)),
            pl.BlockSpec((h, h), lambda bi, si, ci: (0, 0)),
            pl.BlockSpec((w, w), lambda bi, si, ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w), lambda bi, si, ci: (bi, si, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, h, w), jnp.float32),
        compiler_params=_params(),
    )(p_t, t_t, my, mx)


def _params():
    """Raise Mosaic's scoped-vmem cap for these kernels.

    The per-channel live set (a dozen [H, W] planes plus band-matrix
    matmul intermediates; Mosaic does not reuse stack slots across the
    chain) exceeds the default 16 MB scoped-vmem stack at 320x1024.
    Blocks + stack stay well under the 128 MB physical VMEM.
    """
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    except TypeError:  # older jax: TPUCompilerParams
        return pltpu.TPUCompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _call_fwd(p_t, t_t, my, mx, weight):
    b, n, ct, h, w = p_t.shape
    kern = functools.partial(_fwd_kernel, ct=ct, weight=weight)
    pred_plane = pl.BlockSpec(
        (1, 1, 1, h, w), lambda bi, si, ci: (bi, si, ci, 0, 0)
    )
    tgt_plane = pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (bi, ci, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b, n, ct),
        in_specs=[
            pred_plane,
            tgt_plane,
            pl.BlockSpec((h, h), lambda bi, si, ci: (0, 0)),
            pl.BlockSpec((w, w), lambda bi, si, ci: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (bi, si, 0, 0)),
            pred_plane, pred_plane, pred_plane,
            pred_plane, pred_plane,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, n, ct, h, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, n, ct, h, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, n, ct, h, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, n, ct, h, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, n, ct, h, w), jnp.bfloat16),
        ],
        compiler_params=_params(),
    )(p_t, t_t, my, mx)


def _call_bwd(p_t, t_t, stats, myt, mxt, g, weight):
    b, n, ct, h, w = p_t.shape
    kern = functools.partial(_bwd_kernel, ct=ct, weight=weight)
    pred_plane = pl.BlockSpec(
        (1, 1, 1, h, w), lambda bi, si, ci: (bi, si, ci, 0, 0)
    )
    tgt_plane = pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (bi, ci, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b, n, ct),
        in_specs=[
            pred_plane,
            tgt_plane,
            pred_plane, pred_plane, pred_plane,
            pred_plane, pred_plane,
            pl.BlockSpec((h, h), lambda bi, si, ci: (0, 0)),
            pl.BlockSpec((w, w), lambda bi, si, ci: (0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (bi, si, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, h, w), lambda bi, si, ci: (bi, si, ci, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, ct, h, w), p_t.dtype),
        compiler_params=_params(),
    )(p_t, t_t, *stats, myt, mxt, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _reproj_loss(p_t, t_t, mats, matst, weight: float):
    my, mx = mats
    return _call_fwd(p_t, t_t, my, mx, weight)[0]


def _vjp_fwd(p_t, t_t, mats, matst, weight):
    my, mx = mats
    out, *stats = _call_fwd(p_t, t_t, my, mx, weight)
    return out, (p_t, t_t, tuple(stats), matst)


def _vjp_bwd(weight, res, g):
    p_t, t_t, stats, (myt, mxt) = res
    dp = _call_bwd(p_t, t_t, stats, myt, mxt, g, weight)
    return dp, jnp.zeros_like(t_t), None, None


_reproj_loss.defvjp(_vjp_fwd, _vjp_bwd)


def reprojection_losses_pallas(preds, target, ssim_weight: float = 0.85,
                               need_grad: bool = True):
    """Fused drop-in for ops.losses.reprojection_losses_stacked (SSIM on).

    Args:
      preds: list of N [B,H,W,3] predictions (bf16 on the hot path).
      target: [B,H,W,3]; must be gradient-free at every call site (the
        kernel's VJP returns zero for it — stop_gradient'ed here).
    Returns:
      [B,H,W,N] f32 per-source loss maps.
    """
    n = len(preds)
    stacked = jnp.concatenate(preds, axis=-1)
    b, h, w, _ = stacked.shape
    ct = target.shape[-1]
    p_t = jnp.transpose(_bf16(stacked), (0, 3, 1, 2)).reshape(
        b, n, ct, h, w
    )
    t_t = jnp.transpose(
        _bf16(jax.lax.stop_gradient(target)), (0, 3, 1, 2)
    )
    # B(X) = M_H @ X @ M_W^T (ops.image.box_filter_reflect's einsum pair);
    # _box contracts the FIRST index of its column matrix, so the forward
    # takes M_W^T and the transpose pass B^T(G) = M_H^T @ G @ M_W takes
    # M_W untransposed. The reflection matrices are NOT symmetric at the
    # edges — the orientation matters for the first/last k//2 rows/cols.
    my = jnp.asarray(_box_reflect_matrix(h, _K), jnp.bfloat16)
    mx = jnp.asarray(_box_reflect_matrix(w, _K).T.copy(), jnp.bfloat16)
    myt = jnp.asarray(_box_reflect_matrix(h, _K).T.copy(), jnp.bfloat16)
    mxt = jnp.asarray(_box_reflect_matrix(w, _K), jnp.bfloat16)
    if need_grad:
        out = _reproj_loss(
            p_t, t_t, (my, mx), (myt, mxt), float(ssim_weight)
        )
    else:
        # stop-gradient call sites (identity/automask stack)
        out = _call_fwd_only(
            jax.lax.stop_gradient(p_t), t_t, my, mx, float(ssim_weight)
        )
    return jnp.transpose(out, (0, 2, 3, 1))


def _ident_min_kernel(p_ref, t_ref, noise_ref, r_ref, my_ref, mx_ref,
                      min_ref, arg_ref, acc_ref, *, ct, weight, n_grad):
    # grid (B, n_ident, ct): the identity (automask) stack computed
    # residual-free, fused with the min-combine. Per-source loss
    # accumulates channel-by-channel into a VMEM scratch; at the last
    # channel the (noisy) map folds into the running min/argmin blocks
    # (revisited across (si, ci) — contiguous per bi). The first source
    # also folds in the grad-kernel's reprojection maps (r_ref), so the
    # XLA min/argmin/noise passes disappear.
    si = pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    pf, tf, mu_p, sp, spt, mu_t, st = _chan_stats(
        p_ref[0, 0, 0], t_ref[0, 0], my_ref[...], mx_ref[...]
    )
    _, _, s_clip, _ = _ssim_terms(mu_p, sp, spt, mu_t, st)
    acc_ref[...] += (
        weight * s_clip + (1.0 - weight) * jnp.abs(tf - pf)
    ) * (1.0 / ct)

    @pl.when(ci == ct - 1)
    def _():
        cur = acc_ref[...] + noise_ref[0, 0]

        @pl.when(si == 0)
        def _():
            # fold the reprojection maps first (arg ids 0..n_grad-1,
            # first-wins on ties like the reference argmin), then this
            # identity map (identity takes ties — reference order is
            # [ident..., reproj...] with first-wins, trainer.py:509-530)
            rmin = r_ref[0, 0]
            rarg = jnp.zeros(rmin.shape, jnp.int32)
            for k in range(1, n_grad):
                rk = r_ref[0, k]
                bk = rk < rmin
                rarg = jnp.where(bk, k, rarg)
                rmin = jnp.where(bk, rk, rmin)
            bi_ = cur <= rmin
            min_ref[0] = jnp.where(bi_, cur, rmin)
            arg_ref[0] = jnp.where(bi_, n_grad, rarg)

        @pl.when(si > 0)
        def _():
            prev = min_ref[0]
            bk = cur <= prev
            min_ref[0] = jnp.where(bk, cur, prev)
            arg_ref[0] = jnp.where(bk, n_grad + si, arg_ref[0])


def _call_ident_min(ident_t, t_t, noise, rmaps, my, mx, weight, n_grad):
    b, n_ident, ct, h, w = ident_t.shape
    kern = functools.partial(
        _ident_min_kernel, ct=ct, weight=weight, n_grad=n_grad
    )
    plane = pl.BlockSpec(
        (1, 1, 1, h, w), lambda bi, si, ci: (bi, si, ci, 0, 0)
    )
    whole = pl.BlockSpec((1, h, w), lambda bi, si, ci: (bi, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b, n_ident, ct),
        in_specs=[
            plane,
            pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (bi, ci, 0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda bi, si, ci: (0, si, 0, 0)),
            pl.BlockSpec(
                (1, n_grad, h, w), lambda bi, si, ci: (bi, 0, 0, 0)
            ),
            pl.BlockSpec((h, h), lambda bi, si, ci: (0, 0)),
            pl.BlockSpec((w, w), lambda bi, si, ci: (0, 0)),
        ],
        out_specs=[whole, whole],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        compiler_params=_params(),
    )(ident_t, t_t, noise, rmaps, my, mx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _reproj_min(pg_t, ident_t, t_t, noise, mats, matst,
                weight: float, n_grad: int):
    my, mx = mats
    r, *_ = _call_fwd(pg_t, t_t, my, mx, weight)
    return _call_ident_min(ident_t, t_t, noise, r, my, mx, weight, n_grad)


def _min_vjp_fwd(pg_t, ident_t, t_t, noise, mats, matst, weight, n_grad):
    my, mx = mats
    r, *stats = _call_fwd(pg_t, t_t, my, mx, weight)
    mn, arg = _call_ident_min(
        ident_t, t_t, noise, r, my, mx, weight, n_grad
    )
    return (mn, arg), (pg_t, ident_t, t_t, tuple(stats), matst, arg)


def _min_vjp_bwd(weight, n_grad, res, gs):
    pg_t, ident_t, t_t, stats, (myt, mxt), arg = res
    g, _ = gs  # arg is an integer output — no cotangent
    # route the min's cotangent to the winning grad source (one cheap XLA
    # masked broadcast), then reuse the per-source bwd kernel; identity
    # winners route nowhere (their sources are stop-gradient data)
    g_src = g[:, None] * (
        arg[:, None] == jnp.arange(n_grad, dtype=jnp.int32)[None, :, None, None]
    ).astype(g.dtype)  # [B, n_grad, H, W]
    dp = _call_bwd(pg_t, t_t, stats, myt, mxt, g_src, weight)
    return (
        dp, jnp.zeros_like(ident_t), jnp.zeros_like(t_t), None, None, None
    )


_reproj_min.defvjp(_min_vjp_fwd, _min_vjp_bwd)


def reprojection_min_pallas(preds, idents, target, noise,
                            ssim_weight: float = 0.85,
                            channel_first: bool = False):
    """Fused reprojection + identity SSIM stacks + min-combine + automask.

    One kernel computes all per-source SSIM+L1 loss maps and folds them
    into a running per-pixel min in VMEM — the per-source [B,H,W,F] maps,
    the identity stack's separate kernel launch, and the XLA min/argmin
    pass never touch HBM. Semantics match ops.losses.min_reprojection_loss
    over concat([idents, preds]) with tie-break noise on the identity maps
    (reference trainer.py:509-530).

    Args:
      preds: list of N [B,H,W,3] warped predictions (gradients flow).
      idents: list of M [B,H,W,3] unwarped source frames (data).
      target: [B,H,W,3] (data).
      noise: [1,H,W,M] identity tie-break noise (or None).
    Returns:
      (to_optimise [B,H,W] f32, automask [B,H,W] f32 — 1 where a
      reprojection won).
    """
    n_grad = len(preds)
    n_ident = len(idents)
    if channel_first:
        # preds/idents/target arrive as [B,3,H,W] planes (the fused loss
        # path: the warp kernel emits channel-first, so no layout
        # transposes appear anywhere between the warp and this kernel)
        b, ct, h, w = target.shape
        pg_t = jnp.stack([_bf16(p) for p in preds], axis=1)
        ident_t = jax.lax.stop_gradient(
            jnp.stack([_bf16(s) for s in idents], axis=1)
        )
        t_t = _bf16(jax.lax.stop_gradient(target))
    else:
        stacked = jnp.concatenate(list(preds), axis=-1)
        b, h, w, _ = stacked.shape
        ct = target.shape[-1]
        pg_t = jnp.transpose(_bf16(stacked), (0, 3, 1, 2)).reshape(
            b, n_grad, ct, h, w
        )
        ident_t = jax.lax.stop_gradient(
            jnp.transpose(
                _bf16(jnp.concatenate(list(idents), axis=-1)), (0, 3, 1, 2)
            ).reshape(b, n_ident, ct, h, w)
        )
        t_t = jnp.transpose(
            _bf16(jax.lax.stop_gradient(target)), (0, 3, 1, 2)
        )
    if noise is None:
        noise_t = jnp.zeros((1, n_ident, h, w), jnp.float32)
    else:
        noise_t = noise.astype(jnp.float32).transpose(0, 3, 1, 2)
    my = jnp.asarray(_box_reflect_matrix(h, _K), jnp.bfloat16)
    mx = jnp.asarray(_box_reflect_matrix(w, _K).T.copy(), jnp.bfloat16)
    myt = jnp.asarray(_box_reflect_matrix(h, _K).T.copy(), jnp.bfloat16)
    mxt = jnp.asarray(_box_reflect_matrix(w, _K), jnp.bfloat16)
    mn, arg = _reproj_min(
        pg_t, ident_t, t_t, jax.lax.stop_gradient(noise_t),
        (my, mx), (myt, mxt), float(ssim_weight), n_grad
    )
    automask = (arg < n_grad).astype(jnp.float32)
    return mn, automask


def supports(h: int, w: int, n_src: int) -> bool:
    """VMEM sanity gate for the whole-image-per-batch blocking.

    The channel-at-a-time kernels keep ~10 live [H, W] f32 planes on the
    Mosaic scoped-vmem stack (16 MB limit); the bf16 image blocks and
    band matrices live in regular VMEM and are far from its 128 MB.
    """
    stack_mb = 10 * h * w * 4 / 1e6
    return h % 8 == 0 and w % 128 == 0 and stack_mb < 15.0
