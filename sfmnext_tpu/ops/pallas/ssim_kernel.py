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


def _box1(x2d, my, mx):
    """Box *sum* of one [H, W] plane: (my @ X) @ mx. Returns f32."""
    return _mm(_bf16(_mm(my, x2d)), mx)


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
    dp = dp + _box1(gmu_tot, myt, mxt) * inv_k2
    dp = dp + 2.0 * pf * (_box1(gsp, myt, mxt) * inv_k2)
    dp = dp + tf * (_box1(gspt, myt, mxt) * inv_k2)
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


def supports(h: int, w: int, n_src: int) -> bool:
    """VMEM sanity gate for the whole-image-per-batch blocking.

    The channel-at-a-time kernels keep ~10 live [H, W] f32 planes on the
    Mosaic scoped-vmem stack (16 MB limit); the bf16 image blocks and
    band matrices live in regular VMEM and are far from its 128 MB.
    """
    stack_mb = 10 * h * w * 4 / 1e6
    return h % 8 == 0 and w % 128 == 0 and stack_mb < 15.0
