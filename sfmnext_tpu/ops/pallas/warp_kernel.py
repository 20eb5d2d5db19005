"""Pallas TPU kernel: banded bilinear warp (grid_sample, border mode).

Why: XLA's gather costs ~3 ns/index on v5e regardless of formulation —
the full-res photometric warps (2.6M samples each) dominated the whole
train step (~70 ms per warp of a ~190 ms loss section). This kernel keeps
the source image in VMEM and resolves samples with lane-local dynamic
gathers, exploiting the structure of view-synthesis warps: **sources lie
in a narrow displacement band around the output pixel**.

Mechanics (per output row / channel / 128-lane slab):
  * vertical: a BAND-row window dynamically sliced at the row's minimum
    source y (sublane-aligned) — rotation shifts a whole row's sources
    together, so the within-row *spread* stays small even when the
    absolute displacement is tens of rows;
  * horizontal: a *static* XWIN-lane window centered on the output slab
    (sources sit within ~±128 px of their output column), so x-window
    addresses are compile-time constants — the row min is the kernel's
    only data-dependent scalar, and it is computed OUTSIDE the kernel
    and delivered via scalar prefetch (SMEM) so the VPU pipeline never
    flushes into a scalar read;
  * `take_along_axis` along lanes picks x-columns (Mosaic lane gather
    handles one vreg, hence the 128-wide slab split; each output slab
    scans the window's XWIN/128 source slabs with an xhi mask, merged
    BEFORE the band reduction);
  * the source row within the band resolves via an iota==dy one-hot
    weight map that also folds in the vertical lerp weights.

Exactness: matches ops.warp.grid_sample(border, align_corners) except
when one output row's vertical source spread exceeds BAND-2 rows, or a
sample's horizontal displacement exceeds the static window (guaranteed
dx coverage [-128, +126] at XWIN=384) — such samples clamp to the
window edge. SSL warps here are near-identity (pose ~0.01-scale; see
the assumption tests in tests/test_pallas_warp.py); the XLA path
remains the reference implementation and the eval default.

Backward: custom VJPs.
  * warp_border_pallas — cotangents flow to the *coordinates* only (the
    outdoor SSL path: the sampled source image is training data, its
    cotangent is identically zero, so the scatter is skipped).
  * warp_sample_pallas — full gradients: coordinates via the gather-
    structured kernel, image via a banded one-hot-matmul scatter kernel
    (_bwd_img_kernel) that accumulates each output slab's contributions
    into its [BAND, XWIN] source window with two small MXU matmuls.
    Supports zeros padding (torch semantics) — out-of-image corners
    vanish because their band/window one-hots match nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANES = 128
# vertical source window per output row (multiple of 8). Every gather,
# one-hot merge and band reduction in the kernels is O(BAND), so this is
# the kernel's main work knob; the window start is aligned down to a
# multiple of 8, so BAND=N guarantees N-9 rows of within-row source
# spread headroom (the assumption tests pin the actual spread).
# SFMNEXT_WARP_BAND for tuning sweeps.
BAND = int(os.environ.get("SFMNEXT_WARP_BAND", "32"))
# horizontal source window per output slab. Must stay >=384: window
# starts are lane-aligned ((s-1)*128), so 384 is the smallest width that
# guarantees symmetric +-128 px coverage for every lane of the slab.
XWIN = 384
# rows per grid step (unroll factor; SFMNEXT_WARP_ROWS for tuning sweeps)
ROWS = int(os.environ.get("SFMNEXT_WARP_ROWS", "8"))


def _row_setup(fy_row, fx_row, h, w, zeros: bool = False):
    """Corner indices + weights for one output row ([W] vectors).

    border: coords clamp into the image (torch border semantics).
    zeros: raw floor/frac — out-of-image corners later vanish naturally
    because their band/window one-hots match nothing (torch zeros
    semantics, including partial-corner falloff at the image edge).
    """
    if zeros:
        y0f = jnp.floor(fy_row)
        x0f = jnp.floor(fx_row)
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        wy = fy_row - y0f
        wx = fx_row - x0f
        return y0, x0, wy, wx
    fyc = jnp.clip(fy_row, 0.0, h - 1)
    fxc = jnp.clip(fx_row, 0.0, w - 1)
    y0 = jnp.clip(jnp.floor(fyc), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fxc), 0, w - 2).astype(jnp.int32)
    wy = fyc - y0
    wx = fxc - x0
    return y0, x0, wy, wx


def _gather_pos(win, xs, xwin):
    """Gather win[:, xs[j]] for each output lane j -> [band, LANES].

    The xhi mask merges the window's slabs BEFORE any band reduction —
    the merged map then needs only one one-hot reduction per corner row
    instead of one per (position, source slab).
    """
    band = win.shape[0]
    xhi = xs // LANES
    xlo = jnp.broadcast_to((xs % LANES)[None, :], (band, LANES))
    merged = jnp.zeros((band, LANES), win.dtype)
    for src in range(xwin // LANES):
        cand = jnp.take_along_axis(
            win[:, src * LANES : (src + 1) * LANES], xlo, axis=1
        )
        merged = merged + (xhi == src).astype(win.dtype) * cand
    return merged


def _y_bases(fy, h, band, zeros: bool):
    """Adaptive vertical window starts, one per output row (8-aligned).

    Data-dependent (min over each row's source rows): rotation shifts a
    whole row's sources together, so the *spread* within a row stays
    small (< band-2, asserted by the assumption test) even when the
    absolute displacement is tens of rows. Computed OUTSIDE the kernel
    (one XLA min-reduce over fy) and handed in through scalar prefetch:
    deriving the slice scalar from a VPU min inside the kernel forced a
    vector->scalar pipeline flush per row that dominated kernel time
    (the BAND/XWIN/rows_per_step sweeps never moved it). y0 may be out
    of image range in zeros mode — clamp only the window placement (the
    one-hot selects still use the raw relative index).

    Returns int32 [B, Ho] window starts; mirrors _row_setup's per-mode y0.
    """
    if zeros:
        y0 = jnp.floor(fy).astype(jnp.int32)
    else:
        fyc = jnp.clip(fy, 0.0, h - 1)
        y0 = jnp.clip(jnp.floor(fyc), 0, h - 2).astype(jnp.int32)
    ymin = jnp.min(jnp.clip(y0, 0, h - 1), axis=-1)  # [B, Ho]
    return jnp.clip((ymin // 8) * 8, 0, max(h - band, 0)).astype(jnp.int32)


def _read_y_base(yb_ref, i, rows: int, row_axis: int = 1):
    """Current row's prefetched window start (SMEM scalar read)."""
    r = pl.program_id(row_axis) * rows + i
    return pl.multiple_of(yb_ref[pl.program_id(0), r], 8)


def _x_window(s, xwin, w):
    """Static horizontal window start for output slab s (python int)."""
    return max(0, min(w - xwin, (s - 1) * LANES))


def _rel(idx, base, size, zeros: bool):
    """Window-relative corner index along one axis.

    border: clamp into the window (border/window-clamp semantics).
    zeros: raw — out-of-window indices make every band/slab one-hot miss,
    which zeroes the contribution (exactly the zeros-padding value).
    """
    if zeros:
        return idx - base
    return jnp.clip(idx - base, 0, size - 2)


def _fwd_kernel(yb_ref, img_ref, fy_ref, fx_ref, out_ref, *, rows, h, w, c,
                zeros: bool = False):
    n_slabs = w // LANES
    band = min(BAND, h)
    xwin = min(XWIN, w)
    for i in range(rows):
        y0, x0, wy, wx = _row_setup(fy_ref[0, i], fx_ref[0, i], h, w, zeros)
        y_base = _read_y_base(yb_ref, i, rows)
        y_rel = _rel(y0, y_base, band, zeros)
        for s in range(n_slabs):
            sl = slice(s * LANES, (s + 1) * LANES)
            yr, xl = y_rel[sl], x0[sl]
            wys, wxs = wy[sl], wx[sl]
            x_base = _x_window(s, xwin, w)
            xlw = _rel(xl, x_base, xwin, zeros)
            # fold the vertical lerp into one weight map:
            # out = lerp_x(sum_r wmap[r] * merged[r])
            riota = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0)
            wmap = jnp.where(riota == yr[None, :], (1 - wys)[None, :], 0.0)
            wmap = jnp.where(riota == (yr + 1)[None, :], wys[None, :], wmap)
            # ALL channels ride one gather set: the [C, band, xwin] window
            # flattens to [C*band, xwin] (leading-dim merge is free) so
            # each take_along/mask-merge handles 3x the rows in one
            # instruction stream instead of a per-channel loop.
            # NOTE a bf16 image would halve the gather vregs, but Mosaic's
            # dynamic_gather requires the index and result bitwidths to
            # match (i32 lanes) — bf16 windows don't compile here, so
            # images stay f32.
            win3 = img_ref[
                0, :, pl.ds(y_base, band), x_base : x_base + xwin
            ].reshape(c * band, xwin)
            ml = _gather_pos(win3, xlw, xwin).reshape(c, band, LANES)
            mr = _gather_pos(win3, xlw + 1, xwin).reshape(c, band, LANES)
            left = jnp.sum(wmap[None] * ml, axis=1)    # [C, LANES]
            right = jnp.sum(wmap[None] * mr, axis=1)
            out_ref[0, :, i, sl] = (
                left * (1 - wxs)[None] + right * wxs[None]
            ).astype(out_ref.dtype)


def _bwd_kernel(yb_ref, img_ref, fy_ref, fx_ref, g_ref, dfy_ref, dfx_ref,
                *, rows, h, w, c, zeros: bool = False):
    n_slabs = w // LANES
    band = min(BAND, h)
    xwin = min(XWIN, w)
    for i in range(rows):
        fy_row = fy_ref[0, i]
        fx_row = fx_ref[0, i]
        y0, x0, wy, wx = _row_setup(fy_row, fx_row, h, w, zeros)
        y_base = _read_y_base(yb_ref, i, rows)
        y_rel = _rel(y0, y_base, band, zeros)
        for s in range(n_slabs):
            sl = slice(s * LANES, (s + 1) * LANES)
            yr, xl = y_rel[sl], x0[sl]
            wys, wxs = wy[sl], wx[sl]
            x_base = _x_window(s, xwin, w)
            xlw = _rel(xl, x_base, xwin, zeros)
            riota = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0)
            sel0 = (riota == yr[None, :]).astype(fy_row.dtype)
            sel1 = (riota == (yr + 1)[None, :]).astype(fy_row.dtype)
            # channel-stacked gathers (see _fwd_kernel)
            win3 = img_ref[
                0, :, pl.ds(y_base, band), x_base : x_base + xwin
            ].reshape(c * band, xwin)
            ml = _gather_pos(win3, xlw, xwin).reshape(c, band, LANES)
            mr = _gather_pos(win3, xlw + 1, xwin).reshape(c, band, LANES)
            v00 = jnp.sum(sel0[None] * ml, axis=1)   # [C, LANES]
            v01 = jnp.sum(sel0[None] * mr, axis=1)
            v10 = jnp.sum(sel1[None] * ml, axis=1)
            v11 = jnp.sum(sel1[None] * mr, axis=1)
            g = g_ref[0, :, i, sl]                   # [C, LANES]
            dfy = jnp.sum(
                g * ((v10 - v00) * (1 - wxs)[None] + (v11 - v01) * wxs[None]),
                axis=0,
            )
            dfx = jnp.sum(
                g * ((v01 - v00) * (1 - wys)[None] + (v11 - v10) * wys[None]),
                axis=0,
            )
            if not zeros:
                # clamped (border) coords have zero gradient (torch)
                dfy = dfy * (
                    (fy_row[sl] > 0.0) & (fy_row[sl] < h - 1)
                ).astype(dfy.dtype)
                dfx = dfx * (
                    (fx_row[sl] > 0.0) & (fx_row[sl] < w - 1)
                ).astype(dfx.dtype)
            dfy_ref[0, i, sl] = dfy
            dfx_ref[0, i, sl] = dfx


def _bwd_img_kernel(yb_ref, fy_ref, fx_ref, g_ref, dimg_ref, *, rows, h, w, c,
                    zeros: bool = False):
    """Image cotangent: banded scatter via one-hot MXU matmuls.

    dimg[y,x] = sum over output pixels sampling (y,x) of g * bilinear
    weight. The scatter transposes the gather's band structure: for each
    output (row, slab), contributions land in the same [band, xwin]
    window, assembled as sel0^T @ (u0*Z) + sel1^T @ (u1*Z) where Z is
    the one-hot x-placement matrix carrying the horizontal lerp weights
    — two small [band,128]x[128,xwin] matmuls per (row, slab, channel)
    instead of millions of XLA scatter indices (~3 ns each on v5e).
    The [1,C,H,W] output block is revisited across the row grid and
    accumulated in VMEM (zeroed at the first row step).
    """
    n_slabs = w // LANES
    band = min(BAND, h)
    xwin = min(XWIN, w)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dimg_ref[...] = jnp.zeros(dimg_ref.shape, dimg_ref.dtype)

    # static block loads; rows are picked by one-hot inside the loop
    # (Mosaic rejects dynamic loads at unaligned row offsets)
    fy_all = fy_ref[0]  # [rows, w]
    fx_all = fx_ref[0]
    g_all = g_ref[0, 0]

    def row_body(i, carry):
        riota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
        pick = (riota_r == i).astype(fy_all.dtype)
        fy_row = jnp.sum(fy_all * pick, axis=0)
        fx_row = jnp.sum(fx_all * pick, axis=0)
        g_row = jnp.sum(g_all * pick.astype(g_all.dtype), axis=0)
        y0, x0, wy, wx = _row_setup(fy_row, fx_row, h, w, zeros)
        y_base = _read_y_base(yb_ref, i, rows, row_axis=2)
        y_rel = _rel(y0, y_base, band, zeros)
        for s in range(n_slabs):
            sl = slice(s * LANES, (s + 1) * LANES)
            yr, xl = y_rel[sl], x0[sl]
            wys, wxs = wy[sl], wx[sl]
            x_base = _x_window(s, xwin, w)
            xlw = _rel(xl, x_base, xwin, zeros)

            riota = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0)
            sel0 = (riota == yr[None, :]).astype(wys.dtype)
            sel1 = (riota == (yr + 1)[None, :]).astype(wys.dtype)
            xiota = jax.lax.broadcasted_iota(jnp.int32, (LANES, xwin), 1)
            z = jnp.zeros((LANES, xwin), wxs.dtype)
            z = jnp.where(xiota == xlw[:, None], (1 - wxs)[:, None], z)
            z = jnp.where(xiota == (xlw + 1)[:, None], wxs[:, None], z)
            g = g_row[sl]
            # one fused matmul: both corner rows ride a K=2*LANES
            # contraction ([band,256] @ [256,xwin]) instead of two
            # half-K matmuls — the scatter is small-matmul latency-bound
            sel = jnp.concatenate([sel0, sel1], axis=1)
            m = jnp.concatenate(
                [(g * (1 - wys))[:, None] * z, (g * wys)[:, None] * z],
                axis=0,
            )
            contrib = jax.lax.dot_general(
                sel, m,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dimg_ref[
                0, 0, pl.ds(y_base, band), x_base : x_base + xwin
            ] += contrib.astype(dimg_ref.dtype)
        return carry

    # fori_loop (not an unrolled python loop): temporaries are reused
    # across rows, keeping the one-hot matrices off the scoped-vmem stack
    jax.lax.fori_loop(0, rows, row_body, 0)


def _call_bwd_img(fy, fx, g, img_shape, img_dtype, rows_per_step: int,
                  zeros: bool):
    b, h, w, c = img_shape
    # channel is a grid dim so the revisited VMEM accumulator block is a
    # single [1,1,H,W] plane (a [1,C,H,W] block blew the scoped-vmem cap)
    grid = (b, c, fy.shape[1] // rows_per_step)
    kern = functools.partial(
        _bwd_img_kernel, rows=rows_per_step, h=h, w=w, c=c, zeros=zeros
    )
    g_t = jnp.transpose(g, (0, 3, 1, 2))
    yb = _y_bases(fy, h, min(BAND, h), zeros)
    dimg_t = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ci, ri, yb_: (bi, ri, 0)),
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ci, ri, yb_: (bi, ri, 0)),
                pl.BlockSpec((1, 1, rows_per_step, w),
                             lambda bi, ci, ri, yb_: (bi, ci, ri, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, h, w), lambda bi, ci, ri, yb_: (bi, ci, 0, 0),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), img_dtype),
    )(yb, fy, fx, g_t)
    return jnp.transpose(dimg_t, (0, 2, 3, 1))


def _call_fwd(img, fy, fx, rows_per_step: int, zeros: bool = False,
              img_nchw: bool = False, out_nchw: bool = False):
    if img_nchw:
        bt, c, h, w = img.shape
        b = bt
        img_t = img
    else:
        b, h, w, c = img.shape
        img_t = jnp.transpose(img, (0, 3, 1, 2))  # [B,C,H,W]: lanes = W
    grid = (b, fy.shape[1] // rows_per_step)
    kern = functools.partial(
        _fwd_kernel, rows=rows_per_step, h=h, w=w, c=c, zeros=zeros
    )
    yb = _y_bases(fy, h, min(BAND, h), zeros)
    out_t = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, c, h, w), lambda bi, ri, yb_: (bi, 0, 0, 0)),
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, ri, 0)),
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, ri, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, c, rows_per_step, w), lambda bi, ri, yb_: (bi, 0, ri, 0),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, fy.shape[1], w), img.dtype),
    )(yb, img_t, fy, fx)
    if out_nchw:
        return out_t
    return jnp.transpose(out_t, (0, 2, 3, 1))


def _call_bwd_coords(img, fy, fx, g, rows_per_step: int, zeros: bool,
                     nchw: bool = False):
    if nchw:
        b, c, h, w = img.shape
        img_t, g_t = img, g
    else:
        b, h, w, c = img.shape
        img_t = jnp.transpose(img, (0, 3, 1, 2))
        g_t = jnp.transpose(g, (0, 3, 1, 2))
    grid = (b, fy.shape[1] // rows_per_step)
    kern = functools.partial(
        _bwd_kernel, rows=rows_per_step, h=h, w=w, c=c, zeros=zeros
    )
    yb = _y_bases(fy, h, min(BAND, h), zeros)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, c, h, w), lambda bi, ri, yb_: (bi, 0, 0, 0)),
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, ri, 0)),
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, ri, 0)),
                pl.BlockSpec((1, c, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, 0, ri, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, ri, 0)),
                pl.BlockSpec((1, rows_per_step, w),
                             lambda bi, ri, yb_: (bi, ri, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(fy.shape, fy.dtype),
            jax.ShapeDtypeStruct(fx.shape, fx.dtype),
        ],
    )(yb, img_t, fy, fx, g_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def warp_border_pallas(img, fy, fx, rows_per_step: int = 8,
                       nchw: bool = False):
    """Bilinear border-mode sample of img at pixel coords fy/fx [B,Ho,W]
    (unnormalized). Coordinates get gradients; img doesn't (outdoor SSL
    path: the source image is training data).

    nchw=False: img [B,H,W,C] -> out [B,Ho,W,C] (layout transposes inside).
    nchw=True: img [B,C,H,W] -> out [B,C,Ho,W] and the output cotangent is
    consumed channel-first too — the fused loss path keeps every tensor in
    channel planes so NO transposes appear between the warp and the
    reprojection kernels."""
    return _call_fwd(img, fy, fx, rows_per_step, img_nchw=nchw,
                     out_nchw=nchw)


def _vjp_fwd(img, fy, fx, rows_per_step, nchw):
    out = _call_fwd(img, fy, fx, rows_per_step, img_nchw=nchw,
                    out_nchw=nchw)
    return out, (img, fy, fx)


def _vjp_bwd(rows_per_step, nchw, res, g):
    img, fy, fx = res
    dfy, dfx = _call_bwd_coords(
        img, fy, fx, g, rows_per_step, zeros=False, nchw=nchw
    )
    return jnp.zeros_like(img), dfy, dfx


warp_border_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def warp_sample_pallas(img, fy, fx, zeros: bool = False,
                       rows_per_step: int = 8):
    """Bilinear sample with FULL gradients (image + coordinates).

    zeros=False: border padding; zeros=True: torch zeros padding
    (out-of-image corners contribute 0, with bilinear edge falloff).
    The image cotangent runs as a banded one-hot-matmul scatter kernel
    (_bwd_img_kernel) — use this wherever the sampled tensor carries
    gradients (indoor depth_ref warps, rectified-frame warps)."""
    return _call_fwd(img, fy, fx, rows_per_step, zeros=zeros)


def _vjp_full_fwd(img, fy, fx, zeros, rows_per_step):
    return _call_fwd(img, fy, fx, rows_per_step, zeros=zeros), (img, fy, fx)


def _vjp_full_bwd(zeros, rows_per_step, res, g):
    img, fy, fx = res
    dfy, dfx = _call_bwd_coords(img, fy, fx, g, rows_per_step, zeros=zeros)
    dimg = _call_bwd_img(
        fy, fx, g, img.shape, img.dtype, rows_per_step, zeros=zeros
    )
    return dimg, dfy, dfx


warp_sample_pallas.defvjp(_vjp_full_fwd, _vjp_full_bwd)


def grid_sample_pallas(img, grid_norm, align_corners: bool = True,
                       padding_mode: str = "border",
                       image_grad: bool = False, nchw: bool = False):
    """Drop-in for ops.warp.grid_sample on TPU (border or zeros padding).

    grid_norm: [B,Ho,Wo,2] normalized (x,y) in [-1,1]; Wo must be a
    multiple of 128 and H a multiple of 8. With image_grad=True (or
    zeros padding) the full-gradient kernel is used; otherwise the
    cheaper coords-only VJP (the image cotangent is dropped).
    """
    h, w = (img.shape[2], img.shape[3]) if nchw else (img.shape[1], img.shape[2])
    gx = grid_norm[..., 0]
    gy = grid_norm[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    zeros = padding_mode == "zeros"
    if image_grad or zeros:
        assert not nchw, "nchw layout is only plumbed for the border path"
        return warp_sample_pallas(img, fy, fx, zeros, ROWS)
    return warp_border_pallas(img, fy, fx, ROWS, nchw)
