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
    only data-dependent scalar;
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

Backward: custom VJP. Cotangents flow to the *coordinates* (the
depth/pose path); the source image is training data, so its cotangent is
zero. Use the XLA grid_sample wherever image gradients are required
(e.g. the indoor depth_ref warp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BAND = 32   # vertical source window per output row (multiple of 8)
XWIN = 384  # horizontal source window per output slab (multiple of 128)


def _row_setup(fy_row, fx_row, h, w):
    """Clamped corner indices + weights for one output row ([W] vectors)."""
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


def _y_window(y0, band, h):
    """Adaptive vertical window start for one output row (8-aligned).

    Data-dependent (min over the row's source rows): rotation shifts a
    whole row's sources together, so the *spread* within a row stays
    small (< band-2, asserted by the assumption test) even when the
    absolute displacement is tens of rows. This is the kernel's only
    data-dependent scalar; the x window is static per slab.
    """
    y_base = jnp.clip((jnp.min(y0) // 8) * 8, 0, max(h - band, 0))
    return pl.multiple_of(y_base, 8)


def _x_window(s, xwin, w):
    """Static horizontal window start for output slab s (python int)."""
    return max(0, min(w - xwin, (s - 1) * LANES))


def _fwd_kernel(img_ref, fy_ref, fx_ref, out_ref, *, rows, h, w, c):
    n_slabs = w // LANES
    band = min(BAND, h)
    xwin = min(XWIN, w)
    for i in range(rows):
        y0, x0, wy, wx = _row_setup(fy_ref[0, i], fx_ref[0, i], h, w)
        y_base = _y_window(y0, band, h)
        # displacements beyond the window clamp to its edge (see docstring)
        y_rel = jnp.clip(y0 - y_base, 0, band - 2)
        for s in range(n_slabs):
            sl = slice(s * LANES, (s + 1) * LANES)
            yr, xl = y_rel[sl], x0[sl]
            wys, wxs = wy[sl], wx[sl]
            x_base = _x_window(s, xwin, w)
            xlw = jnp.clip(xl - x_base, 0, xwin - 2)
            # fold the vertical lerp into one weight map:
            # out = lerp_x(sum_r wmap[r] * merged[r])
            riota = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0)
            wmap = jnp.where(riota == yr[None, :], (1 - wys)[None, :], 0.0)
            wmap = jnp.where(riota == (yr + 1)[None, :], wys[None, :], wmap)
            for ch in range(c):
                win = img_ref[
                    0, ch, pl.ds(y_base, band), x_base : x_base + xwin
                ]
                left = jnp.sum(wmap * _gather_pos(win, xlw, xwin), axis=0)
                right = jnp.sum(wmap * _gather_pos(win, xlw + 1, xwin), axis=0)
                out_ref[0, ch, i, sl] = left * (1 - wxs) + right * wxs


def _bwd_kernel(img_ref, fy_ref, fx_ref, g_ref, dfy_ref, dfx_ref,
                *, rows, h, w, c):
    n_slabs = w // LANES
    band = min(BAND, h)
    xwin = min(XWIN, w)
    for i in range(rows):
        fy_row = fy_ref[0, i]
        fx_row = fx_ref[0, i]
        y0, x0, wy, wx = _row_setup(fy_row, fx_row, h, w)
        y_base = _y_window(y0, band, h)
        y_rel = jnp.clip(y0 - y_base, 0, band - 2)
        for s in range(n_slabs):
            sl = slice(s * LANES, (s + 1) * LANES)
            yr, xl = y_rel[sl], x0[sl]
            wys, wxs = wy[sl], wx[sl]
            x_base = _x_window(s, xwin, w)
            xlw = jnp.clip(xl - x_base, 0, xwin - 2)
            riota = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0)
            sel0 = (riota == yr[None, :]).astype(fy_row.dtype)
            sel1 = (riota == (yr + 1)[None, :]).astype(fy_row.dtype)
            dfy = jnp.zeros((LANES,), fy_row.dtype)
            dfx = jnp.zeros((LANES,), fx_row.dtype)
            for ch in range(c):
                win = img_ref[
                    0, ch, pl.ds(y_base, band), x_base : x_base + xwin
                ]
                ml = _gather_pos(win, xlw, xwin)
                mr = _gather_pos(win, xlw + 1, xwin)
                v00 = jnp.sum(sel0 * ml, axis=0)
                v01 = jnp.sum(sel0 * mr, axis=0)
                v10 = jnp.sum(sel1 * ml, axis=0)
                v11 = jnp.sum(sel1 * mr, axis=0)
                g = g_ref[0, ch, i, sl]
                dfy = dfy + g * ((v10 - v00) * (1 - wxs) + (v11 - v01) * wxs)
                dfx = dfx + g * ((v01 - v00) * (1 - wys) + (v11 - v10) * wys)
            # clamped (border) regions have zero gradient (torch semantics)
            in_y = ((fy_row[sl] > 0.0) & (fy_row[sl] < h - 1)).astype(dfy.dtype)
            in_x = ((fx_row[sl] > 0.0) & (fx_row[sl] < w - 1)).astype(dfx.dtype)
            dfy_ref[0, i, sl] = dfy * in_y
            dfx_ref[0, i, sl] = dfx * in_x


def _call_fwd(img, fy, fx, rows_per_step: int):
    b, h, w, c = img.shape
    img_t = jnp.transpose(img, (0, 3, 1, 2))  # [B,C,H,W]: lanes = W
    grid = (b, fy.shape[1] // rows_per_step)
    kern = functools.partial(_fwd_kernel, rows=rows_per_step, h=h, w=w, c=c)
    out_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_step, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_step, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, rows_per_step, w), lambda bi, ri: (bi, 0, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, fy.shape[1], w), img.dtype),
    )(img_t, fy, fx)
    return jnp.transpose(out_t, (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def warp_border_pallas(img, fy, fx, rows_per_step: int = 8):
    """Bilinear border-mode sample of img [B,H,W,C] at pixel coords
    fy/fx [B,Ho,W] (unnormalized). Coordinates get gradients; img doesn't."""
    return _call_fwd(img, fy, fx, rows_per_step)


def _vjp_fwd(img, fy, fx, rows_per_step):
    return _call_fwd(img, fy, fx, rows_per_step), (img, fy, fx)


def _vjp_bwd(rows_per_step, res, g):
    img, fy, fx = res
    b, h, w, c = img.shape
    grid = (b, fy.shape[1] // rows_per_step)
    kern = functools.partial(_bwd_kernel, rows=rows_per_step, h=h, w=w, c=c)
    img_t = jnp.transpose(img, (0, 3, 1, 2))
    g_t = jnp.transpose(g, (0, 3, 1, 2))
    dfy, dfx = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_step, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_step, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, rows_per_step, w), lambda bi, ri: (bi, 0, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows_per_step, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_step, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(fy.shape, fy.dtype),
            jax.ShapeDtypeStruct(fx.shape, fx.dtype),
        ],
    )(img_t, fy, fx, g_t)
    return jnp.zeros_like(img), dfy, dfx


warp_border_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def grid_sample_pallas(img, grid_norm, align_corners: bool = True):
    """Drop-in for ops.warp.grid_sample(padding_mode='border') on TPU.

    grid_norm: [B,Ho,Wo,2] normalized (x,y) in [-1,1]; Wo must be a
    multiple of 128 and H a multiple of 8.
    """
    b, h, w, c = img.shape
    gx = grid_norm[..., 0]
    gy = grid_norm[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    return warp_border_pallas(img, fy, fx, 8)
