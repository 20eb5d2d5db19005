"""Pallas TPU kernel: fused torchvision-style ColorJitter.

Why: the XLA augmentation path (data/augment.py) vmaps a 4-step
``lax.switch`` chain over the batch — under vmap every step evaluates
ALL four branches (brightness/contrast/saturation/hue) and selects, so
the full HSV round-trip runs 4x and every step round-trips the whole
[B,F,H,W,3] image through HBM (~16 materialized passes). Measured
~7 ms/step at bs8 320x1024 (floor-corrected) — pure augmentation
overhead on the train step.

Fused here: one grid step per (batch, frame) holds the image's three
[H, W] channel planes in VMEM and applies the per-sample op sequence
in place. The op order and factors arrive via scalar prefetch (SMEM);
``pl.when`` branches execute ONLY the selected op per step, and
non-jittered samples (the 50% coin) copy through without touching the
VPU. HBM traffic drops to one read + one write.

Numerics: identical formulas to data/augment.py (torchvision
ColorJitter semantics — same grayscale weights, clamp after every op,
HSV hue shift). f32 throughout; the only tolerated difference vs the
XLA path is reduction order in the contrast grayscale mean.

Behavioral reference: torchvision ColorJitter as used by the reference
at datasets/mono_dataset.py:177-180 (brightness/contrast/saturation
0.8-1.2, hue +-0.1, random op order per item, same jitter for all
frames of an item). Exactness tests: tests/test_jitter_kernel.py
(interpret mode vs the XLA path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GR, _GG, _GB = 0.299, 0.587, 0.114


def _gray(r, g, b):
    return _GR * r + _GG * g + _GB * b


def _clip01(x):
    return jnp.clip(x, 0.0, 1.0)


def _hue_shift(r, g, b, shift):
    """RGB -> HSV -> (h + shift) -> RGB, same math as data/augment.py."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta > 0, h, 0.0)

    h = (h + shift) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    ii = i.astype(jnp.int32) % 6

    def pick(cases):
        out = cases[5]
        for idx in range(4, -1, -1):
            out = jnp.where(ii == idx, cases[idx], out)
        return out

    ro = pick([v, q, p, p, t, v])
    go = pick([t, v, v, q, p, p])
    bo = pick([p, p, t, v, v, q])
    return _clip01(ro), _clip01(go), _clip01(bo)


def _kernel(ops_ref, fac_ref, img_ref, out_ref):
    # grid (B, F); img/out blocks [1, 1, 3, H, W]; ops_ref [B, 5] int32
    # (order[4], do_jit), fac_ref [B, 4] f32 (fb, fc, fs, fh) in SMEM.
    bi = pl.program_id(0)
    do_jit = ops_ref[bi, 4]

    @pl.when(do_jit == 0)
    def _():
        out_ref[...] = img_ref[...]

    @pl.when(do_jit == 1)
    def _():
        out_ref[...] = img_ref[...]
        for j in range(4):
            op = ops_ref[bi, j]

            @pl.when(op == 0)
            def _():  # brightness: x * f, clamp
                out_ref[...] = _clip01(out_ref[...] * fac_ref[bi, 0])

            @pl.when(op == 1)
            def _():  # contrast: blend with this frame's grayscale mean
                fc = fac_ref[bi, 1]
                mean = jnp.mean(
                    _gray(out_ref[0, 0, 0], out_ref[0, 0, 1], out_ref[0, 0, 2])
                )
                out_ref[...] = _clip01(
                    fc * out_ref[...] + (1.0 - fc) * mean
                )

            @pl.when(op == 2)
            def _():  # saturation: blend with per-pixel grayscale
                fs = fac_ref[bi, 2]
                gray = _gray(
                    out_ref[0, 0, 0], out_ref[0, 0, 1], out_ref[0, 0, 2]
                )
                for c in range(3):
                    out_ref[0, 0, c] = _clip01(
                        fs * out_ref[0, 0, c] + (1.0 - fs) * gray
                    )

            @pl.when(op == 3)
            def _():  # hue: HSV shift
                ro, go, bo = _hue_shift(
                    out_ref[0, 0, 0], out_ref[0, 0, 1], out_ref[0, 0, 2],
                    fac_ref[bi, 3],
                )
                out_ref[0, 0, 0] = ro
                out_ref[0, 0, 1] = go
                out_ref[0, 0, 2] = bo


def _params():
    """Raise Mosaic's scoped-vmem cap: the hue chain holds ~12 live [H,W]
    f32 planes (Mosaic does not reuse stack slots across the chain), just
    over the default 16 MB at 320x1024. Well under physical VMEM."""
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    except TypeError:  # older jax: TPUCompilerParams
        return pltpu.TPUCompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def color_jitter_pallas(color, order, factors, do_jit):
    """Fused ColorJitter over a batch of frame stacks.

    Args:
      color: [B, F, H, W, 3] f32 in [0, 1].
      order: [B, 4] int32 — per-sample op order (permutation of 0..3:
        brightness, contrast, saturation, hue).
      factors: [B, 4] f32 — (fb, fc, fs, fh).
      do_jit: [B] bool — samples with False copy through untouched
        (bit-exact, selected inside the kernel).
    Returns:
      [B, F, H, W, 3] f32 jittered stack.
    """
    img = jnp.transpose(color, (0, 1, 4, 2, 3))  # [B,F,3,H,W]
    return color_jitter_pallas_cf(img, order, factors, do_jit)


def color_jitter_pallas_cf(img, order, factors, do_jit):
    """Same as :func:`color_jitter_pallas` but takes the channel-first
    stack [B,F,3,H,W] directly — augment_batch reuses this transpose as
    the ``color_cf`` planes the fused loss path consumes, so the layout
    conversion happens exactly once per step."""
    b, f, _, h, w = img.shape
    ops = jnp.concatenate(
        [order.astype(jnp.int32), do_jit.astype(jnp.int32)[:, None]], axis=1
    )
    fac = factors.astype(jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, f),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 3, h, w), lambda bi, fi, ops_, fac_: (bi, fi, 0, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 3, h, w), lambda bi, fi, ops_, fac_: (bi, fi, 0, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(img.shape, jnp.float32),
        compiler_params=_params(),
    )(ops, fac, img)
    return jnp.transpose(out, (0, 1, 3, 4, 2))


def supports(h: int, w: int) -> bool:
    """One whole frame's 3 channel planes must sit comfortably in VMEM."""
    return h % 8 == 0 and w % 128 == 0 and (3 * h * w * 4) < 24e6
