"""Image ops: resize, padding, pooling, SSIM. NHWC layout, pure functions.

Behavioral reference: /root/reference/layers.py (SSIM at :13-46, k=7) and the
torch ``F.interpolate`` bilinear semantics used in trainer.py:395-396
(align_corners=False) and networks/resnet_encoder.py:115 (align_corners=True).

TPU-first design: bilinear resizes at static shapes are expressed as two
small dense matmuls (separable row/col interpolation). XLA folds the
interpolation-weight matrices into constants and runs the contraction on the
MXU — no gathers, no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """Dense [dst, src] 1-D linear-interpolation matrix (two nonzeros/row).

    align_corners=True : x_src = i * (src-1)/(dst-1)
    align_corners=False: x_src = (i + 0.5) * src/dst - 0.5, edge-clamped
    (matches torch F.interpolate bilinear in both modes; no antialias).
    """
    if src == dst:
        return np.eye(dst, dtype=np.float32)
    i = np.arange(dst, dtype=np.float64)
    if align_corners and dst > 1:
        x = i * (src - 1) / (dst - 1)
    else:
        x = (i + 0.5) * src / dst - 0.5
    x = np.clip(x, 0.0, src - 1)
    x0 = np.floor(x).astype(np.int64)
    x1 = np.minimum(x0 + 1, src - 1)
    w1 = x - x0
    w0 = 1.0 - w1
    m = np.zeros((dst, src), dtype=np.float32)
    m[np.arange(dst), x0] += w0
    m[np.arange(dst), x1] += w1
    return m


def resize_bilinear(x, out_hw, align_corners: bool = False):
    """Bilinear resize of [B,H,W,C] (or [H,W,C]) to out_hw=(H',W').

    Exact match to torch ``F.interpolate(mode='bilinear')`` for both
    align_corners settings (no antialiasing — torch doesn't antialias either).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    my = jnp.asarray(_interp_matrix(h, oh, align_corners))
    mx = jnp.asarray(_interp_matrix(w, ow, align_corners))
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # Feature-map path (DecoderBN upsamples 512-ch pyramids through
        # here): single-pass bf16 matmuls with f32 accumulation. The
        # interp weights round to bf16 (~2^-8) — activation-grade, and
        # 3x fewer MXU passes + half the HBM bytes vs the f32/HIGH path
        # (the last decoder stage's W-einsum alone is ~171 GFLOP at bs8).
        y = jnp.einsum(
            "oh,bhwc->bowc", my.astype(jnp.bfloat16), x,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        y = jnp.einsum(
            "pw,bowc->bopc", mx.astype(jnp.bfloat16), y,
            preferred_element_type=jnp.float32,
        )
        return (y[0] if squeeze else y).astype(dtype)
    # HIGH (3-pass bf16) keeps the interpolation weights at f32 accuracy
    # (~2^-22 relative) at half the MXU passes of HIGHEST — pixel-
    # coordinate-grade math (depth maps, eval resizes) stays on this path
    hi = jax.lax.Precision.HIGH
    if c == 1:
        # single-channel (depth) resize: squeeze the trailing dim so the
        # einsums are two clean GEMMs instead of (b*oh) [W',W]@[W,1]
        # matvecs the TPU dot emitter handles poorly
        x2 = x[..., 0].astype(jnp.float32)
        y = jnp.einsum("oh,bhw->bow", my, x2, precision=hi)
        y = jnp.einsum("pw,bow->bop", mx, y, precision=hi).astype(dtype)
        y = y[..., None]
        return y[0] if squeeze else y
    y = jnp.einsum("oh,bhwc->bowc", my, x.astype(jnp.float32), precision=hi)
    y = jnp.einsum("pw,bowc->bopc", mx, y, precision=hi).astype(dtype)
    return y[0] if squeeze else y


def resize_nearest(x, out_hw):
    """Nearest-neighbor resize of [B,H,W,C] to out_hw (torch 'nearest')."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    iy = (np.arange(oh) * h // oh).astype(np.int32)
    ix = (np.arange(ow) * w // ow).astype(np.int32)
    return x[:, jnp.asarray(iy)][:, :, jnp.asarray(ix)]


def reflection_pad_2d(x, pad: int):
    """Reflection-pad [B,H,W,C] by `pad` on each spatial side.

    Matches torch nn.ReflectionPad2d (edge not repeated).
    """
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool_same(x, k: int):
    """k x k average pool, stride 1, VALID, on [B,H,W,C].

    Implemented as two separable depthwise convolutions (k x 1 then 1 x k)
    — on TPU these lower to efficient convs instead of a 49-tap
    reduce_window.
    """
    c = x.shape[-1]
    dtype = x.dtype
    kern_h = jnp.full((k, 1, 1, 1), 1.0 / k, dtype)
    kern_w = jnp.full((1, k, 1, 1), 1.0 / k, dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, jnp.tile(kern_h, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    y = jax.lax.conv_general_dilated(
        y, jnp.tile(kern_w, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return y


@functools.lru_cache(maxsize=64)
def _box_reflect_matrix(n: int, k: int) -> np.ndarray:
    """[n, n] matrix M with y = M @ x == k-tap box *sum* over x with
    reflection padding (edge not repeated), same-size output.

    Entries are small integers (0/1, 2 where reflection doubles a tap) —
    exactly representable in bf16 — so callers scale by 1/k afterwards.
    """
    pad = k // 2
    m = np.zeros((n, n), dtype=np.float32)
    for dj in range(-pad, pad + 1):
        j = np.arange(n) + dj
        j = np.where(j < 0, -j, j)
        j = np.where(j >= n, 2 * n - 2 - j, j)
        np.add.at(m, (np.arange(n), j), 1.0)
    return m


def box_filter_reflect(x, k: int):
    """k x k average with reflection padding, [B,H,W,C] -> float32.

    TPU-first: the separable box filter runs as two dense [H,H] / [W,W]
    matmuls on the MXU instead of depthwise convolutions on the VPU —
    ~10x faster at 320x1024 despite the nominal FLOP waste, because the
    MXU is otherwise idle during the loss stage. The reflection pad is
    folded into the filter matrices (no materialized padded copy).

    Accumulation is always f32 (the SSIM sigma terms cancel
    catastrophically otherwise); bf16 inputs ride the native-bf16 MXU
    path, f32 inputs use 3-pass bf16 (~f32-accurate: the filter matrix
    entries are small integers, exact in bf16, and only k taps per row
    are nonzero).
    """
    b, h, w, c = x.shape
    my = jnp.asarray(_box_reflect_matrix(h, k), x.dtype)
    mx = jnp.asarray(_box_reflect_matrix(w, k), x.dtype)
    prec = jax.lax.Precision.HIGH if x.dtype == jnp.float32 else None
    y = jnp.einsum(
        "oh,bhwc->bowc", my, x, precision=prec,
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum(
        "pw,bowc->bopc", mx, y, precision=prec,
        preferred_element_type=jnp.float32,
    )
    return y * jnp.float32(1.0 / (k * k))


def ssim_target_stats(target, k: int = 7):
    """Precompute the target-side SSIM window statistics once.

    The training loss evaluates SSIM of several predictions against the SAME
    target (2 warped + 2 identity frames per step, trainer.py:474-488) — the
    target's mu/sigma account for 2 of the 5 pooled maps per pair and are
    identical across pairs. Returns (target, mu_t, sigma_t).
    """
    mu_t = box_filter_reflect(target, k)
    sigma_t = box_filter_reflect(target * target, k) - mu_t * mu_t
    return target, mu_t, sigma_t


def ssim_multi(preds, target_stats, k: int = 7, c1: float = 0.01 ** 2,
               c2: float = 0.03 ** 2):
    """SSIM distance of N channel-stacked predictions vs one target.

    TPU-first: all N predictions ride ONE set of pooling matmuls (channel
    count 3N instead of N separate 3-channel passes) and the target
    statistics are shared — 3N+2 pooled maps in 3 box-filter calls.

    Args:
      preds: [B,H,W,3N] stacked predictions.
      target_stats: output of :func:`ssim_target_stats`.
    Returns:
      [B,H,W,3N] dissimilarity map (same math as :func:`ssim` per group).
    """
    tgt, mu_t, sigma_t = target_stats
    n = preds.shape[-1] // tgt.shape[-1]

    mu_p = box_filter_reflect(preds, k)
    sigma_p = box_filter_reflect(preds * preds, k) - mu_p * mu_p
    tgt_n = jnp.tile(tgt, (1, 1, 1, n))
    sigma_pt = box_filter_reflect(preds * tgt_n, k) - mu_p * jnp.tile(
        mu_t, (1, 1, 1, n)
    )

    mu_t_n = jnp.tile(mu_t, (1, 1, 1, n))
    sigma_t_n = jnp.tile(sigma_t, (1, 1, 1, n))
    ssim_n = (2 * mu_p * mu_t_n + c1) * (2 * sigma_pt + c2)
    ssim_d = (mu_p * mu_p + mu_t_n * mu_t_n + c1) * (sigma_p + sigma_t_n + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def ssim(x, y, k: int = 7, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """SSIM *distance* map: clamp((1 - SSIM)/2, 0, 1).

    Reference layers.py:13-46 — note this repo uses k=7 (monodepth2 uses 3)
    with reflection padding, so the output is same-size as the input.

    Args:
      x, y: [B,H,W,C] images in [0,1].
    Returns:
      [B,H,W,C] dissimilarity map.
    """
    mu_x = box_filter_reflect(x, k)
    mu_y = box_filter_reflect(y, k)
    sigma_x = box_filter_reflect(x * x, k) - mu_x * mu_x
    sigma_y = box_filter_reflect(y * y, k) - mu_y * mu_y
    sigma_xy = box_filter_reflect(x * y, k) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)
