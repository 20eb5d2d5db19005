"""Training losses: photometric reprojection, smoothness, SILog.

Behavioral reference:
  - compute_reprojection_loss  trainer.py:441-453 (0.85*SSIM + 0.15*L1)
  - min-reprojection + automask combine  trainer.py:455-549
  - get_smooth_loss  layers.py:267-280
  - SILogLoss  finetune/loss.py:24-42
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sfmnext_tpu.ops.image import ssim, ssim_multi, ssim_target_stats


def reprojection_loss(pred, target, ssim_weight: float = 0.85, use_ssim: bool = True):
    """Per-pixel photometric error [B,H,W,1]. Reference trainer.py:441-453."""
    l1 = jnp.abs(target - pred).mean(axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    ssim_err = ssim(pred, target).mean(axis=-1, keepdims=True)
    return ssim_weight * ssim_err + (1.0 - ssim_weight) * l1


def reprojection_losses_stacked(
    preds,
    target,
    ssim_weight: float = 0.85,
    use_ssim: bool = True,
    target_stats=None,
):
    """Photometric error of N predictions vs one target in one fused pass.

    Same per-pair math as :func:`reprojection_loss` (trainer.py:441-453),
    but all N predictions go through ONE channel-stacked SSIM with shared
    target statistics (see ops.image.ssim_multi) — the training hot path.

    Args:
      preds: list of N [B,H,W,3] predictions.
      target: [B,H,W,3]; target_stats: optional precomputed
        ssim_target_stats(target) shared with other calls.
    Returns:
      [B,H,W,N] per-frame loss maps.
    """
    n = len(preds)
    stacked = jnp.concatenate(preds, axis=-1)  # [B,H,W,3N]
    b, h, w, _ = stacked.shape
    tgt_n = jnp.tile(target, (1, 1, 1, n))
    l1 = jnp.abs(tgt_n - stacked).reshape(b, h, w, n, 3).mean(axis=-1)
    if not use_ssim:
        return l1
    if target_stats is None:
        target_stats = ssim_target_stats(target)
    ssim_err = (
        ssim_multi(stacked, target_stats).reshape(b, h, w, n, 3).mean(axis=-1)
    )
    return ssim_weight * ssim_err + (1.0 - ssim_weight) * l1


def _tiebreak_noise(rng, shape, dtype):
    """1e-5 gaussian tie-break (trainer.py:516-517), TPU-cheap.

    Two deviations from a naive jax.random.normal draw, both free for the
    purpose (iid-per-(pixel,channel) noise to break exact ties between
    identity and reprojection losses):
      - the draw is shared across the batch axis ([1,H,W,F] broadcast) —
        the per-pixel min never mixes batch elements, so cross-batch
        correlation is unobservable; cuts the generated bits by B;
      - bits come from the 'unsafe_rbg' generator (TPU hardware RNG path)
        instead of threefry — the r2 profile showed the threefry draw at
        ~8.5 ms/step at 320x1024.
    """
    noise_shape = (1,) + tuple(shape[1:])
    try:
        kd = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
        kd4 = jnp.concatenate([kd, kd])[:4]
        key = jax.random.wrap_key_data(kd4, impl="unsafe_rbg")
    except (AttributeError, TypeError, ValueError):  # older jax fallback
        key = rng
    return jax.random.normal(key, noise_shape, dtype) * 1e-5


def min_reprojection_loss(
    reproj_losses,
    identity_losses=None,
    rng=None,
    avg_reprojection: bool = False,
):
    """Monodepth2 min-over-frames combine with automasking.

    Args:
      reproj_losses: list of [B,H,W,1] per-source-frame photometric errors.
      identity_losses: optional list of [B,H,W,1] identity (unwarped) errors;
        when given, automasking is active (trainer.py:480-530).
      rng: PRNG key for the 1e-5 gaussian tie-break noise added to identity
        losses (trainer.py:516-517). None disables the noise (deterministic).
    Returns:
      (to_optimise [B,H,W], automask [B,H,W] or None)
    """
    reproj = jnp.concatenate(reproj_losses, axis=-1)  # [B,H,W,F]
    if avg_reprojection:
        reproj = reproj.mean(axis=-1, keepdims=True)

    if identity_losses is None:
        if reproj.shape[-1] == 1:
            return reproj[..., 0], None
        return reproj.min(axis=-1), None

    ident = jnp.concatenate(identity_losses, axis=-1)
    if avg_reprojection:
        ident = ident.mean(axis=-1, keepdims=True)
    if rng is not None:
        ident = ident + _tiebreak_noise(rng, ident.shape, ident.dtype)

    combined = jnp.concatenate([ident, reproj], axis=-1)
    to_optimise = combined.min(axis=-1)
    idxs = combined.argmin(axis=-1)
    automask = (idxs >= ident.shape[-1]).astype(reproj.dtype)  # 1 = reprojection won
    return to_optimise, automask


def edge_aware_smoothness(disp, img, compute_dtype=None):
    """Edge-aware first-order smoothness (scalar). Reference layers.py:267-280.

    Args:
      disp: [B,H,W,1] disparity/depth map (caller mean-normalizes).
      img:  [B,H,W,3] guidance image.
      compute_dtype: optional dtype for the gradient/exp math (bf16 on the
        TPU hot path — neighbor differences are exact under Sterbenz, the
        error is the 2^-8 input rounding; means accumulate f32).

    TPU shape discipline: the textbook ``x[:, :, :-1] - x[:, :, 1:]``
    forces every op in the fwd+bwd chain onto W-1/H-1-wide arrays —
    off the (8,128) vreg tiling, so XLA re-pads around each one
    (measured 16.4 ms fwd+bwd at bs8 320x1024). Full-width rolls with a
    masked sum keep the whole chain tile-aligned (0.9 ms); the masked
    mean divides by the true (W-1)/(H-1) counts so the value matches.
    """
    if compute_dtype is not None:
        disp = disp.astype(compute_dtype)
        img = img.astype(compute_dtype)
    b, h, w, _ = disp.shape

    def shifted(x, axis):
        return jnp.roll(x, -1, axis=axis)

    grad_disp_x = jnp.abs(disp - shifted(disp, 2))
    grad_disp_y = jnp.abs(disp - shifted(disp, 1))
    grad_img_x = jnp.abs(img - shifted(img, 2)).mean(-1, keepdims=True)
    grad_img_y = jnp.abs(img - shifted(img, 1)).mean(-1, keepdims=True)

    sx = (grad_disp_x * jnp.exp(-grad_img_x)).astype(jnp.float32)
    sy = (grad_disp_y * jnp.exp(-grad_img_y)).astype(jnp.float32)
    # zero the wrap-around column/row, then mean over the valid counts
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    sx = jnp.where(col < w - 1, sx, 0.0)
    sy = jnp.where(row < h - 1, sy, 0.0)
    return (
        sx.sum() / (b * h * (w - 1))
        + sy.sum() / (b * (h - 1) * w)
    )


def silog_loss(pred, target, mask=None, variance_focus: float = 0.85):
    """Scale-invariant log loss: 10*sqrt(var(g) + 0.15*mean(g)^2).

    Reference finetune/loss.py:24-42 (beta=0.15 <=> variance_focus=0.85).
    """
    if mask is not None:
        # Masked statistics with a static shape: weight by the mask.
        m = mask.astype(pred.dtype)
        n = m.sum() + 1e-7
        g = (jnp.log(jnp.where(mask, pred, 1.0)) - jnp.log(jnp.where(mask, target, 1.0))) * m
        mean_g = g.sum() / n
        var_g = (g * g).sum() / n - mean_g * mean_g
    else:
        g = jnp.log(pred) - jnp.log(target)
        mean_g = g.mean()
        var_g = g.var()
    return 10.0 * jnp.sqrt(var_g + (1.0 - variance_focus) * mean_g * mean_g)


def compute_pairwise_loss(tgt_img, ref_img, tgt_depth, ref_depth, pose,
                          intrinsics, ssim_weight: float = 0.85,
                          use_pallas: bool = False):
    """SC-Depth pairwise photometric/geometric terms (layers.py:343-371).

    Returns (diff_img, diff_color, diff_depth, valid_mask), each [B,H,W,1].
    """
    from sfmnext_tpu.ops.warp import inverse_warp

    warped, projected_depth, computed_depth = inverse_warp(
        ref_img, tgt_depth, ref_depth, pose, intrinsics,
        padding_mode="zeros", use_pallas=use_pallas,
    )
    diff_depth = jnp.abs(computed_depth - projected_depth) / (
        computed_depth + projected_depth
    )

    valid = (
        (jnp.abs(warped).mean(-1, keepdims=True) > 1e-3)
        & (jnp.abs(tgt_img).mean(-1, keepdims=True) > 1e-3)
    ).astype(tgt_img.dtype)
    diff_color = jnp.abs(tgt_img - warped).mean(-1, keepdims=True)
    ident = jnp.abs(tgt_img - ref_img).mean(-1, keepdims=True)
    valid = valid * (diff_color < ident).astype(tgt_img.dtype)

    diff_img = jnp.clip(jnp.abs(tgt_img - warped), 0, 1)
    diff_img = (1.0 - ssim_weight) * diff_img + ssim_weight * ssim(tgt_img, warped)
    diff_img = diff_img.mean(-1, keepdims=True)
    diff_img = diff_img * jax.lax.stop_gradient(1.0 - diff_depth)
    return diff_img, diff_color, diff_depth, valid


def mean_on_mask(diff, valid_mask, min_count: int = 100):
    """Masked mean, zero when too few valid pixels (layers.py:374-380)."""
    s = valid_mask.sum()
    return jnp.where(
        s > min_count, (diff * valid_mask).sum() / jnp.maximum(s, 1.0), 0.0
    )


def photo_and_geometry_loss(tgt_img, ref_imgs, tgt_depth, ref_depths,
                            intrinsics, poses, poses_inv,
                            ssim_weight: float = 0.85,
                            use_pallas: bool = False):
    """SC-Depth bidirectional loss (layers.py:302-340): both warp directions
    per reference frame, argmin frame selection by color diff."""
    diff_imgs, diff_colors, diff_depths, valids = [], [], [], []
    for ref_img, ref_depth, pose, pose_inv in zip(
        ref_imgs, ref_depths, poses, poses_inv
    ):
        for a_img, b_img, a_d, b_d, p in (
            (tgt_img, ref_img, tgt_depth, ref_depth, pose),
            (ref_img, tgt_img, ref_depth, tgt_depth, pose_inv),
        ):
            di, dc, dd, vm = compute_pairwise_loss(
                a_img, b_img, a_d, b_d, p, intrinsics, ssim_weight,
                use_pallas=use_pallas,
            )
            diff_imgs.append(di)
            diff_colors.append(dc)
            diff_depths.append(dd)
            valids.append(vm)

    diff_img = jnp.concatenate(diff_imgs, -1)
    diff_color = jnp.concatenate(diff_colors, -1)
    diff_depth = jnp.concatenate(diff_depths, -1)
    valid = jnp.concatenate(valids, -1)

    idx = jnp.argmin(diff_color, axis=-1, keepdims=True)
    take = lambda x: jnp.take_along_axis(x, idx, axis=-1)
    photo = mean_on_mask(take(diff_img), take(valid))
    geo = mean_on_mask(take(diff_depth), take(valid))
    return photo, geo


def l2_loss(pred, target, mask=None):
    """MSE alternate to SILog (finetune/loss.py:7-21)."""
    if mask is not None:
        m = mask.astype(pred.dtype)
        return (((pred - target) ** 2) * m).sum() / jnp.maximum(m.sum(), 1.0)
    return ((pred - target) ** 2).mean()


def bins_chamfer_loss(bin_edges, target_depth, valid_mask=None):
    """Bin-centers chamfer regularizer (finetune/loss.py:45-63, AdaBins).

    The reference needs pytorch3d (import commented out); here: masked
    symmetric chamfer between bin centers [B,D+1->D] and target depths.
    """
    centers = 0.5 * (bin_edges[:, 1:] + bin_edges[:, :-1])  # [B,D]
    b = centers.shape[0]
    tgt = target_depth.reshape(b, -1)  # [B,N]
    if valid_mask is None:
        valid_mask = tgt >= 1e-3
    else:
        valid_mask = valid_mask.reshape(b, -1)
    m = valid_mask.astype(centers.dtype)
    big = 1e9
    d2 = (centers[:, :, None] - tgt[:, None, :]) ** 2  # [B,D,N]
    d2_masked = jnp.where(valid_mask[:, None, :], d2, big)
    # centers -> nearest target
    c2t = d2_masked.min(axis=2).mean(axis=1)
    # targets -> nearest center (masked mean)
    t2c = (d2.min(axis=1) * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    return (c2t + t2c).mean()
