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

from sfmnext_tpu.ops.image import ssim


def reprojection_loss(pred, target, ssim_weight: float = 0.85, use_ssim: bool = True):
    """Per-pixel photometric error [B,H,W,1]. Reference trainer.py:441-453."""
    l1 = jnp.abs(target - pred).mean(axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    ssim_err = ssim(pred, target).mean(axis=-1, keepdims=True)
    return ssim_weight * ssim_err + (1.0 - ssim_weight) * l1


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
        ident = ident + jax.random.normal(rng, ident.shape, ident.dtype) * 1e-5

    combined = jnp.concatenate([ident, reproj], axis=-1)
    to_optimise = combined.min(axis=-1)
    idxs = combined.argmin(axis=-1)
    automask = (idxs >= ident.shape[-1]).astype(reproj.dtype)  # 1 = reprojection won
    return to_optimise, automask


def edge_aware_smoothness(disp, img):
    """Edge-aware first-order smoothness (scalar). Reference layers.py:267-280.

    Args:
      disp: [B,H,W,1] disparity/depth map (caller mean-normalizes).
      img:  [B,H,W,3] guidance image.
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    grad_disp_y = jnp.abs(disp[:, :-1] - disp[:, 1:])

    grad_img_x = jnp.abs(img[:, :, :-1] - img[:, :, 1:]).mean(-1, keepdims=True)
    grad_img_y = jnp.abs(img[:, :-1] - img[:, 1:]).mean(-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return grad_disp_x.mean() + grad_disp_y.mean()


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
