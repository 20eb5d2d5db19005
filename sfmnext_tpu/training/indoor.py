"""Indoor self-supervised pipeline (NYUv2 / MannequinChallenge).

Behavioral reference: trainer_indoor.py —
  - rectify_imgs                                    :877-924
    RectifyNet pre-warps each neighbor to cancel camera shake; two
    auxiliary losses: rotation-consistency |rot3 - sg(rot1)| and the
    triplet hinge relu(|rot2| - |rot1| + 0.05).
  - per-ref-frame depth passes ("depth_ref")        :371-377
  - generate_images_pred (+pred_dep sampling)       :506-598
  - compute_losses_with_occ                         :615-719
    occlusion weight mask 1 - sqrt(1 - (d-1)^2) with
    d = |com - proj| / (com + proj), plus an L1 depth-consistency
    regularizer (reg_wt) and valid masks.
  - photo_and_geometry_loss_imp                     :926-1012
    SC-Depth-style masked photometric + geometric losses with argmin
    frame selection by raw color diff.

Note: the reference's ``com_depth`` is consumed by
compute_pairwise_loss_imp (:981) but its producer is commented out
(:586-593) — we implement the previously-active variant: the z-channel of
the target points projected into the ref camera (ProjectDepth).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from sfmnext_tpu.config import Options
from sfmnext_tpu.ops import geometry, losses as L
from sfmnext_tpu.ops.image import resize_bilinear, ssim
from sfmnext_tpu.ops.warp import grid_sample, inverse_rotation_warp
from sfmnext_tpu.training.builder import ModelBundle
from sfmnext_tpu.training.pipeline import _apply, predict_poses


def rectify_references(models, params, batch_stats, tgt, refs, K3, train,
                       use_pallas: bool = False):
    """RectifyNet pre-warp + consistency/triplet losses (ref :877-924)."""
    stats = {"rectify": batch_stats.get("rectify")}

    def rect(a, b):
        out, stats["rectify"] = _apply(
            models.rectify, params["rectify"], stats["rectify"], a, b,
            train=train,
        )
        return out

    warped, rc_terms, rt_terms = [], [], []
    for ref in refs:
        rot1 = rect(tgt, ref)
        ref_w = inverse_rotation_warp(ref, rot1, K3, use_pallas=use_pallas)
        rot2 = rect(tgt, ref_w)
        rot3 = rect(jax.lax.stop_gradient(ref_w), ref)
        rc_terms.append(jnp.abs(rot3 - jax.lax.stop_gradient(rot1)).mean())
        rt_terms.append(
            jnp.maximum(jnp.abs(rot2) - jnp.abs(rot1) + 0.05, 0.0).mean()
        )
        warped.append(ref_w)
    loss_rc = jnp.mean(jnp.stack(rc_terms))
    loss_rt = jnp.mean(jnp.stack(rt_terms))
    return warped, loss_rc, loss_rt, stats["rectify"]


def _depth_forward(models, params, batch_stats, img, rng, train):
    feats, bs_enc = _apply(
        models.encoder, params["encoder"], batch_stats.get("encoder"), img,
        train=train,
    )
    out, _ = _apply(
        models.depth, params["depth"], batch_stats.get("depth"), feats,
        train=train, rng=rng,
    )
    return out["disp0"], bs_enc


def forward_indoor(models: ModelBundle, params, batch_stats, batch, rng,
                   opt: Options):
    """Indoor loss pipeline. Returns (total_loss, aux) like pipeline.forward."""
    train = models.train
    rngs = (
        jax.random.split(rng, 5) if rng is not None else [None] * 5
    )
    frame_ids = [f for f in opt.all_frame_ids if f != "s"]
    b, f, h, w, _ = batch["color"].shape

    # 1. target depth
    depth_half, bs_enc = _depth_forward(
        models, params, batch_stats, batch["color_aug"][:, 0], rngs[0], train
    )
    depth = resize_bilinear(depth_half, (h, w), align_corners=False)
    new_batch_stats = dict(batch_stats)
    new_batch_stats["encoder"] = bs_enc

    outputs: Dict[str, Any] = {"depth": depth, "depth_half": depth_half}

    refs = [batch["color"][:, i] for i in range(1, len(frame_ids))]

    # banded Pallas kernel with full gradients for every indoor warp
    # (rectified refs and depth_refs carry parameter gradients, so image
    # cotangents run through the scatter kernel); XLA fallback off-TPU
    up = opt.use_pallas and train and jax.default_backend() == "tpu"

    # 2. rectification
    loss_rc = loss_rt = None
    if opt.use_rectify_net and models.rectify is not None:
        K3 = batch["K3x3"] if "K3x3" in batch else batch["K"][:, :3, :3]
        refs, loss_rc, loss_rt, bs_rect = rectify_references(
            models, params, batch_stats, batch["color"][:, 0], refs, K3,
            train, use_pallas=up,
        )
        new_batch_stats["rectify"] = bs_rect

    # 3. poses (pairs, posecnn; temporal ordering as outdoor). The indoor
    # pose net sees RAW target color and the (rectified when rectify is
    # on) reference frames — NOT color_aug (trainer_indoor.py:439-444).
    pose_frames = jnp.stack([batch["color"][:, 0], *refs], axis=1)
    poses = predict_poses(
        models, params, batch, frame_ids, pose_frames=pose_frames
    )

    inv_depth = 1.0 / depth
    mean_inv_depth = inv_depth.mean(axis=(1, 2, 3))

    need_geo = opt.use_photo_geo_loss or opt.use_improved_mini_reproj_loss

    # 4. per-ref depth passes (ref :371-377) on the (rectified) color frames.
    # Encoder BN running stats thread through these passes sequentially —
    # the reference updates them on every train-mode forward
    # (trainer_indoor.py:371-377), not just the target-frame pass.
    depth_refs = []
    if need_geo:
        for i, ref in enumerate(refs):
            d_half, bs_enc = _depth_forward(
                models, params,
                {**batch_stats, "encoder": bs_enc}, ref, rngs[1 + i], train,
            )
            depth_refs.append(
                resize_bilinear(d_half, (h, w), align_corners=False)
            )
        new_batch_stats["encoder"] = bs_enc

    # 5. warps
    K, inv_K = batch["K"], batch["inv_K"]
    target = batch["color"][:, 0]
    warped_colors, pred_deps, com_deps = [], [], []
    for i, f_i in enumerate(frame_ids[1:]):
        aa, t, inv = poses[f_i]
        if opt.pose_model_type == "posecnn" and not opt.use_stereo:
            t = t * mean_inv_depth[:, None]
        T = geometry.transformation_from_parameters(aa, t, invert=inv)

        cam_points = geometry.backproject_depth(depth, inv_K)
        pix = geometry.project_3d(cam_points, K, T, h, w)
        warped_colors.append(
            grid_sample(
                refs[i], pix, padding_mode="border", align_corners=True,
                use_pallas=up,
            )
        )
        if need_geo:
            pred_deps.append(
                grid_sample(
                    depth_refs[i], pix, padding_mode="border",
                    align_corners=True, use_pallas=up,
                )
            )
            com_deps.append(geometry.project_depth(cam_points, K, T, h, w))
        outputs[f"warped_{f_i}"] = warped_colors[-1]

    metrics: Dict[str, Any] = {}
    total = 0.0

    # loss dispatch mirrors trainer_indoor.py:380-416: inside the
    # photo_geo branch, --use_mini_reprojection_loss overrides back to the
    # plain monodepth2 min-reprojection loss (:384-385)
    if opt.use_photo_geo_loss and not opt.use_mini_reprojection_loss:
        photo, geo = photo_and_geometry_loss_imp(
            target,
            [batch["color"][:, 1 + i] for i in range(len(refs))],
            warped_colors, depth_refs, pred_deps, com_deps, opt,
        )
        smooth = _norm_smooth(depth, target)
        total = (
            opt.loss_photo_weight * photo
            + opt.loss_geo_weight * geo
            + opt.disparity_smoothness * smooth
        )
        metrics.update(
            {"loss/photo": photo, "loss/geo": geo, "loss/smooth": smooth}
        )
    elif opt.use_improved_mini_reproj_loss and not opt.use_photo_geo_loss:
        total, parts = compute_losses_with_occ(
            target, batch, warped_colors, pred_deps, depth, depth_half,
            frame_ids, rngs[3] if train else None, opt,
        )
        metrics.update(parts)
    else:
        # plain monodepth2 min-reprojection (outdoor-style)
        reproj = [
            L.reprojection_loss(wc, target, opt.ssim_weight, not opt.no_ssim)
            for wc in warped_colors
        ]
        ident = None
        if not opt.disable_automasking:
            ident = [
                L.reprojection_loss(
                    batch["color"][:, 1 + i], target, opt.ssim_weight,
                    not opt.no_ssim,
                )
                for i in range(len(refs))
            ]
        to_opt, _ = L.min_reprojection_loss(
            reproj, ident, rng=rngs[3] if train else None
        )
        smooth = _norm_smooth(depth, target)
        total = to_opt.mean() + opt.disparity_smoothness * smooth
        metrics.update({"loss/smooth": smooth})

    if loss_rc is not None:
        total = total + opt.loss_rc_weight * loss_rc + opt.loss_rt_weight * loss_rt
        metrics.update({"loss/rc": loss_rc, "loss/rt": loss_rt})

    metrics["loss"] = total
    return total, {
        "outputs": outputs,
        "metrics": metrics,
        "batch_stats": new_batch_stats,
    }


def _norm_smooth(depth, color):
    mean_d = depth.mean(axis=(1, 2, 3), keepdims=True)
    return L.edge_aware_smoothness(depth / (mean_d + 1e-7), color)


def compute_losses_with_occ(target, batch, warped_colors, pred_deps, depth,
                            depth_half, frame_ids, rng, opt: Options):
    """Occlusion-weighted min-reprojection (ref :615-719)."""
    reproj, l1_reg = [], []
    for i, f_i in enumerate(frame_ids[1:]):
        pred = warped_colors[i]
        valid = (
            jnp.abs(pred).mean(-1, keepdims=True) > 1e-3
        ).astype(pred.dtype)
        err = L.reprojection_loss(pred, target, opt.ssim_weight, not opt.no_ssim)
        projected = pred_deps[i]
        computed = depth  # ref :642 uses the target depth map here
        d = jnp.abs(computed - projected) / (computed + projected)
        l1_reg.append(d * valid)
        # occlusion weight: 1 - sqrt(1 - (d-1)^2), d in [0,1] (ref :649)
        wmask = jax.lax.stop_gradient(
            1.0 - jnp.sqrt(jnp.clip(1.0 - (d - 1.0) ** 2, 0.0, 1.0))
        )
        reproj.append(err * wmask * valid)

    ident = None
    if not opt.disable_automasking:
        ident = [
            L.reprojection_loss(
                batch["color"][:, 1 + i], target, opt.ssim_weight,
                not opt.no_ssim,
            )
            for i in range(len(frame_ids) - 1)
        ]
    to_opt, _ = L.min_reprojection_loss(
        reproj, ident, rng=rng, avg_reprojection=opt.avg_reprojection
    )
    l1_loss = jnp.concatenate(l1_reg, -1).mean()

    # smoothness at decoder (half) resolution with downsampled color (:701-712)
    bh, hh, wh, _ = depth_half.shape
    color_small = resize_bilinear(target, (hh, wh), align_corners=False)
    mean_d = depth_half.mean(axis=(1, 2, 3), keepdims=True)
    smooth = L.edge_aware_smoothness(
        depth_half / (mean_d + 1e-7), color_small
    )

    total = (
        to_opt.mean() + opt.reg_wt * l1_loss + opt.disparity_smoothness * smooth
    )
    return total, {
        "loss/reprojection": to_opt.mean(),
        "loss/l1_reg": l1_loss,
        "loss/smooth": smooth,
    }


def photo_and_geometry_loss_imp(target, raw_refs, warped_colors, depth_refs,
                                pred_deps, com_deps, opt: Options):
    """Masked photo + geometry losses with argmin frame select (ref :926-1012)."""
    diff_imgs, diff_colors, valid_masks, geo_diffs = [], [], [], []
    for ref, warped, d_ref, proj, com in zip(
        raw_refs, warped_colors, depth_refs, pred_deps, com_deps
    ):
        d = jnp.abs(com - proj) / (com + proj)
        geo = jnp.abs(com - d_ref).mean(-1, keepdims=True)

        valid = (
            (jnp.abs(warped).mean(-1, keepdims=True) > 1e-3)
            & (jnp.abs(target).mean(-1, keepdims=True) > 1e-3)
        ).astype(target.dtype)
        diff_color = jnp.abs(target - warped).mean(-1, keepdims=True)
        ident_err = jnp.abs(target - ref).mean(-1, keepdims=True)
        valid = valid * (diff_color < ident_err).astype(target.dtype)

        di = jnp.clip(jnp.abs(target - warped), 0, 1)
        di = (
            opt.l1_weight * di + opt.ssim_weight * ssim(target, warped)
        ).mean(-1, keepdims=True)
        w = jax.lax.stop_gradient(1.0 - d)
        diff_imgs.append(di * w)
        geo_diffs.append(geo * w)
        diff_colors.append(diff_color)
        valid_masks.append(valid)

    diff_img = jnp.concatenate(diff_imgs, -1)
    diff_color = jnp.concatenate(diff_colors, -1)
    valid = jnp.concatenate(valid_masks, -1)
    geo = jnp.concatenate(geo_diffs, -1)

    idx = jnp.argmin(diff_color, axis=-1, keepdims=True)
    take = lambda x: jnp.take_along_axis(x, idx, axis=-1)
    diff_img, valid, geo = take(diff_img), take(valid), take(geo)

    def mean_on_mask(x, m):
        # ref layers.py:374-380: zero when mask too small
        s = m.sum()
        return jnp.where(s > 100, (x * m).sum() / jnp.maximum(s, 1.0), 0.0)

    return mean_on_mask(diff_img, valid), mean_on_mask(geo, valid)
