"""The self-supervised forward + loss pipeline (the jitted hot path).

Behavioral reference (outdoor trainer, trainer.py):
  - process_batch        :266-299  (encoder -> SQL decoder -> poses -> warp -> loss)
  - predict_poses        :301-361  (pairs mode, temporal ordering, invert for past)
  - generate_images_pred :386-439  (upsample depth, mean-inv-depth-scaled T for
                                    posecnn+mono, backproject/project/grid-sample)
  - compute_losses       :455-549  (SSIM+L1 0.85/0.15, identity + randn tie-break,
                                    per-pixel min, automask, edge-aware smoothness)

Everything here is a pure function of (params, batch_stats, batch, rng) and
is traced once under jit over the device mesh. Batch layout NHWC; frames
stacked on a leading frame axis: batch['color'] is [B, F, H, W, 3] with
F indexing opt.all_frame_ids.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sfmnext_tpu.config import Options
from sfmnext_tpu.ops import geometry, losses as L, metrics as M
from sfmnext_tpu.ops.image import resize_bilinear
from sfmnext_tpu.ops.warp import warp_frame
from sfmnext_tpu.training.builder import ModelBundle


def _apply(model, params, batch_stats, *args, train: bool, rng=None):
    """Apply a flax module, handling batch_stats mutability and dropout rng."""
    variables = {"params": params}
    has_bn = batch_stats is not None and jax.tree_util.tree_leaves(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": rng} if rng is not None else None
    if train and has_bn:
        out, updated = model.apply(
            variables, *args, rngs=rngs, mutable=["batch_stats"]
        )
        return out, updated["batch_stats"]
    return model.apply(variables, *args, rngs=rngs), batch_stats


def predict_poses(
    models: ModelBundle,
    params,
    batch,
    frame_ids,
    batch_stats=None,
    opt: Options | None = None,
    shared_feats: Dict[Any, jnp.ndarray] | None = None,
    pose_frames=None,
) -> Dict[Any, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Pose nets over frames (trainer.py:301-361).

    pairs mode (default): one forward per temporally-ordered source pair.
      posecnn: raw pair through PoseCNN; separate_resnet: pair through a
      2-image ResNet-18 + PoseDecoder (:324-325); shared: the target/source
      depth-encoder feature maps through PoseDecoder (:311-313).
    'all' mode: a single forward over every temporal frame predicting all
      poses at once (:339-360; note the reference applies no inversion for
      past frames in this mode — kept).

    ``pose_frames`` overrides the net's image inputs ([B,F,H,W,3] aligned
    with frame_ids) — the indoor trainer feeds raw/rectified color instead
    of color_aug (trainer_indoor.py:439-444).
    Returns {frame_id: (axisangle [B,3], translation [B,3], invert flag)}.
    """
    pairs_mode = opt is None or opt.num_pose_frames == 2
    pose_type = opt.pose_model_type if opt is not None else (
        "separate_resnet" if models.pose_encoder is not None else "posecnn"
    )
    out = {}
    color_aug = (
        pose_frames if pose_frames is not None else batch["color_aug"]
    )  # [B,F,H,W,3]
    temporal = [f_i for f_i in frame_ids if f_i != "s"]

    def run_pose_encoder(stacked):
        feats, pe_stats = _apply(
            models.pose_encoder,
            params["pose_encoder"],
            (batch_stats or {}).get("pose_encoder"),
            stacked,
            train=models.train,
        )
        if batch_stats is not None:
            batch_stats["pose_encoder"] = pe_stats
        return feats

    if pairs_mode:
        temporal_srcs = [
            (idx, f_i)
            for idx, f_i in enumerate(frame_ids[1:], start=1)
            if f_i != "s"
        ]
        if (
            pose_type not in ("shared", "separate_resnet")
            and models.pose_encoder is None
            and len(temporal_srcs) > 1
        ):
            # PoseCNN has no BatchNorm, so all temporally-ordered pairs
            # can ride ONE batched forward (exact reference numerics,
            # trainer.py:324-331; 2x the conv batch on the MXU instead of
            # two half-size dispatches)
            b = color_aug.shape[0]
            pairs = []
            for idx, f_i in temporal_srcs:
                if f_i < 0:
                    pairs.append(jnp.concatenate(
                        [color_aug[:, idx], color_aug[:, 0]], axis=-1
                    ))
                else:
                    pairs.append(jnp.concatenate(
                        [color_aug[:, 0], color_aug[:, idx]], axis=-1
                    ))
            aa, t = models.pose.apply(
                {"params": params["pose"]}, jnp.concatenate(pairs, axis=0)
            )
            for j, (idx, f_i) in enumerate(temporal_srcs):
                sl = slice(j * b, (j + 1) * b)
                out[f_i] = (aa[sl, 0, 0], t[sl, 0, 0], f_i < 0)
            return out
        for idx, f_i in enumerate(frame_ids[1:], start=1):
            if f_i == "s":
                continue
            if pose_type == "shared":
                a, b = (
                    (shared_feats[f_i], shared_feats[0])
                    if f_i < 0
                    else (shared_feats[0], shared_feats[f_i])
                )
                aa, t = models.pose.apply(
                    {"params": params["pose"]}, [[a], [b]]
                )
            else:
                if f_i < 0:
                    pair = jnp.concatenate(
                        [color_aug[:, idx], color_aug[:, 0]], axis=-1
                    )
                else:
                    pair = jnp.concatenate(
                        [color_aug[:, 0], color_aug[:, idx]], axis=-1
                    )
                if models.pose_encoder is not None:
                    aa, t = models.pose.apply(
                        {"params": params["pose"]}, [run_pose_encoder(pair)]
                    )
                else:
                    aa, t = models.pose.apply({"params": params["pose"]}, pair)
            out[f_i] = (aa[:, 0, 0], t[:, 0, 0], f_i < 0)
    else:
        # all-frames mode: one prediction per source frame from one forward
        if pose_type == "shared":
            aa, t = models.pose.apply(
                {"params": params["pose"]},
                [[shared_feats[i]] for i in temporal],
            )
        else:
            stacked = jnp.concatenate(
                [color_aug[:, frame_ids.index(i)] for i in temporal], axis=-1
            )
            if models.pose_encoder is not None:
                aa, t = models.pose.apply(
                    {"params": params["pose"]}, [run_pose_encoder(stacked)]
                )
            else:
                aa, t = models.pose.apply({"params": params["pose"]}, stacked)
        for i, f_i in enumerate(temporal[1:]):
            # reference quirk: no invert for past frames here (:355-360)
            out[f_i] = (aa[:, i, 0], t[:, i, 0], False)
    return out


def forward(
    models: ModelBundle,
    params,
    batch_stats,
    batch,
    rng,
    opt: Options,
):
    """Full forward: depth, poses, warps, losses.

    Returns (total_loss, aux) where aux carries outputs / metrics / new BN
    stats. ``rng`` drives dropout + the identity-loss tie-break noise.
    """
    train = models.train
    rng_drop, rng_noise = (
        jax.random.split(rng) if rng is not None else (None, None)
    )
    frame_ids = opt.all_frame_ids
    b, f, h, w, _ = batch["color"].shape

    # 1. depth from the target frame (augmented input, trainer.py:286-288)
    def encoder_fwd(p, x):
        return _apply(
            models.encoder, p, batch_stats.get("encoder"), x, train=train
        )

    if opt.remat:
        # trade encoder activation memory for recompute (enables bs32 on
        # a 16G v5e at 320x1024)
        encoder_fwd = jax.checkpoint(encoder_fwd)

    need_pyramid = models.predictive_mask is not None

    shared_feats = None
    if opt.pose_model_type == "shared" and models.pose is not None:
        assert not need_pyramid, "predictive_mask + shared pose unsupported"
        # shared depth/pose trunk: every temporal frame through the depth
        # encoder in ONE batched apply (reference trainer.py:272-282 does a
        # batch-concat too; on TPU this keeps the convs large on the MXU)
        temporal = [i for i in frame_ids if i != "s"]
        stacked = jnp.concatenate(
            [batch["color_aug"][:, frame_ids.index(i)] for i in temporal], 0
        )
        all_feats, bs_enc = encoder_fwd(params["encoder"], stacked)
        per_frame = jnp.split(all_feats, len(temporal), axis=0)
        shared_feats = dict(zip(temporal, per_frame))
        feats = shared_feats[0]
    elif need_pyramid:
        (feats, pyramid), bs_enc = _apply(
            models.encoder, params["encoder"], batch_stats.get("encoder"),
            batch["color_aug"][:, 0], True, train=train,
        )
    else:
        feats, bs_enc = encoder_fwd(params["encoder"], batch["color_aug"][:, 0])
    dec_out, bs_dep = _apply(
        models.depth,
        params["depth"],
        batch_stats.get("depth"),
        feats,
        train=train,
        rng=rng_drop,
    )
    depth_half = dec_out["disp0"]  # [B,H/2,W/2,1] — holds depth (ref quirk)
    depth = resize_bilinear(depth_half, (h, w), align_corners=False)

    new_batch_stats = dict(batch_stats)
    new_batch_stats["encoder"] = bs_enc
    new_batch_stats["depth"] = bs_dep

    outputs: Dict[str, Any] = {"depth": depth, "depth_half": depth_half}
    if "bin_centers" in dec_out:
        outputs["bin_centers"] = dec_out["bin_centers"]

    # 2. poses (predict_poses updates pose_encoder BN stats in-place on
    # the dict we hand it)
    poses = (
        predict_poses(
            models, params, batch, frame_ids, new_batch_stats,
            opt=opt, shared_feats=shared_feats,
        )
        if models.pose is not None
        else {}
    )

    # mean inverse depth scaling for posecnn translations
    # (trainer.py:412-421, from arxiv 1712.00175)
    inv_depth = 1.0 / depth
    mean_inv_depth = inv_depth.mean(axis=(1, 2, 3))  # [B]

    # 3. warp every source frame into the target view
    K, inv_K = batch["K"], batch["inv_K"]
    target = batch["color"][:, 0]
    loss_dtype = (
        opt.compute_dtype if opt.loss_dtype == "auto" else opt.loss_dtype
    )
    ldt = jnp.bfloat16 if loss_dtype == "bfloat16" else jnp.float32
    # Pallas banded warp on the training path (device=TPU, shapes
    # aligned); XLA gather elsewhere (exact reference semantics)
    use_pallas_warp = (
        opt.use_pallas and train and jax.default_backend() == "tpu"
    )
    use_ssim = not opt.no_ssim
    fused_ssim = False
    if use_ssim and opt.use_pallas and jax.default_backend() == "tpu":
        from sfmnext_tpu.ops.pallas import ssim_kernel

        fused_ssim = ssim_kernel.supports(h, w, len(frame_ids) - 1)
    # Fully-fused combine: SSIM stacks + identity stacks + tie-break +
    # per-pixel min + automask in ONE kernel (the per-source [B,H,W,F]
    # maps never reach HBM; the separate identity launch and the XLA
    # min/argmin pass disappear). Falls back to the two-stack path for
    # the ablation flags that reshape the combine.
    fused_min = (
        fused_ssim
        and not opt.disable_automasking
        and not opt.avg_reprojection
        and not need_pyramid
    )
    # Channel-first hot path: the warp kernel emits [B,3,H,W] planes and
    # the fused loss kernel consumes them — zero layout transposes between
    # warp and loss. color_cf is the augment kernel's own transpose when
    # augmentation ran on device; recreated here otherwise.
    cf = fused_min and use_pallas_warp
    if cf:
        color_cf = batch.get("color_cf")
        if color_cf is None:
            color_cf = jnp.transpose(batch["color"], (0, 1, 4, 2, 3))
    warped_srcs, ident_srcs = [], []
    for idx, f_i in enumerate(frame_ids[1:], start=1):
        if f_i == "s":
            T = batch["stereo_T"]
        else:
            aa, t, inv = poses[f_i]
            if opt.pose_model_type == "posecnn" and not opt.use_stereo:
                t = t * mean_inv_depth[:, None]
            T = geometry.transformation_from_parameters(aa, t, invert=inv)

        src = color_cf[:, idx] if cf else batch["color"][:, idx]
        # NOTE: the warp samples in f32 even under bf16 loss_dtype — Mosaic's
        # dynamic_gather requires index/result bitwidth match (i32 lanes), so
        # a bf16 image window cannot be lane-gathered on this toolchain.
        warped, pix = warp_frame(
            src, depth, inv_K, K, T, use_pallas=use_pallas_warp, nchw=cf
        )
        outputs[f"warped_{f_i}"] = (
            jnp.transpose(warped, (0, 2, 3, 1)) if cf else warped
        )  # NHWC for panels; dead code on the hot path (not returned)
        warped_srcs.append(warped)
        ident_srcs.append(src)

    # one channel-stacked SSIM pass per group with shared target statistics
    # (the hot loss path); the identity group is param-independent, so its
    # separate stack keeps its conv backward out of the graph entirely.
    # Under bf16 compute the stack inputs are bf16 (halved HBM traffic,
    # native-bf16 pooling matmuls); all pooled statistics and the output
    # maps stay f32 (box_filter_reflect accumulates f32).
    target_l = target.astype(ldt)
    if fused_min:
        noise = (
            L._tiebreak_noise(
                rng_noise, (1, h, w, len(ident_srcs)), jnp.float32
            )
            if (train and rng_noise is not None)
            else None
        )
        to_optimise, automask = ssim_kernel.reprojection_min_pallas(
            warped_srcs,
            ident_srcs,
            color_cf[:, 0] if cf else target_l,
            noise, opt.ssim_weight, channel_first=cf,
        )
        outputs["automask"] = automask
        loss = to_optimise.mean()

        mean_d = depth.mean(axis=(1, 2, 3), keepdims=True)
        norm_d = depth / (mean_d + 1e-7)
        smooth = L.edge_aware_smoothness(
            norm_d, target, compute_dtype=None if ldt == jnp.float32 else ldt
        )
        total = loss + opt.disparity_smoothness * smooth

        metrics = {
            "loss": total,
            "loss/reprojection": loss,
            "loss/smooth": smooth,
        }
        return total, {
            "outputs": outputs,
            "metrics": metrics,
            "batch_stats": new_batch_stats,
        }
    if fused_ssim:
        reproj = ssim_kernel.reprojection_losses_pallas(
            [w.astype(ldt) for w in warped_srcs], target_l, opt.ssim_weight
        )
        ident = None
        if not opt.disable_automasking:
            ident = jax.lax.stop_gradient(
                ssim_kernel.reprojection_losses_pallas(
                    [s.astype(ldt) for s in ident_srcs],
                    target_l, opt.ssim_weight, need_grad=False,
                )
            )
    else:
        tstats = L.ssim_target_stats(target_l) if use_ssim else None
        reproj = L.reprojection_losses_stacked(
            [w.astype(ldt) for w in warped_srcs],
            target_l, opt.ssim_weight, use_ssim, tstats,
        ).astype(jnp.float32)  # [B,H,W,F]
        ident = None
        if not opt.disable_automasking:
            ident = jax.lax.stop_gradient(
                L.reprojection_losses_stacked(
                    [s.astype(ldt) for s in ident_srcs],
                    target_l, opt.ssim_weight, use_ssim, tstats,
                ).astype(jnp.float32)
            )

    # 3b. predictive mask ablation: per-source sigmoid mask weights the
    # reprojection losses + 0.2*BCE(mask, 1) keep-alive (trainer.py:495-507)
    mask_weight_loss = 0.0
    if need_pyramid:
        pm_out = models.predictive_mask.apply(
            {"params": params["predictive_mask"]}, pyramid
        )
        pmask = pm_out[("disp", 0)]  # [B,H,W,n_sources], full res at scale 0
        outputs["predictive_mask"] = pmask
        reproj = reproj * pmask
        mask_weight_loss = 0.2 * (
            -jnp.log(jnp.clip(pmask, 1e-7, 1.0))
        ).mean()

    # 4. combine (min over frames, automask)
    to_optimise, automask = L.min_reprojection_loss(
        [reproj],
        [ident] if ident is not None else None,
        rng=rng_noise if train else None,
        avg_reprojection=opt.avg_reprojection,
    )
    if automask is not None:
        outputs["automask"] = automask

    loss = to_optimise.mean()

    # 5. edge-aware smoothness on mean-normalized depth (trainer.py:533-542)
    mean_d = depth.mean(axis=(1, 2, 3), keepdims=True)
    norm_d = depth / (mean_d + 1e-7)
    smooth = L.edge_aware_smoothness(
        norm_d, target, compute_dtype=None if ldt == jnp.float32 else ldt
    )
    total = loss + opt.disparity_smoothness * smooth + mask_weight_loss

    metrics = {
        "loss": total,
        "loss/reprojection": loss,
        "loss/smooth": smooth,
    }
    return total, {
        "outputs": outputs,
        "metrics": metrics,
        "batch_stats": new_batch_stats,
    }


def train_depth_metrics(depth, depth_gt, max_eval_depth: float = 80.0):
    """On-device train-time depth metrics with garg crop + median scaling.

    Reference trainer.py:551-579 (interpolate to GT size, crop, median
    scale, clamp [1e-3, 80]). GT zeros are invalid.
    """
    b, gh, gw, _ = depth_gt.shape
    pred = resize_bilinear(depth, (gh, gw), align_corners=False)
    pred = jnp.clip(pred, 1e-3, max_eval_depth)

    valid = depth_gt > 0
    crop = jnp.zeros((gh, gw), bool)
    # garg crop fractions of the KITTI full-res frame (trainer.py:566-567)
    y0, y1 = int(0.40810811 * gh), int(0.98948052 * gh)
    x0, x1 = int(0.03542350 * gw), int(0.96378829 * gw)
    crop = crop.at[y0:y1, x0:x1].set(True)
    mask = valid & crop[None, :, :, None]

    # median scaling via masked median (fixed-size sort)
    gt_med = _masked_median(depth_gt, mask)
    pr_med = _masked_median(pred, mask)
    pred = pred * (gt_med / (pr_med + 1e-7))
    pred = jnp.clip(pred, 1e-3, max_eval_depth)
    return M.compute_depth_errors_masked(depth_gt, pred, mask)


def _masked_median(x, mask):
    """Median over masked entries (static shapes: sort with +inf padding)."""
    flat = jnp.where(mask, x, jnp.inf).reshape(-1)
    n = mask.sum()
    sorted_ = jnp.sort(flat)
    idx = jnp.clip((n - 1) // 2, 0, flat.shape[0] - 1)
    return sorted_[idx]
