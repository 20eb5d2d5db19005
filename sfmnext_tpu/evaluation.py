"""Evaluation: the reference's eval protocol as a library.

Behavioral reference: evaluate_depth_config.py:62-277 —
  - batch-1 forward over the split's test_files           (:80-90, 127-162)
  - optional flip post-process blend                      (:132-134, 51-59)
  - resize pred to GT resolution (numpy, per-image)       (:231)
  - eigen crop                                            (:237-241)
  - per-image median scaling (mono) / 5.4x stereo factor  (:253-256, :27)
  - clamp [1e-3, 80], 7-metric mean row                   (:258-276)

GT comes from gt_depths.npz produced by export_gt_depth (reference
export_gt_depth.py:19-65).

TPU notes: the network forward is jitted once at the eval resolution;
the per-image resize + metric math stays on host numpy because GT sizes
vary per image (shape-polymorphic device code would recompile per shape).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfmnext_tpu.config import Options
from sfmnext_tpu.ops import metrics as M
from sfmnext_tpu.training.builder import build_models
from sfmnext_tpu.utils import checkpoint as ckpt

MIN_DEPTH = 1e-3
MAX_DEPTH = 80.0
STEREO_SCALE_FACTOR = 5.4


def resize_np_bilinear(arr: np.ndarray, out_hw) -> np.ndarray:
    """cv2.resize-equivalent bilinear (half-pixel centers) on host."""
    from sfmnext_tpu.ops.image import _interp_matrix

    my = _interp_matrix(arr.shape[0], out_hw[0], False)
    mx = _interp_matrix(arr.shape[1], out_hw[1], False)
    return my @ arr @ mx.T


def load_eval_variables(opt: Options):
    """Restore weights for evaluation from --load_weights_folder.

    Accepts an orbax checkpoint dir or a reference-style folder of .pth
    files (evaluate_depth_config.py:92-117). Evaluation runs in f32 for
    metric parity with the reference (training defaults to bf16).
    """
    import dataclasses

    opt = dataclasses.replace(opt, compute_dtype="float32")
    models = build_models(opt, train=False)
    from sfmnext_tpu.training.builder import init_params

    variables = init_params(opt, models, jax.random.PRNGKey(0))
    folder = opt.load_weights_folder
    if folder is None:
        print("WARNING: no --load_weights_folder; evaluating random init")
        return models, variables

    enc_pth = os.path.join(folder, "encoder.pth")
    if os.path.exists(enc_pth):
        from sfmnext_tpu.utils import torch_port as tp

        sd = tp.load_state_dict(enc_pth)
        p, s = tp.convert_encoder_pth(sd, opt)
        variables["params"]["encoder"] = p
        variables["batch_stats"]["encoder"] = s
        dep = os.path.join(folder, "depth.pth")
        if os.path.exists(dep):
            variables["params"]["depth"] = tp.convert_sql_decoder(
                tp.load_state_dict(dep)
            )
    else:
        variables = ckpt.load_modules(folder, variables, ("encoder", "depth"))
    return models, variables


def predict_depths(opt: Options, models, variables, loader, post_process: bool):
    """Jitted forward over the loader; returns [N,h,w] depths.

    Protocol default is batch 1 (evaluate_depth_config.py:90); TPU-first
    ``--eval_batch_size N`` amortizes the per-dispatch tunnel latency —
    the last short batch is padded to the compiled shape and trimmed, so
    the metrics are identical to the batch-1 run. With --post_process the
    flipped copies ride the same dispatch (batch 2N).

    ``--log_attn`` writes the SQL energy maps per batch step (reference
    evaluate_depth_config.py:137-151: color + normalized disp + up to 100
    per-query attention maps for the first <=4 images) to <log_dir>/vis
    via MetricWriter (TB panels when available, pngs otherwise).
    """
    import dataclasses as _dc

    depth_model = (
        _dc.replace(models.depth, return_energy=True)
        if opt.log_attn else models.depth
    )

    @jax.jit
    def infer(images):
        feats = models.encoder.apply(
            {
                "params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"],
            },
            images,
        )
        out = depth_model.apply({"params": variables["params"]["depth"]}, feats)
        if opt.log_attn:
            return out["disp0"][..., 0], out["energy"]
        return out["disp0"][..., 0], None

    writer = None
    if opt.log_attn:
        from sfmnext_tpu.utils.logging import MetricWriter

        writer = MetricWriter(opt.log_dir, "vis")

    def _log_attn_panels(step, img, disp, energy):
        # softmax over pixels per query; normalize each map for display
        h, w, q = energy.shape[1:]
        panels = {}
        for j in range(min(4, img.shape[0])):
            panels[f"color_0/{j}"] = img[j]
            d = disp[j]
            panels[f"disp_0/{j}"] = (d - d.min()) / (d.max() - d.min() + 1e-7)
            e = energy[j].reshape(-1, q)
            e = np.exp(e - e.max(0, keepdims=True))
            attn = (e / e.sum(0, keepdims=True)).reshape(h, w, q)
            for k in range(min(100, q)):
                a = attn[:, :, k]
                panels[f"attn_{j}/{k}"] = a / (a.max() + 1e-12)
        writer.images(step, panels)

    bs = max(1, getattr(opt, "eval_batch_size", 1))
    preds = []
    for step, batch in enumerate(loader):
        img = np.asarray(batch["color"][:, 0])  # [n<=bs,H,W,3]
        n = img.shape[0]
        if n < bs:  # pad the final short batch to the compiled shape
            img = np.concatenate(
                [img, np.repeat(img[-1:], bs - n, axis=0)], axis=0
            )
        img = jnp.asarray(img)
        if post_process:
            both = jnp.concatenate([img, img[:, :, ::-1]], 0)
            d, energy = infer(both)
            d = np.asarray(d)
            d = M.flip_postprocess(d[: img.shape[0]], d[img.shape[0]:, :, ::-1])
        else:
            d, energy = infer(img)
            d = np.asarray(d)
        if writer is not None:
            _log_attn_panels(
                step, np.asarray(img)[:n], d[:n], np.asarray(energy)[:n]
            )
        preds.append(d[:n])
    return np.concatenate(preds, 0)


def evaluate_predictions(
    opt: Options,
    pred_depths: np.ndarray,
    gt_depths,
    eval_split: str = "eigen",
    error_maps_out: Optional[list] = None,
) -> dict:
    """Crop/scale/clamp + 7-metric mean (evaluate_depth_config.py:209-277).

    If ``error_maps_out`` is a list, per-image |gt-pred|*mask maps at GT
    resolution are appended to it (reference :246-250, saved behind
    --save_pred_disps).
    """
    errors, ratios = [], []
    use_median = opt.eval_mono and not opt.disable_median_scaling

    for i in range(len(pred_depths)):
        gt = gt_depths[i]
        gh, gw = gt.shape
        pred = resize_np_bilinear(pred_depths[i], (gh, gw))
        pred = pred * opt.pred_depth_scale_factor
        if opt.eval_stereo:
            pred = pred * STEREO_SCALE_FACTOR

        if eval_split == "eigen":
            mask = (gt > MIN_DEPTH) & (gt < MAX_DEPTH)
            mask &= M.eigen_crop_mask(gh, gw)
        else:
            mask = gt > 0

        if error_maps_out is not None:
            error_maps_out.append(np.abs(gt - pred) * mask)

        p, g = pred[mask], gt[mask]
        if use_median:
            ratio = np.median(g) / np.median(p)
            ratios.append(ratio)
            p = p * ratio
        p = np.clip(p, MIN_DEPTH, MAX_DEPTH)
        errors.append(M.compute_depth_errors(g, p))

    mean = np.mean(np.asarray(errors), axis=0)
    result = dict(
        zip(("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"), mean)
    )
    if ratios:
        r = np.asarray(ratios)
        result["med_ratio"] = float(np.median(r))
        result["std_ratio"] = float(np.std(r / np.median(r)))
    return result


def print_metric_row(result: dict):
    keys = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
    print("\n  " + ("{:>8} | " * 7).format(*keys))
    print(("&{: 8.3f}  " * 7).format(*[result[k] for k in keys]) + "\\\\")


def save_benchmark_predictions(preds: np.ndarray, save_dir: str):
    """Resize to 352x1216, 5.4/d uint16*256 pngs (evaluate_depth_config.py:195-207)."""
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    for idx in range(len(preds)):
        resized = resize_np_bilinear(preds[idx], (352, 1216))
        depth = np.clip(STEREO_SCALE_FACTOR / np.maximum(resized, 1e-8), 0, 80)
        depth = (depth * 256).astype(np.uint16)
        Image.fromarray(depth).save(os.path.join(save_dir, f"{idx:010d}.png"))


def evaluate(opt: Options) -> dict:
    """Full split evaluation (CLI entry equivalent).

    Covers all reference codepaths of evaluate_depth_config.py:62-277:
    forward-or-external predictions (--ext_disp_to_eval, :167-176),
    eigen→benchmark id remap (:171-176), disparity/error-map dumps
    (--save_pred_disps, :178-186, :268-272), --no_eval early exit (:188-190),
    and benchmark-split png export (:192-207).
    """
    from sfmnext_tpu.training.trainer import find_splits_dir

    splits_dir = find_splits_dir()
    out_dir = opt.eval_out_dir or opt.load_weights_folder or "."

    if opt.ext_disp_to_eval:
        print(f"-> Loading predictions from {opt.ext_disp_to_eval}")
        preds = np.load(opt.ext_disp_to_eval)
        if opt.eval_eigen_to_benchmark:
            ids = np.load(
                os.path.join(splits_dir, "benchmark", "eigen_to_benchmark_ids.npy")
            )
            preds = preds[ids]
    else:
        assert int(opt.eval_mono) + int(opt.eval_stereo) == 1, (
            "choose exactly one of --eval_mono / --eval_stereo"
        )
        from sfmnext_tpu.data.loader import PrefetchLoader
        from sfmnext_tpu.data.mono_dataset import read_lines
        from sfmnext_tpu.training.trainer import make_dataset

        files = read_lines(
            os.path.join(splits_dir, opt.eval_split, "test_files.txt")
        )
        import dataclasses

        ds_opt = dataclasses.replace(opt, frame_ids=(0,), use_stereo=False)
        dataset = make_dataset(ds_opt, files, is_train=False)
        dataset.load_depth = False
        loader = PrefetchLoader(
            dataset, max(1, opt.eval_batch_size), shuffle=False,
            num_workers=opt.num_workers, drop_last=False,
        )

        models, variables = load_eval_variables(opt)
        preds = predict_depths(opt, models, variables, loader, opt.post_process)

    if opt.save_pred_disps:
        os.makedirs(out_dir, exist_ok=True)
        output_path = os.path.join(out_dir, f"disps_{opt.eval_split}_split.npy")
        print(f"-> Saving predicted disparities to {output_path}")
        np.save(output_path, preds)

    if opt.no_eval:
        print("-> Evaluation disabled. Done.")
        return {}

    if opt.eval_split == "benchmark":
        save_dir = os.path.join(out_dir, "benchmark_predictions")
        print(f"-> Saving out benchmark predictions to {save_dir}")
        save_benchmark_predictions(preds, save_dir)
        print("-> No ground truth is available for the KITTI benchmark, "
              "so not evaluating. Done.")
        return {}

    gt_path = os.path.join(splits_dir, opt.eval_split, "gt_depths.npz")
    gt_depths = np.load(gt_path, fix_imports=True, allow_pickle=True)["data"]

    error_maps = [] if opt.save_pred_disps else None
    result = evaluate_predictions(
        opt, preds, gt_depths, opt.eval_split, error_maps_out=error_maps
    )
    if error_maps is not None:
        error_map_path = os.path.join(out_dir, f"error_{opt.eval_split}_split.npy")
        print(f"-> Saving error maps to {error_map_path}")
        np.savez_compressed(
            error_map_path, data=np.array(error_maps, dtype="object")
        )
    print_metric_row(result)
    return result
