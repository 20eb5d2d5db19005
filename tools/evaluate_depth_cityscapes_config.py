#!/usr/bin/env python
"""Cityscapes depth evaluation.

Behavioral reference: tools/evaluate_depth_cityscapes_config.py:110-367 —
  - CityscapesEvalDataset (raw frames, ego-car crop)
  - model output passed through disp_to_depth; the *scaled disparity* is
    then treated as the depth prediction (:214-216, the 1/disp inversion is
    disabled in the reference)
  - per-image npy GT; GT cropped to top 75% then center crop
    [256:, 192:1856] (:279-299)
  - mono: median scaling; stereo: 5.4x factor (:262-268)

    python tools/evaluate_depth_cityscapes_config.py args_files/<cfg>.txt
"""

import os
import sys

import numpy as np


def evaluate_cityscapes(opt):
    import dataclasses

    import jax.numpy as jnp

    from sfmnext_tpu.data.cityscapes import CityscapesEvalDataset
    from sfmnext_tpu.data.loader import PrefetchLoader
    from sfmnext_tpu.data.mono_dataset import read_lines
    from sfmnext_tpu.evaluation import (
        MAX_DEPTH,
        MIN_DEPTH,
        STEREO_SCALE_FACTOR,
        load_eval_variables,
        predict_depths,
        print_metric_row,
        resize_np_bilinear,
    )
    from sfmnext_tpu.ops import metrics as M
    from sfmnext_tpu.ops.geometry import disp_to_depth
    from sfmnext_tpu.training.trainer import find_splits_dir

    splits_dir = find_splits_dir()
    files = read_lines(os.path.join(splits_dir, "cityscapes", "test_files.txt"))
    ds = CityscapesEvalDataset(
        opt.eval_data_path, files, opt.height, opt.width,
        frame_idxs=[0], is_train=False, img_ext=".png",
    )
    loader = PrefetchLoader(ds, 1, shuffle=False, num_workers=2, drop_last=False)

    models, variables = load_eval_variables(opt)
    raw = predict_depths(opt, models, variables, loader, opt.post_process)
    # reference quirk: disp_to_depth's scaled_disp is used as the prediction
    scaled_disp, _ = disp_to_depth(raw, opt.min_depth, opt.max_depth)
    preds = np.asarray(scaled_disp)

    gt_dir = os.path.join(splits_dir, "cityscapes", "gt_depths")
    errors, ratios = [], []
    for i in range(len(preds)):
        gt = np.load(os.path.join(gt_dir, f"{i:03d}_depth.npy"))
        gh = int(round(gt.shape[0] * 0.75))
        gt = gt[:gh]
        pred = resize_np_bilinear(preds[i], (gh, gt.shape[1]))
        gt = gt[256:, 192:1856]
        pred = pred[256:, 192:1856]

        mask = (gt > MIN_DEPTH) & (gt < MAX_DEPTH)
        p, g = pred[mask], gt[mask]
        p = p * opt.pred_depth_scale_factor
        if opt.eval_stereo:
            p = p * STEREO_SCALE_FACTOR
        elif not opt.disable_median_scaling:
            r = np.median(g) / np.median(p)
            ratios.append(r)
            p = p * r
        p = np.clip(p, MIN_DEPTH, MAX_DEPTH)
        errors.append(M.compute_depth_errors(g, p))

    mean = np.mean(np.asarray(errors), axis=0)
    result = dict(
        zip(("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"), mean)
    )
    print_metric_row(result)
    return result


def main(argv=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sfmnext_tpu.config import parse_options

    opt = parse_options(argv if argv is not None else sys.argv[1:])
    evaluate_cityscapes(opt)


if __name__ == "__main__":
    main()
