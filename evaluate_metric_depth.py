#!/usr/bin/env python
"""Standalone metric-depth evaluation of a saved (finetuned) checkpoint.

Behavioral reference: finetune/evaluate_metric_depth.py:19-222 —
flip-TTA averaged prediction resized to GT (align_corners=True), valid
mask = gt in (min_depth_eval, max_depth_eval) intersected with the
garg/eigen crop when requested, 9-metric dict (a1,a2,a3, abs_rel, rmse,
log_10, rmse_log, silog, sq_rel) averaged over images.

    python evaluate_metric_depth.py <model_conf.txt> \
        --checkpoint_path <orbax_ckpt_dir_or_pth_folder> \
        --filenames_file_eval <list> --gt_path <gt_root> [--garg_crop]
"""

import sys

import numpy as np


def evaluate(opt, ft_args):
    import jax
    import jax.numpy as jnp

    from sfmnext_tpu.finetune.trainer import predict_tta
    from sfmnext_tpu.ops.metrics import compute_metric_depth_errors
    from sfmnext_tpu.training.builder import build_models, init_params
    from sfmnext_tpu.training.pipeline import _apply
    from sfmnext_tpu.evaluation import resize_np_bilinear
    from finetune_metric_depth import build_loaders

    models = build_models(opt, train=False)
    variables = init_params(opt, models, jax.random.PRNGKey(0))

    folder = ft_args.checkpoint_path
    if not folder:
        raise SystemExit("--checkpoint_path is required")
    import os

    if os.path.exists(os.path.join(folder, "encoder.pth")):
        from sfmnext_tpu.utils import torch_port as tp

        sd = tp.load_state_dict(os.path.join(folder, "encoder.pth"))
        p, s = tp.convert_encoder_pth(sd, opt)
        variables["params"]["encoder"] = p
        variables["batch_stats"]["encoder"] = s
        dep = os.path.join(folder, "depth.pth")
        if os.path.exists(dep):
            variables["params"]["depth"] = tp.convert_sql_decoder(
                tp.load_state_dict(dep)
            )
    else:
        from sfmnext_tpu.utils import checkpoint as ckpt

        variables = ckpt.load_modules(folder, variables, ("encoder", "depth"))
    params, stats = variables["params"], variables["batch_stats"]

    import jax as _jax

    @_jax.jit
    def infer(images):
        feats, _ = _apply(
            models.encoder, params["encoder"], stats.get("encoder"), images,
            train=False,
        )
        out, _ = _apply(
            models.depth, params["depth"], stats.get("depth"), feats,
            train=False,
        )
        return out["disp0"]

    _, test_loader = build_loaders(opt, ft_args, need_train=False)
    if test_loader is None:
        raise SystemExit("--ft_filenames_file_eval/--filenames_file_eval required")

    min_d, max_d = ft_args.min_depth_eval, ft_args.max_depth_eval
    all_metrics = []
    for batch in test_loader:
        if not np.all(np.asarray(batch.get("has_valid_depth", True))):
            continue
        img = jnp.asarray(batch["image"])
        gt = np.asarray(batch["depth"])
        pred = np.asarray(predict_tta(infer, img))
        for i in range(len(gt)):
            g = gt[i, ..., 0]
            p = resize_np_bilinear(pred[i, ..., 0], g.shape)
            p = np.clip(p, min_d, max_d)
            # invalid-pred cleanup (reference eval loop)
            p[np.isnan(p)] = min_d
            p[np.isinf(p)] = max_d
            mask = (g > min_d) & (g < max_d)
            if ft_args.garg_crop or ft_args.eigen_crop:
                gh, gw = g.shape
                crop = np.zeros((gh, gw), bool)
                if ft_args.garg_crop:
                    crop[
                        int(0.40810811 * gh) : int(0.99189189 * gh),
                        int(0.03594771 * gw) : int(0.96405229 * gw),
                    ] = True
                else:  # eigen crop; NYU uses the inner box
                    if opt.dataset == "nyu":
                        crop[45:471, 41:601] = True
                    else:
                        crop[
                            int(0.3324324 * gh) : int(0.91351351 * gh),
                            int(0.0359477 * gw) : int(0.96405229 * gw),
                        ] = True
                mask &= crop
            if mask.sum() == 0:
                continue
            all_metrics.append(
                compute_metric_depth_errors(g[mask], p[mask])
            )
    keys = all_metrics[0].keys()
    result = {k: float(np.mean([m[k] for m in all_metrics])) for k in keys}
    print({k: round(v, 4) for k, v in result.items()})
    return result


def main(argv=None):
    from finetune_metric_depth import parse_ft
    from sfmnext_tpu.config import parse_options

    ft_args, rest = parse_ft(list(argv if argv is not None else sys.argv[1:]))
    opt = parse_options(rest)
    return evaluate(opt, ft_args)


if __name__ == "__main__":
    main()
