#!/usr/bin/env python
"""Metric-depth finetuning CLI (reference finetune/train_ft_SQLdepth.py).

    python finetune_metric_depth.py <model_conf.txt> \
        --ft_filenames_file <train_list> --ft_gt_path <gt_root> [...]
"""

import argparse
import sys


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    ft = argparse.ArgumentParser(add_help=False)
    ft.add_argument("--ft_filenames_file", required=True)
    ft.add_argument("--ft_filenames_file_eval", default=None)
    ft.add_argument("--ft_gt_path", required=True)
    ft.add_argument("--ft_lr", type=float, default=1.6e-4)
    ft.add_argument("--ft_wd", type=float, default=0.1)
    ft.add_argument("--ft_epochs", type=int, default=25)
    ft.add_argument("--ft_batch_size", type=int, default=4)
    ft.add_argument("--ft_input_height", type=int, default=352)
    ft.add_argument("--ft_input_width", type=int, default=1216)
    ft_args, rest = ft.parse_known_args(argv)

    from sfmnext_tpu.config import parse_options
    from sfmnext_tpu.data.loader import PrefetchLoader
    from sfmnext_tpu.finetune import DepthDataset, FinetuneTrainer

    opt = parse_options(rest)
    train_ds = DepthDataset(
        opt.data_path, ft_args.ft_gt_path, ft_args.ft_filenames_file,
        mode="train", dataset=opt.dataset,
        input_height=ft_args.ft_input_height,
        input_width=ft_args.ft_input_width,
    )
    train_loader = PrefetchLoader(
        train_ds, ft_args.ft_batch_size, num_workers=opt.num_workers
    )
    test_loader = None
    if ft_args.ft_filenames_file_eval:
        test_ds = DepthDataset(
            opt.data_path, ft_args.ft_gt_path, ft_args.ft_filenames_file_eval,
            mode="eval", dataset=opt.dataset,
            input_height=ft_args.ft_input_height,
            input_width=ft_args.ft_input_width,
        )
        test_loader = PrefetchLoader(
            test_ds, 1, shuffle=False, num_workers=1, drop_last=False
        )

    trainer = FinetuneTrainer(
        opt, train_loader, test_loader,
        lr=ft_args.ft_lr, weight_decay=ft_args.ft_wd, epochs=ft_args.ft_epochs,
    )
    trainer.train()
    if test_loader is not None:
        print(trainer.validate())


if __name__ == "__main__":
    main()
