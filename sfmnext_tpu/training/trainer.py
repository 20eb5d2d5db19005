"""Trainer: the epoch/step orchestration around the jitted train step.

Behavioral reference: trainer.py:30-688 (outdoor Trainer) — dataset switch
(:144-148), split file lists (:150-157), per-epoch StepLR (:222-226),
early/late-phase logging cadence (:252-262), one-val-minibatch-per-log
(:363-384), per-epoch checkpoints (:225-226, 638-660).

The god-object is split: models/optimizer/step live in builder.py/step.py
(pure, jitted); this class only owns the data feed, the log cadence, and
checkpoint IO.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfmnext_tpu.config import Options
from sfmnext_tpu.parallel.mesh import make_mesh, shard_batch
from sfmnext_tpu.training.builder import build_models, init_params, param_count
from sfmnext_tpu.training.pipeline import train_depth_metrics
from sfmnext_tpu.training.step import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from sfmnext_tpu.utils import checkpoint as ckpt
from sfmnext_tpu.utils.logging import (
    MetricWriter,
    ThroughputLogger,
    dump_options,
)


def find_splits_dir() -> str:
    """Locate the split file lists (env override, repo-local, none)."""
    for cand in (
        os.environ.get("SFMNEXT_SPLITS", ""),
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "splits"),
        "splits",
    ):
        if cand and os.path.isdir(cand):
            return cand
    return "splits"


def make_dataset(opt: Options, filenames, is_train: bool):
    from sfmnext_tpu.data import kitti

    datasets = {
        "kitti": kitti.KITTIRAWDataset,
        "kitti_odom": kitti.KITTIOdomDataset,
        "kitti_depth": kitti.KITTIDepthDataset,
    }
    if opt.dataset == "cityscapes_preprocessed":
        from sfmnext_tpu.data.cityscapes import CityscapesPreprocessedDataset

        cls = CityscapesPreprocessedDataset
    elif opt.dataset in ("nyu_raw",):
        from sfmnext_tpu.data.nyu import NYURawDataset

        cls = NYURawDataset
    elif opt.dataset in ("mc_dataset", "mc_mini_dataset"):
        from sfmnext_tpu.data.mannequin import MCDataset

        # reference trainer_indoor.py reads --intrinsics_file_path for MC
        return MCDataset(
            opt.data_path,
            filenames,
            opt.height,
            opt.width,
            opt.all_frame_ids,
            is_train=is_train,
            img_ext=opt.img_ext,
            intrinsics_file=opt.intrinsics_file_path or None,
        )
    else:
        cls = datasets[opt.dataset]
    return cls(
        opt.data_path,
        filenames,
        opt.height,
        opt.width,
        opt.all_frame_ids,
        is_train=is_train,
        img_ext=opt.img_ext,
    )


class Trainer:
    def __init__(self, opt: Options, train_loader=None, val_loader=None):
        self.opt = opt.validate()
        self.log_path = os.path.join(opt.log_dir, opt.model_name)

        from sfmnext_tpu.parallel.mesh import auto_mesh_size

        self.mesh = make_mesh(
            opt.mesh_shape or auto_mesh_size(opt.batch_size)
        )
        self.models_train = build_models(opt, train=True)
        self.models_eval = build_models(opt, train=False)

        rng = jax.random.PRNGKey(opt.seed)
        self.rng, init_rng = jax.random.split(rng)
        variables = init_params(opt, self.models_train, init_rng)

        # ImageNet encoder init (reference resnet_encoder.py:44,57,
        # base_encoder.py:94, Unet.py:114-117). Skipped when a checkpoint
        # will overwrite the encoder anyway.
        if not (opt.load_pretrained_model or opt.load_weights_folder):
            from sfmnext_tpu.utils.imagenet_init import apply_weights_init

            variables = apply_weights_init(opt, self.models_train, variables)

        if opt.load_pretrained_model and opt.load_pt_folder:
            variables = self._warm_start(variables, opt.load_pt_folder)
        if opt.pretrained_pose:
            variables = self._load_pose(variables, opt.pose_net_path)
        if opt.pretrained_rectify:
            variables = self._load_rectify(variables, opt.pose_net_path)

        # data ------------------------------------------------------------
        if train_loader is None:
            from sfmnext_tpu.data.loader import PrefetchLoader
            from sfmnext_tpu.data.mono_dataset import read_lines

            splits_dir = find_splits_dir()
            fpath = os.path.join(splits_dir, opt.split, "{}_files.txt")
            train_files = read_lines(fpath.format("train"))
            val_files = read_lines(fpath.format("val"))
            train_loader = PrefetchLoader(
                make_dataset(opt, train_files, True),
                opt.batch_size,
                shuffle=True,
                num_workers=opt.num_workers,
                seed=opt.seed,
            )
            val_loader = PrefetchLoader(
                make_dataset(opt, val_files, False),
                opt.batch_size,
                shuffle=True,
                num_workers=max(1, opt.num_workers // 2),
                seed=opt.seed + 1,
                infinite=True,
            )
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_iter = iter(val_loader) if val_loader is not None else None

        self.steps_per_epoch = opt.steps_per_epoch or max(1, len(train_loader))
        self.num_total_steps = self.steps_per_epoch * opt.num_epochs

        # optimizer / step ------------------------------------------------
        self.tx = make_optimizer(opt, self.steps_per_epoch)
        self.state = TrainState.create(variables, self.tx)
        self.train_step = make_train_step(
            opt, self.models_train, self.tx, mesh=self.mesh, augment=True
        )
        self.eval_step = make_eval_step(opt, self.models_eval)
        self.depth_metrics = jax.jit(train_depth_metrics)

        # observability ---------------------------------------------------
        self.writers = {
            mode: MetricWriter(self.log_path, mode, use_jsonl=opt.log_jsonl)
            for mode in ("train", "val")
        }
        self.throughput = ThroughputLogger(opt.batch_size, self.num_total_steps)
        dump_options(opt, self.log_path)
        print(
            f"Training {opt.model_name}: "
            f"{param_count(variables['params']):,} params, "
            f"{self.steps_per_epoch} steps/epoch x {opt.num_epochs} epochs, "
            f"mesh={self.mesh.devices.shape}",
            flush=True,
        )

        self.epoch = 0
        self.step = 0

        # resume (reference load_model, trainer.py:662-688).
        # ``--load_weights_folder latest`` is the preemption-friendly form:
        # resume from the newest checkpoint under this run's models/ dir if
        # one exists, else start fresh — the same command line works for the
        # first launch and every relaunch after a preemption.
        folder = opt.load_weights_folder
        self._resumed_latest = False
        if folder == "latest":
            folder = self._latest_checkpoint()
            self._resumed_latest = folder is not None
            if folder is None:
                print("-> no checkpoint yet; starting fresh", flush=True)
        if folder:
            self.load_model(folder, restore_all=self._resumed_latest)
            self.step = int(self.state.step)
        elif opt.load_adam:
            if not (opt.load_pretrained_model and opt.load_pt_folder):
                raise ValueError(
                    "--load_adam needs --load_pretrained_model with "
                    "--load_pt_folder (reference trainer_indoor.py:157-166)"
                )
            self._load_adam(opt.load_pt_folder)
        if opt.multi_gpu:
            # subsumed: the mesh already spans every visible device
            # (reference options.py:205-207 parses this and never reads it)
            print(f"-> --multi_gpu: mesh over {self.mesh.devices.size} device(s)")

    # -------------------------------------------------------------- warm start
    def _warm_start(self, variables, folder):
        """Load pretrained encoder+depth (reference trainer.py:66-90).

        Accepts either an orbax checkpoint dir or reference-style .pth files.
        """
        enc_pth = os.path.join(folder, "encoder.pth")
        if os.path.exists(enc_pth):
            from sfmnext_tpu.utils import torch_port as tp

            sd = tp.load_state_dict(enc_pth)
            p, s = tp.convert_encoder_pth(sd, self.opt)
            variables["params"]["encoder"] = p
            variables["batch_stats"]["encoder"] = s
            dep_pth = os.path.join(folder, "depth.pth")
            if os.path.exists(dep_pth):
                variables["params"]["depth"] = tp.convert_sql_decoder(
                    tp.load_state_dict(dep_pth)
                )
            print(f"-> warm-started encoder/depth from {folder} (.pth)")
            return variables
        variables = ckpt.load_modules(folder, variables, ("encoder", "depth"))
        print(f"-> warm-started encoder/depth from {folder} (orbax)")
        return variables

    def _load_pose(self, variables, folder):
        """``--pretrained_pose``: warm-start the pose net from
        ``<pose_net_path>/pose.pth`` (reference trainer.py:100-104, with
        the "module." prefix strip) or an orbax checkpoint dir."""
        if not folder:
            raise ValueError("--pretrained_pose requires --pose_net_path")
        pose_pth = os.path.join(folder, "pose.pth")
        if os.path.exists(pose_pth):
            from sfmnext_tpu.utils import torch_port as tp

            if self.opt.pose_model_type != "posecnn":
                raise NotImplementedError(
                    "pose.pth import is defined for PoseCNN only "
                    "(reference trainer.py:98-104)"
                )
            variables = dict(variables)
            variables["params"] = dict(variables["params"])
            variables["params"]["pose"] = tp.convert_pose_cnn(
                tp.load_state_dict(pose_pth)
            )
            print(f"-> loaded pretrained pose from {pose_pth}")
            return variables
        variables = ckpt.load_modules(
            folder, variables, ("pose", "pose_encoder")
        )
        print(f"-> loaded pretrained pose from {folder} (orbax)")
        return variables

    def _load_rectify(self, variables, folder):
        """``--pretrained_rectify``: warm-start RectifyNet from
        ``<pose_net_path>/rectify.pth`` (reference trainer_indoor.py:101-107)
        or an orbax checkpoint dir."""
        if not folder:
            raise ValueError("--pretrained_rectify requires --pose_net_path")
        rect_pth = os.path.join(folder, "rectify.pth")
        if os.path.exists(rect_pth):
            from sfmnext_tpu.utils import torch_port as tp

            p, s = tp.convert_rectify(tp.load_state_dict(rect_pth))
            variables = dict(variables)
            variables["params"] = dict(variables["params"])
            variables["batch_stats"] = dict(variables["batch_stats"])
            variables["params"]["rectify"] = p
            variables["batch_stats"]["rectify"] = s
            print(f"-> loaded pretrained rectify from {rect_pth}")
            return variables
        variables = ckpt.load_modules(folder, variables, ("rectify",))
        print(f"-> loaded pretrained rectify from {folder} (orbax)")
        return variables

    # ------------------------------------------------------------------ train
    def train(self):
        """Run the epoch loop, preemption-aware.

        A ``--load_weights_folder latest`` resume fast-forwards to the
        epoch its restored step count implies instead of replaying from
        epoch 0 (an explicit folder keeps reference semantics: the epoch
        schedule restarts, trainer.py:662-688). SIGTERM/SIGINT set a
        flag that run_epoch checks once per step: the trainer writes a
        ``weights_interrupt`` checkpoint at the next step boundary and
        exits — combined with ``--load_weights_folder latest`` this is the
        full preempt/restore cycle (the reference has no equivalent; its
        closest artifact is the indoor trainer's 1000-step snapshots,
        trainer_indoor.py:317-328).
        """
        self._interrupted = None
        self._interrupt_saved = False
        prev = {
            s: signal.signal(s, self._on_interrupt)
            for s in (signal.SIGTERM, signal.SIGINT)
        }
        try:
            start_epoch = 0
            if getattr(self, "_resumed_latest", False):
                start_epoch = min(
                    self.step // max(self.steps_per_epoch, 1),
                    self.opt.num_epochs,
                )
            if start_epoch == 0:
                self.save_model()  # epoch-0 snapshot (reference trainer.py:221)
            for self.epoch in range(start_epoch, self.opt.num_epochs):
                self.run_epoch()
                if self._interrupted is not None:
                    self._checkpoint_interrupt()
                    return
                if (self.epoch + 1) % self.opt.save_frequency == 0:
                    self.save_model()
        finally:
            for s, h in prev.items():
                signal.signal(s, h)

    def _on_interrupt(self, signum, frame):
        print(
            f"-> caught signal {signum}; checkpointing at next step boundary",
            flush=True,
        )
        self._interrupted = signum

    def _checkpoint_interrupt(self):
        if self._interrupt_saved:
            return
        self._interrupt_saved = True
        self.save_model(tag="interrupt")
        print(
            f"-> interrupted at step {self.step}; resume with "
            "--load_weights_folder latest",
            flush=True,
        )

    def run_epoch(self):
        print("Training", flush=True)
        for batch_idx, batch in enumerate(self.train_loader):
            if batch_idx >= self.steps_per_epoch:
                break
            if getattr(self, "_interrupted", None) is not None:
                self._checkpoint_interrupt()
                return
            t0 = time.time()
            batch = self._device_batch(batch)
            self.state, metrics = self.train_step(
                self.state, batch, self.rng
            )

            depth = metrics.pop("depth")
            early = batch_idx % self.opt.log_frequency == 0 and self.step < 2000
            late = self.step % 1000 == 0
            if early or late:
                loss = float(metrics["loss"])  # sync point
                self.throughput.log(
                    self.epoch, batch_idx, self.step, time.time() - t0, loss
                )
                vals = {k: float(v) for k, v in metrics.items()}
                if "depth_gt" in batch:
                    vals.update(
                        {
                            k: float(v)
                            for k, v in self.depth_metrics(
                                depth, batch["depth_gt"]
                            ).items()
                        }
                    )
                self.writers["train"].scalars(self.step, vals)
                self.val()
            self.step += 1
            # step-periodic checkpointing (reference trainer_indoor.py:317,
            # 327-328 saves every 1000 steps; 0 disables)
            if (
                self.opt.save_step_frequency
                and self.step % self.opt.save_step_frequency == 0
            ):
                self.save_model(tag=f"step_{self.step}")

    def val(self):
        if self.val_iter is None:
            return
        try:
            batch = next(self.val_iter)
        except StopIteration:
            self.val_iter = iter(self.val_loader)
            batch = next(self.val_iter)
        batch = self._device_batch(batch, augment_eval=True)
        metrics, outputs = self.eval_step(
            self.state.params, self.state.batch_stats, batch
        )
        vals = {k: float(v) for k, v in metrics.items()}
        if "depth_gt" in batch:
            vals.update(
                {
                    k: float(v)
                    for k, v in self.depth_metrics(
                        outputs["depth"], batch["depth_gt"]
                    ).items()
                }
            )
        self.writers["val"].scalars(self.step, vals)
        if self.opt.log_images:
            self._log_images("val", batch, outputs)

    def _log_images(self, mode, batch, outputs, max_n: int = 2):
        """Visual-debug panels: input / warped / disp / automask
        (reference trainer.py:593-625), downsampled 2x for IO."""

        def ds(a):  # device->host + 2x downsample
            return np.asarray(a)[::2, ::2]

        panels = {}
        color = batch["color"]  # [B,F,H,W,3]
        n = min(max_n, int(color.shape[0]))
        for j in range(n):
            for idx, f_i in enumerate(self.opt.all_frame_ids):
                panels[f"color_{f_i}_0/{j}"] = ds(color[j, idx])
                key = f"warped_{f_i}"
                if f_i != 0 and key in outputs:
                    panels[f"color_pred_{f_i}_0/{j}"] = ds(outputs[key][j])
            depth = np.asarray(outputs["depth"][j, ..., 0])
            disp = 1.0 / np.maximum(depth, 1e-6)
            disp = (disp - disp.min()) / (disp.max() - disp.min() + 1e-7)
            panels[f"disp_0/{j}"] = disp[::2, ::2]
            if "automask" in outputs:
                panels[f"automask_0/{j}"] = ds(outputs["automask"][j])
            if "predictive_mask" in outputs:
                pm = np.asarray(outputs["predictive_mask"][j])
                for f_idx in range(pm.shape[-1]):
                    panels[f"predictive_mask_{f_idx}_0/{j}"] = (
                        pm[::2, ::2, f_idx]
                    )
        self.writers[mode].images(self.step, panels)

    def _device_batch(self, batch, augment_eval=False):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if "color_aug" not in batch and augment_eval:
            batch["color_aug"] = batch["color"]
        return shard_batch(batch, self.mesh)

    # ------------------------------------------------------------ checkpoints
    def _latest_checkpoint(self) -> Optional[str]:
        """Newest ``weights_*`` checkpoint dir of this run (mtime order),
        or None if the run has never checkpointed."""
        root = os.path.join(self.log_path, "models")
        if not os.path.isdir(root):
            return None
        cands = [
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("weights_")
            and os.path.isdir(os.path.join(root, d))
        ]
        return max(cands, key=os.path.getmtime) if cands else None

    def save_model(self, tag: Optional[str] = None):
        folder = os.path.join(
            self.log_path, "models", f"weights_{tag or self.epoch}"
        )
        ckpt.save_checkpoint(folder, self.state, self.opt)
        print(f"-> saved checkpoint {folder}", flush=True)

    def load_model(self, folder: Optional[str] = None,
                   restore_all: bool = False):
        """Resume: params + batch_stats + optimizer state + step.

        Module selection follows the reference: only the modules named in
        ``--models_to_load`` are restored (trainer.py:671-678); the rest
        keep their fresh init. The optimizer state loads whenever present,
        like the reference's adam.pth (:680-688) — our checkpoints always
        carry opt_state, so a resumed run continues Adam moments and the
        LR-schedule count exactly. ``restore_all=True`` (the
        ``latest`` preemption path, no reference counterpart) restores
        every module regardless. Restoring against the live state as
        target keeps the optax pytree structure (namedtuples) intact.
        """
        folder = folder or self.opt.load_weights_folder
        restored = ckpt.load_checkpoint(
            folder,
            target_payload={
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
            },
        )
        wanted = set(self.opt.models_to_load)
        skipped = [] if restore_all else sorted(
            set(self.state.params) - wanted
        )
        params = dict(restored["params"])
        stats = dict(restored["batch_stats"])
        for m in skipped:
            params[m] = self.state.params[m]
            if m in self.state.batch_stats:
                stats[m] = self.state.batch_stats[m]
        self.state = self.state.replace(
            params=params,
            batch_stats=stats,
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
        )
        msg = f" (models_to_load skipped: {', '.join(skipped)})" if skipped \
            else ""
        print(f"-> loaded checkpoint {folder} (incl. opt_state){msg}",
              flush=True)

    def _load_adam(self, folder: str):
        """``--load_adam`` with ``--load_pt_folder`` (indoor warm start,
        reference trainer_indoor.py:157-166): restore only opt_state.

        Torch ``adam.pth`` imports through utils/adam_port.py — the moment
        tensors are recovered by the reference's parameter-group order and
        converted with the same layout transforms as the weights."""
        if os.path.exists(os.path.join(folder, "adam.pth")):
            from sfmnext_tpu.utils import adam_port

            mu, nu, count = adam_port.convert_adam_pth(
                folder, self.opt, modules=tuple(self.state.params)
            )
            self.state = self.state.replace(
                opt_state=adam_port.inject_adam_state(
                    self.state.opt_state, mu, nu, count
                )
            )
            print(
                f"-> imported torch Adam state from {folder}/adam.pth "
                f"(step {count})", flush=True,
            )
            return
        restored = ckpt.load_checkpoint(
            folder,
            target_payload={
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
            },
        )
        self.state = self.state.replace(opt_state=restored["opt_state"])
        print(f"-> loaded Adam state from {folder}", flush=True)
