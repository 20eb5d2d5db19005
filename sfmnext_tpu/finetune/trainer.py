"""Metric finetune: AdamW + OneCycle + SILog with the median-rescale quirk.

Behavioral reference: finetune/train_ft_SQLdepth.py:80-378 —
  - forward, bilinear-resize pred to GT (align_corners=True)      :235
  - per-sample median rescale of pred toward GT *during training*
    (garg-crop masked; applied to the first half of the batch,
    ``range(pred.shape[0] // 2)``)                                :236-266
  - SILog on mask = depth > min_depth                             :272-276
  - global grad-norm clip 0.1                                      :284
  - AdamW(wd) + OneCycleLR(div_factor, final_div_factor)           :189-205
  - validation: flip-TTA average, 9 metrics, best-abs_rel ckpt     :295-378
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sfmnext_tpu.config import Options
from sfmnext_tpu.ops.image import resize_bilinear
from sfmnext_tpu.ops.losses import silog_loss
from sfmnext_tpu.ops.metrics import compute_metric_depth_errors
from sfmnext_tpu.training.builder import ModelBundle, build_models, init_params
from sfmnext_tpu.training.step import TrainState


def onecycle_schedule(lr: float, total_steps: int, div_factor: float = 25.0,
                      final_div_factor: float = 100.0, pct_start: float = 0.3):
    """torch OneCycleLR (cos anneal) equivalent.

    optax's cosine_onecycle divides by segment lengths — a tiny
    total_steps (smoke tests) yields zero-length segments and NaN LRs, so
    clamp to a sane minimum.
    """
    return optax.cosine_onecycle_schedule(
        transition_steps=max(int(total_steps), 10),
        peak_value=lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def make_finetune_optimizer(lr: float, total_steps: int, weight_decay: float = 0.1,
                            clip_norm: float = 0.1):
    sched = onecycle_schedule(lr, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def _masked_median_per_sample(x, mask):
    """[B,H,W,1] masked median per sample (static shapes)."""
    b = x.shape[0]
    flat = jnp.where(mask, x, jnp.inf).reshape(b, -1)
    n = mask.reshape(b, -1).sum(axis=1)
    sorted_ = jnp.sort(flat, axis=1)
    idx = jnp.clip((n - 1) // 2, 0, flat.shape[1] - 1)
    return jnp.take_along_axis(sorted_, idx[:, None], axis=1)[:, 0]


def garg_mask(gt, min_d, max_d):
    b, h, w, _ = gt.shape
    m = (gt > min_d) & (gt < max_d)
    crop = jnp.zeros((h, w), bool)
    crop = crop.at[
        int(0.40810811 * h) : int(0.99189189 * h),
        int(0.03594771 * w) : int(0.96405229 * w),
    ].set(True)
    return m & crop[None, :, :, None]


def make_finetune_step(opt: Options, models: ModelBundle, tx,
                       min_depth: float = 1e-3, max_depth: float = 80.0,
                       rescale_half_batch: bool = True, mesh=None,
                       donate: bool = True):
    """Jitted supervised step: (state, batch, rng) -> (state, metrics).

    With ``mesh``, the batch is sharded over the 'data' axis and state is
    replicated — the TPU-native equivalent of the reference wrapping the
    model in DataParallel (finetune/train_ft_SQLdepth.py:96)."""

    def forward_depth(params, batch_stats, images, rng):
        from sfmnext_tpu.training.pipeline import _apply

        feats, bs = _apply(
            models.encoder, params["encoder"], batch_stats.get("encoder"),
            images, train=models.train,
        )
        out, _ = _apply(
            models.depth, params["depth"], batch_stats.get("depth"), feats,
            train=models.train, rng=rng,
        )
        return out["disp0"], bs

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        img, gt = batch["image"], batch["depth"]
        gh, gw = gt.shape[1:3]

        def loss_fn(params):
            pred_half, bs_enc = forward_depth(params, state.batch_stats, img, rng)
            pred = resize_bilinear(pred_half, (gh, gw), align_corners=True)

            # median-rescale-in-train quirk (ref :236-266): ratio computed
            # on the garg-cropped region, treated as a constant, applied to
            # the first half of the batch only.
            m = garg_mask(gt, min_depth, max_depth)
            gt_med = _masked_median_per_sample(gt, m)
            pr_med = _masked_median_per_sample(pred, m)
            ratio = jax.lax.stop_gradient(gt_med / (pr_med + 1e-7))
            if rescale_half_batch:
                b = pred.shape[0]
                sel = (jnp.arange(b) < b // 2).astype(pred.dtype)
                ratio = ratio * sel + (1.0 - sel)
            pred = pred * ratio[:, None, None, None]

            mask = gt > min_depth
            loss = silog_loss(
                jnp.where(mask, pred, 1.0), jnp.where(mask, gt, 1.0), mask
            )
            return loss, (bs_enc, pred)

        (loss, (bs_enc, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        stats = dict(state.batch_stats)
        stats["encoder"] = bs_enc
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=stats,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)
    from sfmnext_tpu.parallel.mesh import batch_sharding, replicated_sharding

    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, dat, rep),
        out_shardings=(rep, None),
        donate_argnums=donate_argnums,
    )


def predict_tta(infer_fn, images):
    """Flip-TTA average (ref finetune/evaluate_metric_depth.py:47-62)."""
    pred = infer_fn(images)
    pred_f = infer_fn(images[:, :, ::-1])
    return 0.5 * (pred + pred_f[:, :, ::-1])


class FinetuneTrainer:
    """Minimal orchestration for supervised finetuning runs."""

    def __init__(self, opt: Options, train_loader, test_loader=None,
                 lr: float = 1.6e-4, weight_decay: float = 0.1,
                 epochs: int = 25):
        self.opt = opt.validate()
        from sfmnext_tpu.parallel.mesh import auto_mesh_size, make_mesh

        self.mesh = make_mesh(opt.mesh_shape or auto_mesh_size(opt.batch_size))
        self.models = build_models(opt, train=True)
        self.models_eval = build_models(opt, train=False)
        variables = init_params(opt, self.models, jax.random.PRNGKey(opt.seed))
        variables = self._warm_start(variables)
        total_steps = max(1, len(train_loader)) * epochs
        self.tx = make_finetune_optimizer(lr, total_steps, weight_decay)
        self.state = TrainState.create(variables, self.tx)
        self.step_fn = make_finetune_step(
            opt, self.models, self.tx, max_depth=opt.max_depth, mesh=self.mesh
        )
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.epochs = epochs
        self.best_abs_rel = np.inf

    def _warm_start(self, variables):
        """Load the SSL-trained encoder+depth the finetune starts from
        (reference SQLdepth.py:32-45 via --load_pt_folder, and
        inc_kitti.txt's --load_weights_folder)."""
        folder = None
        if self.opt.load_pretrained_model and self.opt.load_pt_folder:
            folder = self.opt.load_pt_folder
        elif self.opt.load_weights_folder:
            folder = self.opt.load_weights_folder
        if not folder:
            return variables
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
            print(f"-> finetune warm start from {folder} (.pth)")
            return variables
        from sfmnext_tpu.utils import checkpoint as ckpt

        variables = ckpt.load_modules(folder, variables, ("encoder", "depth"))
        print(f"-> finetune warm start from {folder} (orbax)")
        return variables

    def train(self, log_every: int = 50):
        from sfmnext_tpu.parallel.mesh import shard_batch

        rng = jax.random.PRNGKey(self.opt.seed)
        step = 0
        for epoch in range(self.epochs):
            for batch in self.train_loader:
                if not np.all(np.asarray(batch.get("has_valid_depth", True))):
                    continue
                jb = shard_batch(
                    {
                        "image": jnp.asarray(batch["image"]),
                        "depth": jnp.asarray(batch["depth"]),
                    },
                    self.mesh,
                )
                self.state, metrics = self.step_fn(self.state, jb, rng)
                if step % log_every == 0:
                    print(
                        f"ft epoch {epoch} step {step} "
                        f"silog={float(metrics['loss']):.4f}", flush=True,
                    )
                step += 1
            # per-epoch validate + best-abs_rel checkpoint (reference
            # train_ft_SQLdepth.py:295-316 validates every N steps; one
            # eval pass per epoch keeps eval off the train hot path)
            if self.test_loader is not None:
                m = self.validate(max_depth=self.opt.max_depth)
                print(f"ft epoch {epoch} val: {m}", flush=True)
                if m["abs_rel"] < self.best_abs_rel:
                    self.best_abs_rel = m["abs_rel"]
                    self.save("best")
                self.save("latest")

    def save(self, tag: str):
        from sfmnext_tpu.utils import checkpoint as ckpt

        folder = os.path.join(
            self.opt.log_dir, self.opt.model_name, "finetune", f"weights_{tag}"
        )
        ckpt.save_checkpoint(folder, self.state, self.opt)
        print(f"-> saved finetune checkpoint {folder}", flush=True)

    def validate(self, min_depth=1e-3, max_depth=80.0):
        """Flip-TTA eval; 9-metric dict (ref evaluate_metric_depth.py)."""
        params, stats = self.state.params, self.state.batch_stats

        @jax.jit
        def infer(images):
            from sfmnext_tpu.training.pipeline import _apply

            feats, _ = _apply(
                self.models_eval.encoder, params["encoder"],
                stats.get("encoder"), images, train=False,
            )
            out, _ = _apply(
                self.models_eval.depth, params["depth"], stats.get("depth"),
                feats, train=False,
            )
            return out["disp0"]

        all_metrics = []
        for batch in self.test_loader:
            img = jnp.asarray(batch["image"])
            gt = np.asarray(batch["depth"])
            pred = np.asarray(predict_tta(infer, img))
            for i in range(len(gt)):
                g = gt[i, ..., 0]
                from sfmnext_tpu.evaluation import resize_np_bilinear

                p = resize_np_bilinear(pred[i, ..., 0], g.shape)
                mask = (g > min_depth) & (g < max_depth)
                if mask.sum() == 0:
                    continue
                all_metrics.append(
                    compute_metric_depth_errors(g[mask], np.clip(p[mask], min_depth, max_depth))
                )
        keys = all_metrics[0].keys()
        return {k: float(np.mean([m[k] for m in all_metrics])) for k in keys}
