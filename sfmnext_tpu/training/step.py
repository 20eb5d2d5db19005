"""TrainState, optimizer, and the jitted data-parallel train step.

Optimizer parity with the reference: Adam(1e-4) + StepLR(step=15 epochs,
gamma=0.1) (trainer.py:128-135), optional 10x-lower pose LR (``--diff_lr``,
:128-131), gradient accumulation via optax.MultiSteps
(trainer_indoor.py:295-307).

TPU-native: one jit'd step over a Mesh('data'); batch sharded on axis 0,
state replicated. XLA inserts the gradient all-reduce (psum over the data
axis) because the loss is a mean over the global batch.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.augment import augment_batch
from sfmnext_tpu.parallel.mesh import batch_sharding, replicated_sharding
from sfmnext_tpu.training.builder import ModelBundle
from sfmnext_tpu.training.pipeline import forward


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(params),
        )


def step_lr_schedule(opt: Options, steps_per_epoch: int):
    """StepLR(scheduler_step_size epochs, gamma 0.1) as an optax schedule."""
    boundary = opt.scheduler_step_size * steps_per_epoch
    return optax.piecewise_constant_schedule(
        init_value=opt.learning_rate, boundaries_and_scales={boundary: 0.1}
    )


def make_optimizer(opt: Options, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = step_lr_schedule(opt, steps_per_epoch)

    def adam(lr_scale: float = 1.0):
        return optax.adam(
            lambda count: sched(count) * lr_scale, b1=0.9, b2=0.999, eps=1e-8
        )

    if opt.diff_lr:
        # pose net at lr/10 (trainer.py:128-131); the indoor trainer also
        # puts rectify in the 0.1x group (trainer_indoor.py:147-151)
        def label_fn(params):
            return {
                k: jax.tree_util.tree_map(
                    lambda _: "low" if k in ("pose", "rectify") else "main", v
                )
                for k, v in params.items()
            }

        tx = optax.multi_transform(
            {"main": adam(1.0), "low": adam(0.1)}, label_fn
        )
    else:
        tx = adam(1.0)

    if opt.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt.accumulation_steps)
    return tx


def select_pipeline(opt: Options, pipeline: str = "auto"):
    """outdoor (trainer.py) vs indoor (trainer_indoor.py) loss pipeline."""
    if pipeline == "auto":
        indoor = (
            opt.use_rectify_net
            or opt.use_photo_geo_loss
            or opt.use_improved_mini_reproj_loss
            or opt.dataset in ("nyu_raw", "mc_dataset", "mc_mini_dataset")
        )
        pipeline = "indoor" if indoor else "outdoor"
    if pipeline == "indoor":
        from sfmnext_tpu.training.indoor import forward_indoor

        return forward_indoor
    return forward


def make_train_step(
    opt: Options,
    models: ModelBundle,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    augment: bool = False,
    pipeline: str = "auto",
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    With ``augment=True`` the 50% flip + ColorJitter runs on device inside
    the step (data/augment.py) — the host feed only ships decoded frames.
    """
    forward_fn = select_pipeline(opt, pipeline)
    flip_ok = opt.dataset not in ("nyu_raw",)  # indoor NYU disables flip

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if augment:
            rng, k_aug = jax.random.split(rng)
            batch = augment_batch(
                batch, k_aug, allow_flip=flip_ok, use_pallas=opt.use_pallas
            )

        def loss_fn(params):
            total, aux = forward_fn(
                models, params, state.batch_stats, batch, rng, opt
            )
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt_state,
        )
        metrics = dict(aux["metrics"])
        # full-res depth rides along for train-time GT metrics; it is only
        # fetched on log steps (reference trainer.py:258-259)
        metrics["depth"] = aux["outputs"]["depth"]
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, dat, rep),
        # state replicated; metrics left to the partitioner (the depth map
        # stays batch-sharded, scalars end up replicated)
        out_shardings=(rep, None),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(opt: Options, models: ModelBundle, mesh=None,
                   pipeline: str = "auto"):
    """Jitted forward-only step returning (metrics, outputs)."""
    forward_fn = select_pipeline(opt, pipeline)

    def eval_step(params, batch_stats, batch):
        total, aux = forward_fn(models, params, batch_stats, batch, None, opt)
        return aux["metrics"], aux["outputs"]

    if mesh is None:
        return jax.jit(eval_step)
    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    return jax.jit(
        eval_step, in_shardings=(rep, rep, dat), out_shardings=(rep, dat)
    )


def make_infer_fn(opt: Options, models: ModelBundle, mesh=None):
    """Jitted depth inference: (params, batch_stats, images [B,H,W,3]) -> depth."""

    def infer(params, batch_stats, images):
        feats = models.encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            images,
        )
        out = models.depth.apply({"params": params["depth"]}, feats)
        b, h, w, _ = images.shape
        from sfmnext_tpu.ops.image import resize_bilinear

        return resize_bilinear(out["disp0"], (h, w), align_corners=False)

    return jax.jit(infer)
