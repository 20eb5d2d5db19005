"""Indoor pipeline tests: occ loss, photo-geo loss, rectify net path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.step import (
    TrainState,
    make_optimizer,
    make_train_step,
    select_pipeline,
)


def indoor_options(**kw):
    d = dict(
        backbone="resnet", num_layers=18, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=64, width=96,
        batch_size=2, max_depth=10.0, dataset="nyu_raw",
        steps_per_epoch=2,
    )
    d.update(kw)
    return Options(**d).validate()


def run_one_step(opt):
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    tx = make_optimizer(opt, 2)
    state = TrainState.create(variables, tx)
    step = make_train_step(opt, models, tx, donate=False)
    batch = make_batch(2, 64, 96)
    batch["K3x3"] = batch["K"][:, :3, :3].copy()
    batch.pop("depth_gt")
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    return new_state, metrics


def test_pipeline_selector():
    from sfmnext_tpu.training.indoor import forward_indoor
    from sfmnext_tpu.training.pipeline import forward

    assert select_pipeline(indoor_options()) is forward_indoor
    assert (
        select_pipeline(
            Options(
                backbone="resnet", num_layers=18, height=64, width=96,
                patch_size=4, query_nums=16,
            )
        )
        is forward
    )


def test_indoor_improved_reproj_loss():
    opt = indoor_options(use_improved_mini_reproj_loss=True)
    state, metrics = run_one_step(opt)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss/l1_reg" in metrics


def test_indoor_photo_geo_loss():
    opt = indoor_options(use_photo_geo_loss=True)
    state, metrics = run_one_step(opt)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss/photo" in metrics and "loss/geo" in metrics


def test_indoor_with_rectify_net():
    opt = indoor_options(use_improved_mini_reproj_loss=True, use_rectify_net=True)
    state, metrics = run_one_step(opt)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss/rc" in metrics and "loss/rt" in metrics
    # rectify params got gradients (changed after the step)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    before = jax.tree_util.tree_leaves(variables["params"]["rectify"])[0]
    after = jax.tree_util.tree_leaves(state.params["rectify"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_indoor_grad_accumulation():
    opt = indoor_options(
        use_improved_mini_reproj_loss=True, accumulation_steps=2
    )
    state, metrics = run_one_step(opt)
    assert np.isfinite(float(metrics["loss"]))
