"""End-to-end train-step tests: tiny model, synthetic data, 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.parallel.mesh import make_mesh, shard_batch
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.step import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def tiny_options(**kw):
    defaults = dict(
        backbone="resnet",
        num_layers=18,
        num_features=64,
        model_dim=16,
        patch_size=4,
        query_nums=16,
        dim_out=16,
        height=64,
        width=96,
        batch_size=8,
        steps_per_epoch=2,
    )
    defaults.update(kw)
    return Options(**defaults).validate()


@pytest.fixture(scope="module")
def setup():
    opt = tiny_options()
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    tx = make_optimizer(opt, steps_per_epoch=2)
    state = TrainState.create(variables, tx)
    return opt, models, tx, state


def test_train_step_runs_and_loss_finite(setup):
    opt, models, tx, state = setup
    step_fn = make_train_step(opt, models, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params actually changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_loss_decreases_on_fixed_batch(setup):
    opt, models, tx, _ = setup
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(opt, models, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96, seed=3))
    first = None
    for i in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first, (
        f"loss did not decrease: {first} -> {float(metrics['loss'])}"
    )


def test_train_step_sharded_over_mesh(setup):
    """The data-parallel path: batch sharded over 8 virtual devices."""
    opt, models, tx, state = setup
    mesh = make_mesh(8)
    step_fn = make_train_step(opt, models, tx, mesh=mesh, donate=False)
    batch = shard_batch(
        jax.tree_util.tree_map(jnp.asarray, make_batch(8, 64, 96)), mesh
    )
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # replicated-state equivalence: the sharded step must equal single-device
    single = make_train_step(opt, models, tx, donate=False)
    batch_local = jax.tree_util.tree_map(jnp.asarray, make_batch(8, 64, 96))
    _, metrics_single = single(state, batch_local, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_single["loss"]), rtol=2e-4
    )


def test_eval_step_deterministic(setup):
    opt, models_train, tx, state = setup
    models_eval = build_models(opt, train=False)
    eval_fn = make_eval_step(opt, models_eval)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96))
    m1, o1 = eval_fn(state.params, state.batch_stats, batch)
    m2, o2 = eval_fn(state.params, state.batch_stats, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))
    assert o1["depth"].shape == (2, 64, 96, 1)


def test_stereo_frame_uses_stereo_T(setup):
    opt = tiny_options(use_stereo=True, frame_ids=(0, -1, 1))
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    tx = make_optimizer(opt, 2)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(opt, models, tx, donate=False)

    batch = make_batch(2, 64, 96, frame_ids=(0, -1, 1, 2))  # 4th frame = "s"
    stereo_T = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    stereo_T[:, 0, 3] = 0.1
    batch["stereo_T"] = stereo_T
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_gradient_accumulation(setup):
    opt = tiny_options(accumulation_steps=2)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    tx = make_optimizer(opt, 2)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(opt, models, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96))
    # first micro-step must NOT change params (accumulating)
    s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    np.testing.assert_allclose(p0, p1)
    # second micro-step applies the update
    s2, _ = step_fn(s1, batch, jax.random.PRNGKey(2))
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    assert not np.allclose(p1, p2)


def test_predictive_mask_path():
    """--predictive_mask constructs + trains the mask decoder and weights
    the reprojection loss (reference trainer.py:116-126, 290-291, 495-507)."""
    opt = tiny_options(predictive_mask=True, disable_automasking=True)
    models = build_models(opt, train=True)
    assert models.predictive_mask is not None
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    assert "predictive_mask" in variables["params"]
    tx = make_optimizer(opt, 2)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(opt, models, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # mask decoder receives gradient through the weighted loss
    p0 = np.asarray(
        jax.tree_util.tree_leaves(state.params["predictive_mask"])[0]
    )
    p1 = np.asarray(
        jax.tree_util.tree_leaves(new_state.params["predictive_mask"])[0]
    )
    assert not np.allclose(p0, p1)


def test_predictive_mask_requires_no_automask():
    with pytest.raises(AssertionError):
        build_models(tiny_options(predictive_mask=True), train=True)


@pytest.mark.parametrize("pose_type", ["posecnn", "separate_resnet", "shared"])
@pytest.mark.parametrize("pose_input", ["pairs", "all"])
def test_pose_model_variants(pose_type, pose_input):
    """All reference pose_model_type x pose_model_input combos train
    (trainer.py:301-361; options.py pose choices)."""
    opt = tiny_options(pose_model_type=pose_type, pose_model_input=pose_input)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    if pose_type == "separate_resnet":
        assert "pose_encoder" in variables["params"]
    tx = make_optimizer(opt, 2)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(opt, models, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # pose params receive gradient
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params["pose"])[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(new_state.params["pose"])[0])
    assert not np.allclose(p0, p1)


def test_bf16_loss_stack_tracks_f32():
    """The default loss_dtype='auto' runs the photometric stacks in bf16
    under bf16 compute (statistics still accumulate f32,
    training/pipeline.py:285-301). Pin the deviation from the all-f32
    reference numerics to a tight relative band so a future change that
    degrades the bf16 stack (e.g. dropping the f32 accumulation) fails
    loudly. Covers round-2 advisor finding on pipeline.py:292."""
    from sfmnext_tpu.training.pipeline import forward

    losses = {}
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(2, 64, 96, seed=5))
    for ldt in ("float32", "bfloat16"):
        opt = tiny_options(compute_dtype="float32", loss_dtype=ldt)
        models = build_models(opt, train=True)
        variables = init_params(opt, models, jax.random.PRNGKey(0))
        total, aux = jax.jit(
            lambda p, bs, b: forward(
                models, p, bs, b, jax.random.PRNGKey(2), opt
            )
        )(variables["params"], variables["batch_stats"], batch)
        losses[ldt] = float(total)
    rel = abs(losses["bfloat16"] - losses["float32"]) / abs(losses["float32"])
    assert rel < 0.02, f"bf16 loss stack drifted {rel:.4f} from f32: {losses}"
