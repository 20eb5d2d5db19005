"""Indoor pipeline loss-optimization regression (tiny scale, CPU).

The synthetic-rig finding behind this test (round 5, docs/
convergence_band_r5.md): at 192x640 / 288x384 the indoor formulation
(rectify + occlusion-weighted min-reprojection + photo-geo) collapses
depth to a near-flat map on the synthetic drive scenes — median-scaled
abs_rel then freezes at the GT spread (~0.137) regardless of training,
with or without rotation shake, on TPU and CPU alike — while the outdoor
formulation on the same scenes reaches abs_rel 0.057-0.074. So abs_rel
is NOT a usable indoor regression signal on this rig. What IS stable is
loss optimization at small scale (measured: 0.225 -> 0.036 over 60
steps), which exercises the full indoor stack end-to-end: RectifyNet
forward+grads, occ-weighted min-reprojection, photo_geo losses, BN-stat
threading, optimizer. Numeric parity with the reference is pinned
separately by tests/test_indoor_golden.py (loss AND gradients vs live
torch).
"""

import jax
import jax.numpy as jnp

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import SyntheticDriveDataset
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.step import TrainState, make_optimizer, make_train_step


def test_indoor_pipeline_optimizes_loss():
    opt = Options(
        backbone="resnet", num_layers=18, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=64, width=96,
        batch_size=2, min_depth=0.1, max_depth=40.0, learning_rate=2e-4,
        use_rectify_net=True, use_improved_mini_reproj_loss=True,
    ).validate()
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    tx = make_optimizer(opt, 10_000)
    state = TrainState.create(variables, tx)
    step = make_train_step(opt, models, tx, donate=False)

    ds = SyntheticDriveDataset(64, 96, seed=1)
    b = ds.batch(2)
    b.pop("depth_gt", None)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    rng = jax.random.PRNGKey(0)

    first = None
    p0 = jax.tree_util.tree_leaves(state.params["encoder"])[0].copy()
    for i in range(50):
        state, m = step(state, batch, rng)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last == last, "indoor loss went NaN"
    # measured trajectory: 0.225 -> ~0.04 by step 50; require a 2x cut
    assert last < 0.5 * first, (
        f"indoor pipeline no longer optimizes: loss {first:.4f} -> {last:.4f}"
    )
    p1 = jax.tree_util.tree_leaves(state.params["encoder"])[0]
    assert float(jnp.abs(p1 - p0).max()) > 0, "encoder params never updated"
