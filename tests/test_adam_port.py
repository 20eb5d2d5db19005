"""Torch ``adam.pth`` import (utils/adam_port.py).

Reference trainer.py:659-660 saves ``model_optimizer.state_dict()`` and
:680-688 restores it. These tests pin:
  * the parameter-order rule (state_dict keys minus buffers ==
    ``named_parameters()`` order) against LIVE torch — the importer's one
    structural assumption about torch internals;
  * the end-to-end round trip: a reference-style checkpoint folder with a
    synthetic adam.pth whose moments are recognizable functions of the
    weights imports into optax state with the moments landing on the right
    flax parameters (layout transposes applied), for the plain chain, the
    diff_lr multi_transform wrapper, and the MultiSteps accumulation
    wrapper.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sfmnext_tpu.config import Options
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.step import TrainState, make_optimizer
from sfmnext_tpu.utils import adam_port
from sfmnext_tpu.utils.torch_export import save_reference_style_checkpoint


def tiny_opt(**kw):
    d = dict(
        backbone="resnet", num_layers=18, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=64, width=96,
        batch_size=2, weights_init="scratch",
    )
    d.update(kw)
    return Options(**d).validate()


def test_torch_param_order_rule():
    """state_dict keys filtered of buffers == named_parameters() order."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(4, 8, 3)
            self.bn = nn.BatchNorm2d(8)  # buffers interleave here
            self.fc = nn.Linear(8, 4)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(3, 4, 7, stride=2, bias=False)
            self.norm = nn.BatchNorm2d(4)
            self.blocks = nn.Sequential(Block(), Block())
            self.head = nn.Linear(4, 2)

    net = Net()
    sd_order = adam_port.param_keys(
        {k: v.numpy() for k, v in net.state_dict().items()}
    )
    np_order = [n for n, _ in net.named_parameters()]
    assert sd_order == np_order


def test_torch_adam_state_ids_are_group_order():
    """Torch assigns Adam state ids 0..N-1 in param_groups order."""
    import torch
    import torch.nn as nn

    net = nn.Sequential(nn.Conv2d(3, 4, 3), nn.BatchNorm2d(4), nn.Linear(4, 2))
    a, b = list(net[0].parameters()), list(net[1].parameters()) + list(
        net[2].parameters()
    )
    optim = torch.optim.Adam([{"params": a}, {"params": b, "lr": 1e-3}])
    out = net[2](net[1](net[0](torch.randn(1, 3, 8, 8))).mean((2, 3)))
    out.sum().backward()
    optim.step()
    sd = optim.state_dict()
    ids = [pid for g in sd["param_groups"] for pid in g["params"]]
    assert ids == list(range(len(a) + len(b)))
    ordered = a + b
    for pid, p in zip(ids, ordered):
        assert sd["state"][pid]["exp_avg"].shape == p.shape


def _write_synthetic_adam(folder, order):
    """adam.pth with exp_avg = 2*param, exp_avg_sq = 3*param^2, step=7,
    ids assigned over ``order`` (the reference's param-group layout)."""
    import torch

    state, groups_params = {}, []
    pid = 0
    for group in order:
        gp = []
        for m in group:
            sd = torch.load(
                f"{folder}/{m}.pth", map_location="cpu", weights_only=False
            )
            for k in adam_port.param_keys(
                {k: v for k, v in sd.items() if hasattr(v, "numpy")}
            ):
                state[pid] = {
                    "step": torch.tensor(7.0),
                    "exp_avg": 2.0 * sd[k],
                    "exp_avg_sq": 3.0 * sd[k] * sd[k],
                }
                gp.append(pid)
                pid += 1
        groups_params.append(gp)
    torch.save(
        {
            "state": state,
            "param_groups": [
                {"params": gp, "lr": 1e-4} for gp in groups_params
            ],
        },
        f"{folder}/adam.pth",
    )


def _tree_allclose(a, b, rtol=1e-5, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=rtol, atol=atol,
        )


def _setup(tmp_path, **okw):
    opt = tiny_opt(**okw)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    save_reference_style_checkpoint(
        str(tmp_path), variables["params"], variables["batch_stats"], opt
    )
    return opt, variables


@pytest.mark.parametrize("accum", [1, 2])
def test_adam_import_roundtrip(tmp_path, accum):
    opt, variables = _setup(tmp_path, accumulation_steps=accum)
    _write_synthetic_adam(str(tmp_path), [["encoder", "depth", "pose"]])

    mu, nu, count = adam_port.convert_adam_pth(
        str(tmp_path), opt, modules=tuple(variables["params"])
    )
    assert count == 7
    for m in ("encoder", "depth", "pose"):
        _tree_allclose(
            mu[m],
            jax.tree_util.tree_map(lambda p: 2.0 * p, variables["params"][m]),
        )
        _tree_allclose(
            nu[m],
            jax.tree_util.tree_map(
                lambda p: 3.0 * p * p, variables["params"][m]
            ),
        )

    tx = make_optimizer(opt, steps_per_epoch=10)
    state = TrainState.create(variables, tx)
    new_opt = adam_port.inject_adam_state(state.opt_state, mu, nu, count)
    adams = [
        n for n in jax.tree_util.tree_leaves(
            new_opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(n, optax.ScaleByAdamState)
    ]
    assert len(adams) == 1
    assert int(adams[0].count) == 7
    _tree_allclose(
        adams[0].mu["encoder"],
        jax.tree_util.tree_map(
            lambda p: 2.0 * p, variables["params"]["encoder"]
        ),
    )


def test_adam_import_diff_lr(tmp_path):
    """diff_lr: torch groups are [pose], [encoder, depth]; our optimizer is
    a multi_transform whose masked Adam states must each get their slice."""
    opt, variables = _setup(tmp_path, diff_lr=True)
    _write_synthetic_adam(str(tmp_path), [["pose"], ["encoder", "depth"]])

    mu, nu, count = adam_port.convert_adam_pth(
        str(tmp_path), opt, modules=tuple(variables["params"])
    )
    tx = make_optimizer(opt, steps_per_epoch=10)
    state = TrainState.create(variables, tx)
    new_opt = adam_port.inject_adam_state(state.opt_state, mu, nu, count)

    adams = [
        n for n in jax.tree_util.tree_leaves(
            new_opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(n, optax.ScaleByAdamState)
    ]
    assert len(adams) == 2
    # each masked state carries real moments where unmasked
    seen = set()
    for st in adams:
        for m in ("encoder", "depth", "pose"):
            leaf = jax.tree_util.tree_leaves(st.mu[m])
            if leaf and not type(leaf[0]).__name__ == "MaskedNode":
                seen.add(m)
                _tree_allclose(
                    st.mu[m],
                    jax.tree_util.tree_map(
                        lambda p: 2.0 * p, variables["params"][m]
                    ),
                )
    assert seen == {"encoder", "depth", "pose"}


def test_adam_import_mismatch_raises(tmp_path):
    """A checkpoint trained with a different module set fails loudly."""
    import torch

    opt, variables = _setup(tmp_path)
    _write_synthetic_adam(str(tmp_path), [["encoder", "depth", "pose"]])
    adam = torch.load(
        f"{tmp_path}/adam.pth", map_location="cpu", weights_only=False
    )
    adam["param_groups"][0]["params"] = adam["param_groups"][0]["params"][:-2]
    torch.save(adam, f"{tmp_path}/adam.pth")
    with pytest.raises(ValueError, match="different module set"):
        adam_port.convert_adam_pth(
            str(tmp_path), opt, modules=tuple(variables["params"])
        )
