"""Import a reference ``adam.pth`` (torch Adam state) into optax state.

Reference behavior: trainer.py:659-660 saves ``model_optimizer.state_dict()``
next to the model ``.pth`` files, and trainer.py:680-688 /
trainer_indoor.py:157-166 restore it so a resumed run continues with warm
Adam moments. Torch keys that state by integer parameter ids assigned in
order over ``param_groups``; the groups hold the module parameters in
registration order —

  outdoor (trainer.py:76,95,112):       [encoder, depth, pose]
  outdoor diff_lr (:128-131):           [pose], [encoder, depth]
  indoor (trainer_indoor.py:78-133):    [encoder, depth, rectify, pose]
  indoor diff_lr (:147-151):            [pose], [rectify], [encoder, depth]

Within a module, ``parameters()`` order equals the module's state_dict key
order filtered to parameters: torch's state_dict traversal lists a module's
own parameters before its buffers and parents before children, the same
traversal ``named_parameters()`` uses (pinned by
tests/test_adam_port.py::test_torch_param_order_rule against live torch).

The moment import reuses the golden-tested *weight* converters
(utils/torch_port.py): each ``exp_avg`` / ``exp_avg_sq`` tensor has its
parameter's shape, so running the module's converter on a state_dict whose
parameter entries are replaced by the moments yields the moment pytree in
our layout — the conv OIHW->HWIO / linear transposes apply to moments
identically because Adam is elementwise.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Tuple

import jax.numpy as jnp
import numpy as np

import optax

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def param_keys(sd: Dict[str, np.ndarray]) -> list:
    """Ordered parameter keys of a torch state_dict (buffers dropped)."""
    return [k for k in sd if not k.endswith(_BUFFER_SUFFIXES)]


def _module_order(opt, present: Iterable[str]) -> list:
    """Optimizer parameter-group order (see module docstring)."""
    rectify = ["rectify"] if "rectify" in present else []
    if opt.diff_lr:
        return ["pose"] + rectify + ["encoder", "depth"]
    return ["encoder", "depth"] + rectify + ["pose"]


def _convert_module(name: str, sd: Dict[str, np.ndarray], opt):
    """Run the module's weight converter; return its params pytree."""
    from sfmnext_tpu.utils import torch_port as tp

    if name == "encoder":
        params, _ = tp.convert_encoder_pth(sd, opt)
        return params
    if name == "depth":
        return tp.convert_sql_decoder(sd)
    if name == "pose":
        return tp.convert_pose_cnn(sd)
    if name == "rectify":
        params, _ = tp.convert_rectify(sd)
        return params
    raise NotImplementedError(f"no converter for optimizer module {name!r}")


def convert_adam_pth(
    folder: str, opt, modules: Iterable[str]
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Read ``<folder>/adam.pth`` -> (mu, nu, count) in our param layout.

    ``modules`` are the module names present in the live params tree; the
    ones the reference optimizer covers (encoder/depth/pose/rectify, in
    reference group order) are imported, and each moment tensor is shape-
    checked against its parameter before conversion — a mismatch means the
    ordering assumption broke, so it raises instead of mis-assigning.
    """
    import torch

    from sfmnext_tpu.utils import torch_port as tp

    adam = torch.load(
        os.path.join(folder, "adam.pth"), map_location="cpu",
        weights_only=False,
    )
    state, groups = adam["state"], adam["param_groups"]
    ids = [pid for g in groups for pid in g["params"]]

    order = _module_order(opt, modules)
    order = [m for m in order if m in set(modules)]
    sds, flat = {}, []
    for m in order:
        path = os.path.join(folder, f"{m}.pth")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"adam.pth import needs {m}.pth alongside it to recover "
                f"the torch parameter order (reference trainer.py:638-660 "
                f"always saves them together)"
            )
        sds[m] = tp.load_state_dict(path)
        flat += [(m, k) for k in param_keys(sds[m])]
    if len(ids) != len(flat):
        raise ValueError(
            f"adam.pth holds {len(ids)} parameters but "
            f"{'+'.join(order)} state_dicts hold {len(flat)} — the "
            f"checkpoint was trained with a different module set "
            f"(groups: {[len(g['params']) for g in groups]})"
        )

    mu_sd = {m: dict(sds[m]) for m in order}
    nu_sd = {m: dict(sds[m]) for m in order}
    count = 0
    for (m, k), pid in zip(flat, ids):
        s = state.get(pid)
        if s is None:  # param never stepped: torch lazily inits -> zeros
            z = np.zeros_like(sds[m][k])
            mu_sd[m][k], nu_sd[m][k] = z, z
            continue
        ea = np.asarray(s["exp_avg"], dtype=np.float32)
        if ea.shape != sds[m][k].shape:
            raise ValueError(
                f"adam.pth param {pid} shape {ea.shape} != {m}.{k} "
                f"{sds[m][k].shape}: parameter-order mismatch"
            )
        mu_sd[m][k] = ea
        nu_sd[m][k] = np.asarray(s["exp_avg_sq"], dtype=np.float32)
        count = max(count, int(s["step"]))

    mu = {m: _convert_module(m, mu_sd[m], opt) for m in order}
    nu = {m: _convert_module(m, nu_sd[m], opt) for m in order}
    return mu, nu, count


def _graft(old, new):
    """Overlay ``new`` (a {module: tree} subset) onto the ``old`` moment
    tree; optax MaskedNode leaves and modules absent from ``new`` keep
    their current (zero-init) values."""
    if isinstance(old, dict):
        return {
            k: _graft(v, new[k]) if isinstance(new, dict) and k in new else v
            for k, v in old.items()
        }
    if type(old).__name__ == "MaskedNode" or new is None:
        return old
    arr = jnp.asarray(np.asarray(new), dtype=old.dtype)
    if arr.shape != old.shape:
        raise ValueError(
            f"moment shape {arr.shape} != optimizer slot {old.shape}"
        )
    return arr


def inject_adam_state(opt_state, mu, nu, count: int):
    """Return ``opt_state`` with every ScaleByAdamState's mu/nu/count (and
    every schedule count) replaced by the imported values. Walks the state
    generically, so the plain chain, optax.multi_transform (diff_lr) and
    optax.MultiSteps (gradient accumulation) wrappers all work."""
    cnt = jnp.asarray(count, jnp.int32)

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=cnt, mu=_graft(node.mu, mu), nu=_graft(node.nu, nu)
            )
        if isinstance(node, optax.ScaleByScheduleState):
            # our StepLR schedule counts optimizer steps; torch saves no
            # scheduler state, so the Adam step count is the best anchor
            return node._replace(count=cnt)
        if hasattr(node, "_fields"):  # any other namedtuple state
            return type(node)(*[walk(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(c) for c in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(opt_state)
