#!/usr/bin/env python
"""Audit: train-mode and eval-mode builds must be the SAME architecture.

A positional-argument shift once routed ``self.train`` into NFBlock's
``reg`` field, so every train-mode NFNet silently built NF-RegNet
topology while all golden/coverage checks (eval-mode) stayed green
(models/nfnet.py). This sweep eval_shapes every Unet zoo backbone under
train=True and train=False and diffs the parameter pytrees — any
difference is an architecture leak of the train flag.

    python tools/train_eval_shape_audit.py [first_n]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from sfmnext_tpu.models.unet_zoo import __available_models__ as UNET_BACKBONES
from sfmnext_tpu.config import Options
from sfmnext_tpu.training.builder import build_models, init_params


def shapes(opt, train):
    models = build_models(opt, train=train)
    v = jax.eval_shape(
        lambda k: init_params(opt, models, k), jax.random.PRNGKey(0)
    )
    return jax.tree_util.tree_map(lambda x: x.shape, v["params"])


def main():
    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else None
    names = sorted(UNET_BACKBONES)[:first_n]
    bad, skipped = [], []
    for i, name in enumerate(names):
        opt = Options(
            backbone=name, height=64, width=96, patch_size=4, query_nums=16,
            dim_out=16, model_dim=16, num_features=64,
            dec_channels=(64, 48, 32, 24),
        ).validate()
        try:
            st = shapes(opt, True)
            se = shapes(opt, False)
        except Exception as e:  # build failures are backbone_coverage's job
            skipped.append((name, str(e)[:80]))
            continue
        if st != se:
            bad.append(name)
            print(f"MISMATCH {name}", flush=True)
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}] ok so far", flush=True)
    print(f"checked {len(names) - len(skipped)}, mismatches: {bad}")
    if skipped:
        print(f"skipped (build error): {[n for n, _ in skipped]}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
