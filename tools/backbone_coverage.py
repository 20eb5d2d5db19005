"""Audit Unet backbone coverage against the reference's model zoo.

Abstractly initializes (jax.eval_shape — no FLOPs, no params materialized)
a Unet for every name in the reference's ``__available_models__`` table
(networks/Unet.py:316-383, shipped as sfmnext_tpu/models/unet_zoo.py) and
reports which names build with the half-resolution output contract and
which raise.

    python tools/backbone_coverage.py [--fast]

--fast only checks names whose family dispatch differs (one per detected
prefix group) — a quick smoke; the full run takes ~20 min on one CPU core.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from sfmnext_tpu.models.unet import Unet
from sfmnext_tpu.models.unet_zoo import __available_models__


def check(name: str) -> str | None:
    """Returns None if the backbone builds, else the error string."""
    m = Unet(backbone=name, num_classes=16, decoder_channels=(64, 48, 32, 16))

    def build():
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
        return m.apply(v, jnp.zeros((1, 64, 96, 3)))

    try:
        y = jax.eval_shape(build)
        if y.shape != (1, 32, 48, 16):
            return f"bad output shape {y.shape}"
        return None
    except (ValueError, NotImplementedError, RuntimeError, KeyError,
            TypeError) as e:
        return str(e).splitlines()[0][:100]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    names = sorted(set(__available_models__))
    if args.fast:
        seen, picked = set(), []
        for n in names:
            key = "".join(c for c in n if not c.isdigit()).split("_")[0]
            if key not in seen:
                seen.add(key)
                picked.append(n)
        names = picked

    ok, bad = [], {}
    for i, n in enumerate(names):
        err = check(n)
        if err is None:
            ok.append(n)
        else:
            bad[n] = err
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}] ok={len(ok)} missing={len(bad)}",
                  file=sys.stderr)

    print(f"\nsupported: {len(ok)}/{len(names)} "
          f"({100.0 * len(ok) / len(names):.1f}%)")
    if bad:
        print("\nunsupported:")
        for n, err in sorted(bad.items()):
            print(f"  {n}: {err}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
