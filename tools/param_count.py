#!/usr/bin/env python
"""Parameter counter (reference tools/param_count.py:6-22).

    python tools/param_count.py args_files/<config>.txt
"""

import sys


def main(argv=None):
    import jax

    from sfmnext_tpu.config import parse_options
    from sfmnext_tpu.training.builder import build_models, init_params, param_count

    opt = parse_options(argv if argv is not None else sys.argv[1:])
    models = build_models(opt, train=False)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    total = 0
    for name, tree in variables["params"].items():
        n = param_count(tree)
        total += n
        print(f"{name:<12} {n / 1e6:10.3f} M params")
    print(f"{'total':<12} {total / 1e6:10.3f} M params")


if __name__ == "__main__":
    main()
