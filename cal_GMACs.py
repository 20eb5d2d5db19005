#!/usr/bin/env python
"""GMACs / params counter via XLA cost analysis.

Behavioral reference: cal_GMACs.py:44-57 (which uses ptflops). The
TPU-native equivalent reads the compiled executable's cost analysis —
exact for the program XLA actually runs.

    python cal_GMACs.py args_files/<config>.txt
"""

import sys


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from sfmnext_tpu.config import parse_options
    from sfmnext_tpu.training.builder import build_models, init_params, param_count

    opt = parse_options(argv if argv is not None else sys.argv[1:])
    models = build_models(opt, train=False)
    variables = init_params(opt, models, jax.random.PRNGKey(0))

    def fwd(params, stats, img):
        feats = models.encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]}, img
        )
        return models.depth.apply({"params": params["depth"]}, feats)["disp0"]

    img = jnp.zeros((1, opt.height, opt.width, 3), jnp.float32)
    compiled = (
        jax.jit(fwd)
        .lower(variables["params"], variables["batch_stats"], img)
        .compile()
    )
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", float("nan")))
    print(
        f"input {opt.width}x{opt.height}  "
        f"GMACs: {flops / 2 / 1e9:.2f}  "
        f"params: {param_count(variables['params']) / 1e6:.2f} M"
    )


if __name__ == "__main__":
    main()
