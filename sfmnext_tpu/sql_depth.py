"""SQLdepth: self-contained encoder+decoder inference wrapper.

Behavioral reference: SQLdepth.py:9-50 — one object bundling the encoder
and SQL decoder, optional pretrained load, forward returns the raw depth
map. Used by test_simple and the metric finetune.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sfmnext_tpu.config import Options
from sfmnext_tpu.training.builder import build_models, init_params


class SQLdepth:
    """Callable depth model: images [B,H,W,3] in [0,1] -> depth [B,H,W,1]."""

    def __init__(self, opt: Options, train: bool = False):
        self.opt = opt.validate()
        self.models = build_models(opt, train=train)
        self.variables = init_params(
            opt, self.models, jax.random.PRNGKey(opt.seed)
        )
        if opt.load_pretrained_model and opt.load_pt_folder:
            from sfmnext_tpu.evaluation import load_eval_variables
            import dataclasses

            _, self.variables = load_eval_variables(
                dataclasses.replace(opt, load_weights_folder=opt.load_pt_folder)
            )

        models = self.models

        @jax.jit
        def _forward(params, stats, images):
            feats = models.encoder.apply(
                {"params": params["encoder"], "batch_stats": stats["encoder"]},
                images,
            )
            out = models.depth.apply({"params": params["depth"]}, feats)
            from sfmnext_tpu.ops.image import resize_bilinear

            b, h, w, _ = images.shape
            return resize_bilinear(out["disp0"], (h, w), align_corners=False)

        self._forward = _forward

    def __call__(self, images):
        return self._forward(
            self.variables["params"], self.variables["batch_stats"],
            jnp.asarray(images),
        )
