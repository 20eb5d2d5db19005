#!/usr/bin/env python
"""Visualize SQL energy (attention) maps for an input image.

Behavioral reference: attn_visualize.py:1-232 (torch forward hooks via
``visualizer.get_local``). Here the decoder exposes its energy maps
directly (SQLDecoder(return_energy=True)) — no hook machinery needed.

    python attn_visualize.py conf/<cfg>.txt --image_path img.png \
        [--eval_out_dir out/]
Saves a grid of per-query softmax-normalized energy maps plus the depth.
"""

import os
import sys

import numpy as np


def main(argv=None):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sfmnext_tpu.config import parse_options
    from sfmnext_tpu.evaluation import load_eval_variables
    from sfmnext_tpu.models import SQLDecoder
    from test_simple_SQL_config import colormap_plasma

    opt = parse_options(argv if argv is not None else sys.argv[1:])
    if opt.image_path is None:
        raise SystemExit("--image_path is required")
    out_dir = opt.eval_out_dir or os.path.dirname(opt.image_path) or "."
    os.makedirs(out_dir, exist_ok=True)

    models, variables = load_eval_variables(opt)
    depth_model = dataclasses.replace(models.depth, return_energy=True)

    @jax.jit
    def infer(params, stats, images):
        feats = models.encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            images,
        )
        return depth_model.apply({"params": params["depth"]}, feats)

    img = Image.open(opt.image_path).convert("RGB")
    feed = img.resize((opt.width, opt.height), Image.LANCZOS)
    x = jnp.asarray(np.asarray(feed, np.float32) / 255.0)[None]
    out = infer(variables["params"], variables["batch_stats"], x)

    energy = np.asarray(out["energy"])[0]  # [h,w,Q]
    h, w, q = energy.shape
    # softmax over pixels per query (the attention the summary uses)
    e = energy.reshape(-1, q)
    e = np.exp(e - e.max(0, keepdims=True))
    attn = (e / e.sum(0, keepdims=True)).reshape(h, w, q)

    n_show = min(16, q)
    cols = 4
    rows = -(-n_show // cols)
    grid = np.zeros((rows * h, cols * w), np.float32)
    for i in range(n_show):
        r, c = divmod(i, cols)
        a = attn[:, :, i]
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = a / (a.max() + 1e-12)

    stem = os.path.splitext(os.path.basename(opt.image_path))[0]
    Image.fromarray((grid * 255).astype(np.uint8)).save(
        os.path.join(out_dir, f"{stem}_attn.png")
    )
    depth = np.asarray(out["disp0"])[0, :, :, 0]
    Image.fromarray(colormap_plasma(depth)).save(
        os.path.join(out_dir, f"{stem}_attn_depth.jpeg")
    )
    print(f"-> saved {stem}_attn.png ({n_show}/{q} queries) to {out_dir}")


if __name__ == "__main__":
    main()
