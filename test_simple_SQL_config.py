#!/usr/bin/env python
"""Single-image depth inference CLI.

Behavioral reference: test_simple_SQL_config.py:21-116 — load image(s) from
--image_path, resize to the model's feed size, forward, bilinear-resize
back to the original resolution, save a uint16 png (depth*1000) and a
plasma-colormap jpeg next to the input.

    python test_simple_SQL_config.py conf/<config>.txt --image_path img.png
"""

import os
import sys

import numpy as np


def colormap_plasma(x: np.ndarray) -> np.ndarray:
    """normalized [H,W] -> uint8 RGB via matplotlib plasma (vmax=95th pct)."""
    import matplotlib

    vmax = np.percentile(x, 95)
    norm = np.clip(x / max(vmax, 1e-9), 0, 1)
    cmap = matplotlib.colormaps["plasma"]
    return (cmap(norm)[..., :3] * 255).astype(np.uint8)


def test_simple(opt):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sfmnext_tpu.evaluation import load_eval_variables, resize_np_bilinear

    if opt.image_path is None:
        raise SystemExit("--image_path is required")
    if os.path.isdir(opt.image_path):
        paths = sorted(
            os.path.join(opt.image_path, f)
            for f in os.listdir(opt.image_path)
            if f.lower().endswith(("." + opt.ext, ".jpg", ".jpeg", ".png"))
        )
        out_dir = opt.image_path
    else:
        paths = [opt.image_path]
        out_dir = os.path.dirname(opt.image_path) or "."

    models, variables = load_eval_variables(opt)

    @jax.jit
    def infer(images):
        feats = models.encoder.apply(
            {
                "params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"],
            },
            images,
        )
        out = models.depth.apply({"params": variables["params"]["depth"]}, feats)
        return out["disp0"][..., 0]

    print(f"-> Predicting on {len(paths)} test images")
    for idx, path in enumerate(paths):
        img = Image.open(path).convert("RGB")
        ow, oh = img.size
        feed = img.resize((opt.width, opt.height), Image.LANCZOS)
        x = jnp.asarray(np.asarray(feed, np.float32) / 255.0)[None]
        depth = np.asarray(infer(x))[0]
        depth_full = resize_np_bilinear(depth, (oh, ow))

        stem = os.path.splitext(os.path.basename(path))[0]
        png16 = (np.clip(depth_full, 0, 65.535) * 1000).astype(np.uint16)
        Image.fromarray(png16).save(
            os.path.join(out_dir, f"{stem}_depth.png")
        )
        Image.fromarray(colormap_plasma(depth_full)).save(
            os.path.join(out_dir, f"{stem}_disp.jpeg")
        )
        print(f"   Processed {idx + 1} of {len(paths)} images - saved to {out_dir}")
    print("-> Done!")


def main(argv=None):
    from sfmnext_tpu.config import parse_options

    opt = parse_options(argv if argv is not None else sys.argv[1:])
    test_simple(opt)


if __name__ == "__main__":
    main()
