#!/usr/bin/env python
"""CKA (Centered Kernel Alignment) similarity between model layers.

Behavioral reference: CKA_visualize.py:1-286 — computes linear-CKA
between feature maps of two models (or one model's layers) over a batch
of images, and writes the similarity matrix.

    python CKA_visualize.py conf/<cfg>.txt --image_path <dir> \
        [--eval_out_dir out/]
"""

import os
import sys

import numpy as np


def gram_linear(x):
    return x @ x.T


def center_gram(g):
    n = g.shape[0]
    means = g.mean(0)
    means -= means.mean() / 2
    return g - means[None, :] - means[:, None]


def cka(x, y):
    """Linear CKA between feature matrices [N, D1], [N, D2]."""
    gx = center_gram(gram_linear(x))
    gy = center_gram(gram_linear(y))
    hsic = (gx.ravel() * gy.ravel()).sum()
    nx = np.linalg.norm(gx)
    ny = np.linalg.norm(gy)
    return float(hsic / (nx * ny + 1e-12))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sfmnext_tpu.config import parse_options
    from sfmnext_tpu.evaluation import load_eval_variables
    from sfmnext_tpu.models.resnet import ResNetEncoder

    opt = parse_options(argv if argv is not None else sys.argv[1:])
    models, variables = load_eval_variables(opt)

    # tap the ResNet pyramid levels as "layers"
    enc = ResNetEncoder(num_layers=opt.num_layers)
    enc_params = variables["params"]["encoder"]["encoder"]
    enc_stats = variables["batch_stats"]["encoder"]["encoder"]

    @jax.jit
    def taps(images):
        feats = enc.apply(
            {"params": enc_params, "batch_stats": enc_stats}, images
        )
        return [f.mean(axis=(1, 2)) for f in feats]  # GAP per level

    paths = []
    if opt.image_path and os.path.isdir(opt.image_path):
        paths = [
            os.path.join(opt.image_path, f)
            for f in sorted(os.listdir(opt.image_path))
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        ][:32]
    if not paths:
        raise SystemExit("--image_path must point to a folder of images")

    imgs = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize(
            (opt.width, opt.height), Image.LANCZOS
        )
        imgs.append(np.asarray(img, np.float32) / 255.0)
    x = jnp.asarray(np.stack(imgs))

    feats = [np.asarray(f) for f in taps(x)]
    n = len(feats)
    sim = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            sim[i, j] = cka(feats[i], feats[j])

    out_dir = opt.eval_out_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "cka_matrix.npy"), sim)
    print("CKA matrix (encoder pyramid levels):")
    print(np.array_str(sim, precision=3))


if __name__ == "__main__":
    main()
