"""On-device augmentation: horizontal flip + torch-style ColorJitter.

Behavioral reference: datasets/mono_dataset.py:140-141 (50% color-jitter,
50% flip per item), :177-180 (ColorJitter(brightness/contrast/saturation
0.8-1.2, hue ±0.1) — same jitter for all frames of an item so the pose net
sees consistent appearance).

TPU-first: the reference jitters on CPU worker processes (PIL); this host
has one core, so augmentation runs inside the jitted train step on device,
vectorized over the batch. Semantics match torchvision ColorJitter:
  * per-op factor sampled uniformly; ops applied in a random order
  * brightness: x*f;  contrast: blend with grayscale mean;
    saturation: blend with per-pixel grayscale; hue: HSV hue shift
  * clamp to [0,1] after each op

The flip is applied to *both* color and color_aug (and flips the stereo
baseline sign, mono_dataset.py:195-197); the jitter only to color_aug.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy: this module may first be imported inside a jit trace, and a
# module-level jnp constant created during tracing leaks a tracer
_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


def _blend(a, b, f):
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def adjust_contrast(img, f):
    # torchvision: blend with the mean of the grayscale image
    gray = (img * _GRAY).sum(-1, keepdims=True)
    mean = gray.mean(axis=(-3, -2), keepdims=True)
    return _blend(img, mean, f)


def adjust_saturation(img, f):
    gray = (img * _GRAY).sum(-1, keepdims=True)
    return _blend(img, gray, f)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta > 0, h, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6

    def pick(cases):
        # 6-way select chain: pure VPU ops. (jnp.choose lowers to an XLA
        # gather — ~3 ns/element on TPU — which made augmentation ~100x
        # slower than the rest of the train step.)
        out = cases[5]
        for idx in range(4, -1, -1):
            out = jnp.where(i == idx, cases[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, shift):
    h, s, v = _rgb_to_hsv(img)
    h = (h + shift) % 1.0
    return jnp.clip(_hsv_to_rgb(h, s, v), 0.0, 1.0)


def color_jitter_single(img, rng):
    """torchvision ColorJitter on one image stack [..., H, W, 3] in [0,1].

    Factors: brightness/contrast/saturation U(0.8,1.2), hue U(-0.1,0.1),
    applied in a random order (torchvision get_params).
    """
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(rng, 5)
    fb = jax.random.uniform(k_b, (), minval=0.8, maxval=1.2)
    fc = jax.random.uniform(k_c, (), minval=0.8, maxval=1.2)
    fs = jax.random.uniform(k_s, (), minval=0.8, maxval=1.2)
    fh = jax.random.uniform(k_h, (), minval=-0.1, maxval=0.1)
    order = jax.random.permutation(k_perm, 4)

    def apply_op(img, op_idx):
        return jax.lax.switch(
            op_idx,
            [
                lambda x: adjust_brightness(x, fb),
                lambda x: adjust_contrast(x, fc),
                lambda x: adjust_saturation(x, fs),
                lambda x: adjust_hue(x, fh),
            ],
            img,
        )

    for j in range(4):
        img = apply_op(img, order[j])
    return img


def jitter_params(key):
    """Factor/order draws of ``color_jitter_single`` for one sample.

    Split out so the fused Pallas jitter kernel consumes the EXACT same
    per-sample randomness as the vmapped XLA path (same key tree, same
    draw order) — swapping paths never changes the augmentation stream.
    """
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), minval=0.8, maxval=1.2)
    fc = jax.random.uniform(k_c, (), minval=0.8, maxval=1.2)
    fs = jax.random.uniform(k_s, (), minval=0.8, maxval=1.2)
    fh = jax.random.uniform(k_h, (), minval=-0.1, maxval=0.1)
    order = jax.random.permutation(k_perm, 4)
    return order, jnp.stack([fb, fc, fs, fh])


def augment_batch(batch, rng, allow_flip: bool = True,
                  use_pallas: bool = False):
    """Apply per-sample flip (50%) and color jitter (50%) on device.

    Args:
      batch: dict with 'color' [B,F,H,W,3] (in [0,1]); optional 'stereo_T',
        'depth_gt'. 'color_aug' is produced here.
      rng: PRNG key.
      use_pallas: ride the fused ColorJitter kernel on TPU
        (ops/pallas/jitter_kernel.py) — one HBM read+write instead of the
        ~16 materialized passes of the vmapped 4-branch switch chain.
    Returns:
      new batch dict with augmented 'color'/'color_aug' (+ flipped
      stereo_T / depth_gt when present).
    """
    color = batch["color"]
    b = color.shape[0]
    k_flip, k_dojit, k_jit = jax.random.split(rng, 3)
    flip_p = 0.5 if allow_flip else 0.0
    do_flip = jax.random.bernoulli(k_flip, flip_p, (b,))
    do_jit = jax.random.bernoulli(k_dojit, 0.5, (b,))
    jit_keys = jax.random.split(k_jit, b)

    flipped = jnp.where(
        do_flip[:, None, None, None, None], color[:, :, :, ::-1, :], color
    )

    use_kernel = use_pallas and jax.default_backend() == "tpu"
    if use_kernel:
        from sfmnext_tpu.ops.pallas import jitter_kernel

        use_kernel = jitter_kernel.supports(*color.shape[2:4])
    color_cf = None
    if use_kernel:
        order, factors = jax.vmap(jitter_params)(jit_keys)
        # the kernel consumes channel-first planes; keep that transpose
        # around as color_cf — the fused loss path samples/compares in
        # channel planes and would otherwise re-transpose every frame
        color_cf = jnp.transpose(flipped, (0, 1, 4, 2, 3))
        color_aug = jitter_kernel.color_jitter_pallas_cf(
            color_cf, order, factors, do_jit
        )
    else:
        def jit_one(img_stack, key, enable):
            out = color_jitter_single(img_stack, key)
            return jnp.where(enable, out, img_stack)

        color_aug = jax.vmap(jit_one)(flipped, jit_keys, do_jit)

    out = dict(batch)
    out["color"] = flipped
    out["color_aug"] = color_aug
    if color_cf is not None:
        out["color_cf"] = color_cf
    if "depth_gt" in batch:
        out["depth_gt"] = jnp.where(
            do_flip[:, None, None, None],
            batch["depth_gt"][:, :, ::-1, :],
            batch["depth_gt"],
        )
    if "stereo_T" in batch:
        # flip negates the baseline sign (mono_dataset.py:195-197)
        sT = batch["stereo_T"]
        sign = jnp.where(do_flip, -1.0, 1.0)
        out["stereo_T"] = sT.at[:, 0, 3].set(sT[:, 0, 3] * sign)
    return out
