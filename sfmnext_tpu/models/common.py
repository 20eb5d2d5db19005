"""Shared model building blocks and torch-matching initializers.

The reference trains many modules from random init (pose nets, decoders,
SQL head). Torch's default inits differ from Flax's; to keep from-scratch
training dynamics comparable we reproduce them:

  * torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) on weights
    == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), ...).
  * torchvision ResNet: kaiming_normal(fan_out, relu) on convs, BN gamma=1
    beta=0 (networks/resnet_encoder.py:36-41).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torch Conv2d/Linear default weight init (kaiming_uniform with a=sqrt(5)):
# bound = sqrt(1/fan_in) -> variance_scaling(1/3, fan_in, uniform).
torch_default_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

# torchvision ResNet conv init: kaiming_normal(mode=fan_out, nonlinearity=relu).
kaiming_normal_fanout = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)


def torch_default_bias_init(fan_in: int):
    """torch Conv2d/Linear default bias init: U(-1/sqrt(fan_in), +...)."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _s2d_kernel(kern):
    """Rearrange an odd-k stride-2 conv kernel for 2x2 space-to-depth input.

    A k x k stride-2 SAME conv on [H,W,C] is exactly a K2 x K2 stride-1
    conv on the space-to-depth transform [H/2,W/2,4C]: source row
    r = 2i + a - k//2 splits by parity into phase p = r % 2 and window
    offset m = (r - p) / 2 - i. Returns (kernel [K2,K2,4C,O], (lo, hi))
    where (lo, hi) is the per-side spatial padding.
    """
    k, _, c, o = kern.shape
    pad = k // 2
    rows = []
    for a in range(k):
        r = a - pad
        p = r % 2
        rows.append((p, (r - p) // 2))
    min_off = min(m for _, m in rows)
    max_off = max(m for _, m in rows)
    k2 = max_off - min_off + 1
    k6 = jnp.zeros((k2, 2, k2, 2, c, o), kern.dtype)
    for a, (pa, ma) in enumerate(rows):
        for b, (pb, mb) in enumerate(rows):
            k6 = k6.at[ma - min_off, pa, mb - min_off, pb].set(kern[a, b])
    k_s2d = k6.transpose(0, 2, 1, 3, 4, 5).reshape(k2, k2, 4 * c, o)
    return k_s2d, (-min_off, max_off)


class S2DConv(nn.Module):
    """Odd-k stride-2 conv computed via 2x2 space-to-depth (MXU-friendly).

    TPU-first: the 7x7/s2 stem conv on a 3-channel image runs at ~3% MXU
    utilization (the contraction dim 7*3 pads to a full register tile and
    stride-2 halves tile occupancy). Space-to-depth folds the stride into
    the channel dim — contraction 4*4*12 — for the SAME arithmetic
    (bit-identical weights; the kernel is rearranged at trace time).
    Param tree matches a bare ``nn.Conv`` ({kernel[, bias]}) so all torch
    converters keep working. Falls back to the plain conv for odd
    spatial sizes.
    """

    features: int
    kernel: int
    use_bias: bool = False
    kernel_init: object = kaiming_normal_fanout
    bias_init: object = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kern = self.param(
            "kernel", self.kernel_init,
            (self.kernel, self.kernel, c, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kern = kern.astype(self.dtype)
        b, h, w, _ = x.shape
        if h % 2 or w % 2:
            pad = self.kernel // 2
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x, kern, (2, 2), ((pad, pad), (pad, pad)),
                dimension_numbers=dn,
            )
        else:
            xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c
            )
            k_s2d, (lo, hi) = _s2d_kernel(kern)
            dn = jax.lax.conv_dimension_numbers(
                xs.shape, k_s2d.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                xs, k_s2d, (1, 1), ((lo, hi), (lo, hi)),
                dimension_numbers=dn,
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class TorchConv(nn.Module):
    """Conv2d with torch default init semantics. NHWC, bias=True default."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: object = 0  # int or 'SAME'/'VALID' or explicit
    use_bias: bool = True
    kernel_init: object = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = kh * kw * x.shape[-1]
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_default_kernel_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class TorchLinear(nn.Module):
    """Dense with torch default init semantics."""

    features: int
    use_bias: bool = True
    kernel_init: object = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_default_kernel_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5).

    Collections: params (scale/bias), batch_stats (mean/var). Under a
    data-sharded mesh the batch statistics are computed over the *global*
    batch (XLA inserts the cross-replica reduction) — i.e. sync-BN, unlike
    the reference's per-GPU DataParallel stats. Documented deviation.
    """

    use_running_average: bool = True
    dtype: object = None
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=self.eps,
            dtype=self.dtype,
        )(x)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def se_module(x, rd_channels: int, dtype, name: str):
    """Squeeze-and-excitation (Hu et al.): pool -> 1x1 -> ReLU -> 1x1 -> sigmoid.

    Shared by the se/sk/regnety encoder families (the reference reaches
    these via timm backbone names, networks/Unet.py:316-383).
    """
    s = x.mean(axis=(1, 2), keepdims=True)
    s = nn.Conv(
        rd_channels, (1, 1), use_bias=True, dtype=dtype, name=f"{name}_fc1"
    )(s)
    s = nn.relu(s)
    s = nn.Conv(
        x.shape[-1], (1, 1), use_bias=True, dtype=dtype, name=f"{name}_fc2"
    )(s)
    return x * nn.sigmoid(s)


def eca_module(x, dtype, name: str):
    """Efficient channel attention (ECA-Net, Wang et al. CVPR'20).

    Global-avg-pool -> 1-D conv across the channel axis (adaptive odd
    kernel ``k`` from ``C`` with gamma=2, beta=1) -> sigmoid gate. Used by
    the reference's ``ecaresnet*`` timm backbones (networks/Unet.py:330).
    """
    c = x.shape[-1]
    t = int(abs((math.log2(c) + 1.0) / 2.0))
    k = max(t if t % 2 else t + 1, 3)
    s = x.mean(axis=(1, 2))[..., None]  # [B, C, 1]: channels as "space"
    s = nn.Conv(
        1, (k,), padding=k // 2, use_bias=False, dtype=dtype, name=f"{name}_conv"
    )(s)
    return x * nn.sigmoid(s.reshape(s.shape[0], 1, 1, c))


def avg_pool_2x2_s2_ceil(x):
    """torch AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False).

    The shortcut pool of timm's avg-down resnets (resnet*d / gluon v1d).
    """
    h, w = x.shape[1:3]
    return nn.avg_pool(
        x, (2, 2), strides=(2, 2), padding=((0, h % 2), (0, w % 2)),
        count_include_pad=False,
    )
