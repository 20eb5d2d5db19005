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

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
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
