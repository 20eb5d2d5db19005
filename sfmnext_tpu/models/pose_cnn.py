"""PoseCNN: 6-DoF ego-motion from a stacked frame pair.

Behavioral reference: networks/pose_cnn.py:8-45 — 7 strided convs
(16,32,64,128,256,256,256) with ReLU, 1x1 conv to 6*(n-1), global spatial
mean, 0.01 scaling, split into (axisangle, translation).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    S2DConv,
    TorchConv,
    torch_default_bias_init,
    torch_default_kernel_init,
)


class _S2DTorchConv(nn.Module):
    """Stride-2 TorchConv routed through space-to-depth (common.S2DConv).

    Keeps TorchConv's param tree ({Conv_0: {kernel, bias}}) and torch
    default inits, so converters and checkpoints are unaffected.
    """

    features: int
    kernel: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = self.kernel * self.kernel * x.shape[-1]
        return S2DConv(
            self.features, self.kernel, use_bias=True,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype, name="Conv_0",
        )(x)


class PoseCNN(nn.Module):
    num_input_frames: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        """x: [B,H,W,3*num_input_frames] -> (axisangle, translation).

        Returns [B, n-1, 1, 3] each, matching the reference shape
        (pose_cnn.py:40-45).
        """
        specs = [
            (16, 7, 2, 3),
            (32, 5, 2, 2),
            (64, 3, 2, 1),
            (128, 3, 2, 1),
            (256, 3, 2, 1),
            (256, 3, 2, 1),
            (256, 3, 2, 1),
        ]
        y = x if self.dtype is None else x.astype(self.dtype)
        for i, (ch, k, s, p) in enumerate(specs):
            # the big-kernel stride-2 convs on thin channels (6->16 at
            # full res, 16->32 at 1/2) are MXU-hostile; space-to-depth
            # folds the stride into channels at identical weights
            if k > 3 and s == 2 and y.shape[1] % 2 == 0 \
                    and y.shape[2] % 2 == 0:
                y = _S2DTorchConv(ch, k, dtype=self.dtype,
                                  name=f"conv{i}")(y)
            else:
                y = TorchConv(ch, (k, k), strides=(s, s), padding=p,
                              dtype=self.dtype, name=f"conv{i}")(y)
            y = nn.relu(y)

        n_out = self.num_input_frames - 1
        y = TorchConv(6 * n_out, (1, 1), padding=0, dtype=self.dtype,
                      name="pose_conv")(y)
        # pose must leave in f32: 0.01-scale outputs feed SE(3) math
        y = y.astype(jnp.float32).mean(axis=(1, 2))  # [B, 6*(n-1)]
        y = 0.01 * y.reshape(-1, n_out, 1, 6)
        return y[..., :3], y[..., 3:]
