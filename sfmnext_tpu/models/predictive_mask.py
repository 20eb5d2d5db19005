"""PredictiveMask: Zhou et al. explainability-mask decoder (ablation).

Behavioral reference: networks/predictive_mask.py:17-77 — monodepth2-style
upsampling decoder over the ResNet pyramid emitting a sigmoid mask per
source frame at each scale (constructed behind ``--predictive_mask``,
trainer.py:116-126; usage commented out in the reference trainer).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import TorchConv
from sfmnext_tpu.ops.image import reflection_pad_2d, resize_nearest


class ConvBlock(nn.Module):
    """Reflection-padded 3x3 conv + ELU (reference layers.py:153-183)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = reflection_pad_2d(x, 1)
        y = TorchConv(self.features, (3, 3), padding=0, dtype=self.dtype)(y)
        return nn.elu(y)


class PredictiveMask(nn.Module):
    num_output_channels: int = 2  # one mask per source frame
    scales: Sequence[int] = (0, 1, 2, 3)
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, input_features):
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], name=f"upconv_{i}_0")(x)
            b, h, w, c = x.shape
            x = resize_nearest(x, (h * 2, w * 2))
            if i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(self.num_ch_dec[i], name=f"upconv_{i}_1")(x)
            if i in self.scales:
                y = reflection_pad_2d(x, 1)
                y = TorchConv(
                    self.num_output_channels, (3, 3), padding=0,
                    name=f"maskconv_{i}",
                )(y)
                outputs[("disp", i)] = nn.sigmoid(y)
        return outputs
