"""RectifyNet: 3-DoF rotation predictor for indoor camera-shake removal.

Behavioral reference: networks/rectify_net.py:6-68 — ResNet-18 encoder on a
half-resolution 2-frame stack, RotDecoder (squeeze + 2x conv3x3 + 1x1 to 3),
global mean, pitch (index 2) zeroed (:66).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import TorchConv
from sfmnext_tpu.models.resnet import ResNetEncoder
from sfmnext_tpu.ops.image import resize_bilinear


class RotDecoder(nn.Module):
    @nn.compact
    def __call__(self, features):
        y = nn.relu(TorchConv(256, (1, 1), padding=0, name="squeeze")(features[-1]))
        y = nn.relu(TorchConv(256, (3, 3), padding=1, name="pose_0")(y))
        y = nn.relu(TorchConv(256, (3, 3), padding=1, name="pose_1")(y))
        y = TorchConv(3, (1, 1), padding=0, name="pose_2")(y)
        y = y.mean(axis=(1, 2)).reshape(-1, 3)
        # zero the pitch component (rectify_net.py:66)
        return y * jnp.asarray([1.0, 1.0, 0.0], dtype=y.dtype)


class RectifyNet(nn.Module):
    num_layers: int = 18
    train: bool = False

    @nn.compact
    def __call__(self, img1, img2):
        """img1/img2: [B,H,W,3] -> rotation [B,3] (euler, pitch zeroed)."""
        x = jnp.concatenate([img1, img2], axis=-1)
        b, h, w, _ = x.shape
        x = resize_bilinear(x, (h // 2, w // 2), align_corners=True)
        feats = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=2,
            train=self.train,
            name="encoder",
        )(x)
        return RotDecoder(name="decoder")(feats)
