"""BN U-decoder over the ResNet pyramid + combined encoder-decoders.

Behavioral reference:
  - UpSampleBN / DecoderBN  networks/resnet_encoder.py:103-147
  - ResnetEncoderDecoder    networks/resnet_encoder.py:150-168
  - LiteResnetEncoderDecoder networks/lite_res_encoder.py:148-157
    (same DecoderBN shape with num_features=256 over ResNet-18 skips)

Quirk preserved: the bottleneck 1x1 conv is declared with padding=1 in the
reference (resnet_encoder.py:125), which zero-pads a 1-pixel ring around the
1/32 feature map before the 1x1 conv (border pixels become the conv bias).
We reproduce it so ported torch weights are activation-equivalent.

Output: ``model_dim`` channels at 1/2 input resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, TorchConv, leaky_relu
from sfmnext_tpu.models.resnet import ResNetEncoder
from sfmnext_tpu.ops.image import resize_bilinear


class UpSampleBN(nn.Module):
    """Bilinear-upsample to skip size, concat, 2x (Conv3x3-BN-LeakyReLU)."""

    features: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, skip):
        up = resize_bilinear(x, skip.shape[1:3], align_corners=True)
        y = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
        if self.dtype is not None:
            y = y.astype(self.dtype)
        y = TorchConv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv_a")(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn_a")(y)
        y = leaky_relu(y)
        y = TorchConv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv_b")(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn_b")(y)
        return leaky_relu(y)


class DecoderBN(nn.Module):
    """4-stage BN upsample decoder: 1/32 -> 1/2 resolution, model_dim chans."""

    num_features: int = 512
    model_dim: int = 32
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, features):
        x0, x1, x2, x3, x4 = features
        f = self.num_features

        # reference conv2: 1x1 conv with padding=1 (see module docstring)
        y = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = TorchConv(f, (1, 1), padding=0, dtype=self.dtype, name="conv2")(y)

        y = UpSampleBN(f // 2, self.train, self.dtype, name="up1")(y, x3)
        y = UpSampleBN(f // 4, self.train, self.dtype, name="up2")(y, x2)
        y = UpSampleBN(f // 8, self.train, self.dtype, name="up3")(y, x1)
        y = UpSampleBN(f // 16, self.train, self.dtype, name="up4")(y, x0)
        return TorchConv(self.model_dim, (3, 3), padding=1, dtype=self.dtype, name="conv3")(y)


class ResnetEncoderDecoder(nn.Module):
    """ResNet pyramid + DecoderBN. Reference networks/resnet_encoder.py:150-157."""

    num_layers: int = 50
    num_features: int = 512
    model_dim: int = 32
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, return_pyramid: bool = False):
        feats = ResNetEncoder(
            num_layers=self.num_layers, train=self.train, dtype=self.dtype,
            name="encoder",
        )(x)
        out = DecoderBN(
            self.num_features, self.model_dim, self.train, self.dtype,
            name="decoder",
        )(feats)
        # pyramid consumers: PredictiveMask (trainer.py:290-291)
        return (out, feats) if return_pyramid else out


class LiteResnetEncoderDecoder(nn.Module):
    """ResNet-18 + slim DecoderBN(256). Reference networks/lite_res_encoder.py:148-157."""

    model_dim: int = 128
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, return_pyramid: bool = False):
        feats = ResNetEncoder(
            num_layers=18, train=self.train, dtype=self.dtype, name="encoder"
        )(x)
        out = DecoderBN(
            256, self.model_dim, self.train, self.dtype, name="decoder"
        )(feats)
        return (out, feats) if return_pyramid else out
