"""DenseNet feature-pyramid encoders (NHWC, Flax) for the generic U-Net.

Behavioral reference: the reference's ``Unet`` accepts timm densenet
backbones via ``timm.create_model(name, features_only=True)``
(/root/reference/networks/Unet.py:114-117, names at :316-383).
Torchvision topology: 7x7/2 stem + 3x3/2 pool, 4 dense blocks of
BN-ReLU-Conv1x1(4k)-BN-ReLU-Conv3x3(k) layers with channel concat,
transition BN-ReLU-Conv1x1(floor(ch/2))-AvgPool2 between blocks.
Feature taps mirror timm's 5-tap convention: stem relu (stride 2),
then each dense block's output pre-transition (strides 4/8/16/32).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout, max_pool_3x3_s2

# (growth_rate, block_layers, stem_channels)
DENSENET_SPECS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


def _conv(feat, k, s=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class DenseLayer(nn.Module):
    growth: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = BatchNorm(not self.train, dtype=self.dtype, name="norm1")(x)
        y = nn.relu(y)
        y = _conv(4 * self.growth, 1, name="conv1", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="norm2")(y)
        y = nn.relu(y)
        y = _conv(self.growth, 3, name="conv2", dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """5-level DenseNet pyramid (timm features_only taps)."""

    variant: str = "densenet121"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # densenetblur121d (timm): deep 3-conv stem + blur-pooled stem
        # max pool; dense blocks unchanged
        name = self.variant
        deep_stem = blur = False
        if name.startswith("densenetblur") and name.endswith("d"):
            deep_stem = blur = True
            name = "densenet" + name[len("densenetblur"):-1]
        if name not in DENSENET_SPECS:
            raise ValueError(f"unknown densenet variant {self.variant!r}")
        growth, blocks, stem_ch = DENSENET_SPECS[name]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if deep_stem:
            y = x
            for i, (c, s) in enumerate(
                zip((stem_ch // 2, stem_ch // 2, stem_ch), (2, 1, 1))
            ):
                y = _conv(c, 3, s, name=f"conv0_{i}", dtype=self.dtype)(y)
                y = BatchNorm(not self.train, dtype=self.dtype,
                              name=f"norm0_{i}")(y)
                y = nn.relu(y)
        else:
            y = _conv(stem_ch, 7, 2, name="conv0", dtype=self.dtype)(x)
            y = BatchNorm(not self.train, dtype=self.dtype, name="norm0")(y)
            y = nn.relu(y)
        feats = [y]
        if blur:
            from sfmnext_tpu.models.resnet import blur_pool

            y = nn.max_pool(y, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
            y = blur_pool(y, self.dtype)
        else:
            y = max_pool_3x3_s2(y)

        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                y = DenseLayer(
                    growth, self.train, self.dtype,
                    name=f"block{bi}_layer{li}",
                )(y)
            if bi == len(blocks) - 1:
                # final norm5 BN+ReLU (torchvision densenet.features[-1];
                # the deepest tap is post-norm, not the raw concat)
                y = BatchNorm(not self.train, dtype=self.dtype, name="norm5")(y)
                y = nn.relu(y)
            feats.append(y)
            if bi < len(blocks) - 1:
                y = BatchNorm(
                    not self.train, dtype=self.dtype, name=f"trans{bi}_norm"
                )(y)
                y = nn.relu(y)
                y = _conv(
                    y.shape[-1] // 2, 1, name=f"trans{bi}_conv",
                    dtype=self.dtype,
                )(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        return feats
