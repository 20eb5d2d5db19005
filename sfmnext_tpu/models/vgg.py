"""VGG feature-pyramid encoders (NHWC, Flax) for the generic U-Net.

Behavioral reference: the reference's ``Unet`` accepts timm vgg backbones
via ``timm.create_model(name, features_only=True)``
(/root/reference/networks/Unet.py:114-117, names at :316-383). This is
the torchvision/timm VGG topology: plain 3x3 conv stacks with 2x2
max-pool stage transitions; '_bn' variants insert BatchNorm after every
conv.

Deliberate deviation from timm: feature taps here are the POST-pool
activations (strides 2/4/8/16/32). timm's vgg features_only taps the
pre-pool conv activations (reductions 1-16), which would make the U-Net
output full resolution — but this repo's SQL-decoder contract is a
half-resolution feature map (models/sql_decoder.py), and a full-res map
overflows the 500-token positional table at every published resolution
(320x1024/p20 -> 816 tokens), i.e. the reference's vgg path could never
actually run there either (networks/depth_decoder_QTR.py:13). Post-pool
taps harmonize vgg with every other backbone family's half-res pyramid.
"""

from __future__ import annotations

import flax.linen as nn

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout

# torchvision cfgs: number of convs per stage, channels per stage
VGG_SPECS = {
    "vgg11": (1, 1, 2, 2, 2),
    "vgg13": (2, 2, 2, 2, 2),
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_STAGE_CH = (64, 128, 256, 512, 512)


def vgg_cfg(name: str):
    base = name.replace("_bn", "")
    if base not in VGG_SPECS:
        raise ValueError(f"unknown vgg variant {name!r}")
    return VGG_SPECS[base], name.endswith("_bn")


class VGG(nn.Module):
    """5-level VGG pyramid (post-pool taps, strides 2..32)."""

    variant: str = "vgg16"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        depths, use_bn = vgg_cfg(self.variant)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = []
        for stage, (n, ch) in enumerate(zip(depths, _STAGE_CH)):
            for i in range(n):
                x = nn.Conv(
                    ch, (3, 3), padding=1, use_bias=True,
                    kernel_init=kaiming_normal_fanout, dtype=self.dtype,
                    name=f"conv{stage}_{i}",
                )(x)
                if use_bn:
                    x = BatchNorm(
                        not self.train, dtype=self.dtype,
                        name=f"bn{stage}_{i}",
                    )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            feats.append(x)
        return feats
