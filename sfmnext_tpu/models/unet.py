"""Generic U-Net over a timm-style backbone (the reference's ``Unet``).

Behavioral reference: networks/Unet.py:9-312 — encoder features reversed
(deepest first), DecoderBlocks of [bilinear-up-to-skip (align_corners=True),
concat, 2x Conv3x3(bias=False)-BN-ReLU], skip wiring
``in = [enc[0]+enc[1], dec[0]+enc[2], ..., dec[-2]+0]``; a final trailing
block without skip upsamples x2 (align_corners=False); 1x1 conv to
``num_classes``. kaiming_normal conv init (:300-306).

For convnext backbones (4 features at strides 4..32) with
decoder_channels=(1024,512,256,128) the output lands at 1/2 input
resolution — the contract the SQL decoder expects.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout
from sfmnext_tpu.models.convnext import ConvNeXt, convnext_cfg
from sfmnext_tpu.ops.image import resize_bilinear


class Conv2dBnAct(nn.Module):
    features: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype, name="conv",
        )(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class DecoderBlock(nn.Module):
    features: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = resize_bilinear(x, skip.shape[1:3], align_corners=True)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        else:
            b, h, w, c = x.shape
            x = resize_bilinear(x, (h * 2, w * 2), align_corners=False)
        x = Conv2dBnAct(self.features, self.train, self.dtype, name="conv1")(x)
        return Conv2dBnAct(self.features, self.train, self.dtype, name="conv2")(x)


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (1024, 512, 256, 128)
    final_channels: int = 32
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, feats_deepest_first):
        x = feats_deepest_first[0]
        skips = list(feats_deepest_first[1:])
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, self.train, self.dtype, name=f"block{i}")(
                x, skip
            )
        return nn.Conv(
            self.final_channels, (1, 1), kernel_init=kaiming_normal_fanout,
            dtype=self.dtype, name="final_conv",
        )(x)


class Unet(nn.Module):
    backbone: str = "convnext_large"
    num_classes: int = 32
    decoder_channels: Sequence[int] = (1024, 512, 256, 128)
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        backbone = self.backbone
        # weight-source prefixes (ssl/swsl/tv/gluon v1b) share the plain
        # torchvision topology — route to the base family
        for pre in ("ssl_", "swsl_", "tv_"):
            if backbone.startswith(pre):
                backbone = backbone[len(pre):]
        if backbone.startswith("gluon_") and backbone.endswith("_v1b"):
            backbone = backbone[len("gluon_"):-len("_v1b")]
        if self.backbone.startswith("convnext"):
            depths, dims = convnext_cfg(self.backbone)
            feats = ConvNeXt(
                depths, dims, self.train, self.dtype, name="encoder"
            )(x)
        elif "efficientnet" in self.backbone:
            from sfmnext_tpu.models.efficientnet import EfficientNet

            # 5 stride taps -> 4 skip-connected decoder blocks end at 1/2
            # resolution (timm features_only convention, Unet.py:114-117)
            feats = EfficientNet(
                variant=self.backbone, features_only=True,
                train=self.train, dtype=self.dtype, name="encoder",
            )(x)
        elif backbone.startswith(
            ("resnet", "resnext", "wide_resnet", "seresnet", "seresnext",
             "legacy_seresnet", "legacy_seresnext")
        ):
            from sfmnext_tpu.models.resnet import RESNET_SPECS, ResNetEncoder

            groups, base_width = 1, 64
            name = backbone
            se_reduction = 0
            if name.startswith("legacy_"):
                name = name[len("legacy_"):]
            if name.startswith("se"):
                # seresnet50 / seresnext50_32x4d: ResNet + SE (reduction 16)
                se_reduction = 16
                name = name[len("se"):]
            if name.startswith("resnext"):
                # resnext<depth>_<groups>x<width>d (torchvision naming)
                depth, spec = name[len("resnext"):].split("_")
                groups, base_width = (int(v) for v in spec[:-1].split("x"))
                layers = int(depth)
            elif name.startswith("wide_resnet"):
                depth, mult = name[len("wide_resnet"):].split("_")
                layers, base_width = int(depth), 64 * int(mult)
            else:
                layers = int("".join(c for c in name if c.isdigit()) or 50)
            if layers not in RESNET_SPECS:
                raise ValueError(f"unknown resnet variant {self.backbone!r}")
            # drop the stride-2 stem tap: 4 skips at strides 4/8/16/32 so the
            # 4 decoder blocks land at 1/2 resolution (timm features_only
            # convention for resnets gives 5; the wiring is equivalent)
            feats = ResNetEncoder(
                num_layers=layers, train=self.train, dtype=self.dtype,
                normalize_input=False, groups=groups, base_width=base_width,
                se_reduction=se_reduction, name="encoder",
            )(x)[1:]
        elif backbone.startswith(("regnetx_", "regnety_")):
            from sfmnext_tpu.models.regnet import RegNet

            feats = RegNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith(("res2net", "res2next")):
            from sfmnext_tpu.models.res2net import Res2Net

            feats = Res2Net(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith(("skresnet", "skresnext")):
            from sfmnext_tpu.models.sknet import SKNet

            feats = SKNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif self.backbone.startswith("vgg"):
            from sfmnext_tpu.models.vgg import VGG

            feats = VGG(
                variant=self.backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif self.backbone.startswith("densenet"):
            from sfmnext_tpu.models.densenet import DenseNet

            feats = DenseNet(
                variant=self.backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif self.backbone.startswith("mobilenetv2"):
            from sfmnext_tpu.models.mobilenet import MobileNetV2

            feats = MobileNetV2(
                variant=self.backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        else:
            raise NotImplementedError(
                f"backbone {self.backbone!r}: convnext_* / resnet* / "
                "resnext* / wide_resnet* / [legacy_]seresnet* / seresnext* / "
                "regnetx_* / regnety_* / res2net* / res2next* / skresnet* / "
                "skresnext* / *efficientnet_b[0-7]* / vgg* / densenet* / "
                "mobilenetv2_* families implemented (+ ssl_/swsl_/tv_/"
                "gluon-v1b aliases); use backbone='resnet'/'eff_b5' for the "
                "other reference paths"
            )
        out = UnetDecoder(
            tuple(self.decoder_channels),
            self.num_classes,
            self.train,
            self.dtype,
            name="decoder",
        )(feats[::-1])
        return out.astype(jnp.float32) if self.dtype is not None else out
