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

import re
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


def parse_resnet_variant(name: str) -> dict:
    """Parse an (alias-stripped) timm/torchvision resnet-family backbone
    name into ResNetEncoder kwargs.

    Handles: resnet/resnext/wide_resnet depth-width grammar, [legacy_]se
    and eca prefixes, gluon v1c/v1d/v1s deep stems, timm d/t stem
    suffixes, resnetrs, the blur/aa anti-aliased names, resnet50_gn and
    ecaresnetlight. Raises ValueError for lookalike byobnet names
    (*_ts handled separately, 51q/61q unsupported).
    Shared by the Unet dispatch and utils/torch_port.convert_unet.
    """
    from sfmnext_tpu.models.resnet import RESNET_SPECS

    full = name
    if name == "ecaresnetlight":
        # timm: bottleneck depths (1,1,11,3), avg-down shortcuts, ECA,
        # classic 7x7 stem
        return dict(
            num_layers=-1, groups=1, base_width=64, se_reduction=0,
            stem_type="", stem_width=32, avg_down=True, attn="eca",
            replace_stem_pool=False, aa="", norm="bn",
        )
    if name == "resnet50_gn":
        return dict(
            num_layers=50, groups=1, base_width=64, se_reduction=0,
            stem_type="", stem_width=32, avg_down=False, attn="",
            replace_stem_pool=False, aa="", norm="gn",
        )
    groups, base_width = 1, 64
    se_reduction = 0
    attn = ""
    stem_type, stem_width, avg_down = "", 32, False
    replace_stem_pool = False
    aa = ""
    # anti-aliased strides: resnetblur50 (binomial blur pool),
    # resnetaa50 / seresnextaa101d_32x8d (avg pool), timm aa_layer
    for tok, kind in (("blur", "blur"), ("aa", "avg")):
        for fam in ("resnet", "resnext"):
            if name.startswith(f"{fam}{tok}") or (
                name.startswith("se") and
                name[2:].startswith(f"{fam}{tok}")
            ):
                aa = kind
                name = name.replace(f"{fam}{tok}", fam, 1)
    if name.startswith("gluon_"):
        # gluon_resnet50_v1c/v1d/v1s: deep stem (v1d adds avg-down
        # shortcuts, v1s widens the stem to 64) — gluoncv resnetv1b.
        # gluon_[se]resnext*: plain torchvision topology (weight-
        # source alias; the v1b case is stripped by the Unet dispatch).
        base, variant = name[len("gluon_"):].rsplit("_", 1)
        if variant in ("v1c", "v1d", "v1s"):
            name = base
            stem_type = "deep"
            avg_down = variant == "v1d"
            stem_width = 64 if variant == "v1s" else 32
        else:
            name = name[len("gluon_"):]
    if name.startswith("legacy_"):
        name = name[len("legacy_"):]
    if name.startswith("eca"):
        # ecaresnet26t/50d/50t/101d/269d: efficient channel attention
        attn = "eca"
        name = name[len("eca"):]
    if name.startswith("se"):
        # seresnet50 / seresnext50_32x4d: ResNet + SE (reduction 16)
        se_reduction = 16
        name = name[len("se"):]

    def _dt_suffix(tail, stem_type, avg_down):
        # timm suffix letters: d = deep stem + avg-down shortcuts,
        # t = deep tiered stem + avg-down (timm resnet.py)
        if tail.endswith("d"):
            return tail[:-1], "deep", True
        if tail.endswith("t"):
            return tail[:-1], "deep_tiered", True
        return tail, stem_type, avg_down

    try:
        if name.startswith("resnetrs"):
            # ResNet-RS (timm resnetrs50..420): deep stem, strided
            # conv stem pool, avg-down shortcuts, SE rd_ratio 0.25
            layers = int(name[len("resnetrs"):])
            stem_type, avg_down = "deep", True
            se_reduction, replace_stem_pool = 4, True
        elif name.startswith("resnext"):
            # resnext<depth>[d|t]_<groups>x<width>d (torchvision /
            # timm naming, e.g. seresnext26d_32x4d)
            depth, spec = name[len("resnext"):].split("_")
            depth, stem_type, avg_down = _dt_suffix(
                depth, stem_type, avg_down
            )
            groups, base_width = (int(v) for v in spec[:-1].split("x"))
            layers = int(depth)
        elif name.startswith("wide_resnet"):
            depth, mult = name[len("wide_resnet"):].split("_")
            layers, base_width = int(depth), 64 * int(mult)
        else:
            tail, stem_type, avg_down = _dt_suffix(
                name[len("resnet"):], stem_type, avg_down
            )
            layers = int(tail)
    except ValueError:
        # resnetlight / *_ts / *_gn / 51q-style byobnet names
        raise ValueError(f"unknown resnet variant {full!r}") from None
    if layers not in RESNET_SPECS:
        raise ValueError(f"unknown resnet variant {full!r}")
    return dict(
        num_layers=layers, groups=groups, base_width=base_width,
        se_reduction=se_reduction, stem_type=stem_type,
        stem_width=stem_width, avg_down=avg_down, attn=attn,
        replace_stem_pool=replace_stem_pool, aa=aa, norm="bn",
    )


def _is_byob(name: str) -> bool:
    from sfmnext_tpu.models.byob import BYOB_SPECS, QRESNET_SPECS

    return name in BYOB_SPECS or name in QRESNET_SPECS


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
        for pre in ("ssl_", "swsl_", "tv_", "ig_"):
            if backbone.startswith(pre):
                backbone = backbone[len(pre):]
        if backbone.startswith("gluon_") and backbone.endswith("_v1b"):
            backbone = backbone[len("gluon_"):-len("_v1b")]
        if self.backbone.startswith("convnext"):
            depths, dims = convnext_cfg(self.backbone)
            feats = ConvNeXt(
                depths, dims, self.train, self.dtype, name="encoder"
            )(x)
        elif re.search(r"efficientnet_(b\d|l2)", backbone):
            from sfmnext_tpu.models.efficientnet import EfficientNet

            # 5 stride taps -> 4 skip-connected decoder blocks end at 1/2
            # resolution (timm features_only convention, Unet.py:114-117)
            feats = EfficientNet(
                variant=backbone, features_only=True,
                train=self.train, dtype=self.dtype, name="encoder",
            )(x)
        elif backbone.startswith(
            ("efficientnetv2_", "tf_efficientnetv2_", "efficientnet_lite",
             "tf_efficientnet_lite", "efficientnet_e", "tf_efficientnet_e",
             "mobilenetv3_", "tf_mobilenetv3_", "lcnet_", "mnasnet_",
             "semnasnet_", "spnasnet_", "tinynet_", "mixnet_", "tf_mixnet_",
             "fbnetc_", "fbnetv3_", "hardcorenas_", "gc_efficientnetv2_",
             "tf_efficientnet_cc_")
        ):
            from sfmnext_tpu.models.mobile_builder import MobileTrunk

            # "_pruned" names share the base topology (the channel pruning
            # of the published pruned weights is not replicated)
            feats = MobileTrunk(
                variant=backbone.replace("_pruned", ""),
                train=self.train, dtype=self.dtype, name="encoder",
            )(x)
        elif backbone.startswith("edgenext_"):
            from sfmnext_tpu.models.edgenext import EdgeNeXt

            feats = EdgeNeXt(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("gernet_"):
            from sfmnext_tpu.models.gernet import GerNet

            feats = GerNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("ghostnet_"):
            from sfmnext_tpu.models.ghostnet import GhostNet

            feats = GhostNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone in ("legacy_senet154", "gluon_senet154"):
            from sfmnext_tpu.models.senet import SENet154

            feats = SENet154(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("hrnet_"):
            from sfmnext_tpu.models.hrnet import HRNet

            feats = HRNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith(("dm_nfnet_", "eca_nfnet_", "nfnet_",
                                  "nf_resnet", "nf_regnet")):
            from sfmnext_tpu.models.nfnet import NFNet

            feats = NFNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith(("mobilevit_", "mobilevitv2_")):
            from sfmnext_tpu.models.mobilevit import MobileViT

            feats = MobileViT(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("cs3"):
            from sfmnext_tpu.models.cspnet import CS3Net

            feats = CS3Net(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith(("cspresnet", "cspresnext", "cspdarknet",
                                  "darknet")):
            from sfmnext_tpu.models.cspnet import CSPNet

            feats = CSPNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith(("xception", "gluon_xception")):
            from sfmnext_tpu.models.xception import Xception

            feats = Xception(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("dpn"):
            from sfmnext_tpu.models.dpn import DPN

            feats = DPN(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("ese_vovnet"):
            from sfmnext_tpu.models.vovnet import VoVNet

            feats = VoVNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("rexnet_"):
            from sfmnext_tpu.models.rexnet import ReXNet

            feats = ReXNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif _is_byob(backbone):
            from sfmnext_tpu.models.byob import (
                QRESNET_SPECS,
                ByobResNet,
                QResNet,
            )

            cls = QResNet if backbone in QRESNET_SPECS else ByobResNet
            feats = cls(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith("resnest"):
            from sfmnext_tpu.models.resnest import ResNeSt

            feats = ResNeSt(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith("resnetv2_"):
            from sfmnext_tpu.models.resnetv2 import ResNetV2

            feats = ResNetV2(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith("gluon_") or backbone.startswith(
            ("resnet", "resnext", "wide_resnet", "seresnet", "seresnext",
             "legacy_seresnet", "legacy_seresnext", "ecaresnet")
        ):
            from sfmnext_tpu.models.resnet import ResNetEncoder

            # drop the stride-2 stem tap: 4 skips at strides 4/8/16/32 so the
            # 4 decoder blocks land at 1/2 resolution (timm features_only
            # convention for resnets gives 5; the wiring is equivalent)
            feats = ResNetEncoder(
                train=self.train, dtype=self.dtype, normalize_input=False,
                name="encoder", **parse_resnet_variant(backbone),
            )(x)[1:]
        elif backbone.startswith("repvgg_"):
            from sfmnext_tpu.models.repvgg import RepVGG

            feats = RepVGG(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith("regnetz_"):
            from sfmnext_tpu.models.regnetz import RegNetZ

            feats = RegNetZ(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)[1:]
        elif backbone.startswith("regnetv_"):
            from sfmnext_tpu.models.regnetz import RegNetV

            feats = RegNetV(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
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
        elif backbone.startswith("vgg"):
            from sfmnext_tpu.models.vgg import VGG

            feats = VGG(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("densenet"):
            from sfmnext_tpu.models.densenet import DenseNet

            feats = DenseNet(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        elif backbone.startswith("mobilenetv2"):
            from sfmnext_tpu.models.mobilenet import MobileNetV2

            feats = MobileNetV2(
                variant=backbone, train=self.train, dtype=self.dtype,
                name="encoder",
            )(x)
        else:
            raise NotImplementedError(
                f"backbone {self.backbone!r}: convnext_* / resnet* / "
                "resnext* / wide_resnet* / [legacy_]seresnet* / seresnext* / "
                "regnetx_* / regnety_* / res2net* / res2next* / skresnet* / "
                "skresnext* / resnetrs* / resnetv2_* / resnest* / repvgg_* / "
                "*efficientnet_b[0-7]* / *efficientnetv2_* / "
                "*efficientnet_lite* / *efficientnet_e[sml]* / vgg* / "
                "densenet* / mobilenetv2_* / *mobilenetv3_* / lcnet_* / "
                "[se]mnasnet_* / spnasnet_* / tinynet_* / rexnet_* / "
                "xception* / dpn* / ese_vovnet* / darknet* / csp* / "
                "mobilevit* / hrnet_* / *nfnet* / nf_resnet50 / ghostnet_* / "
                "senet154 families implemented (+ ssl_/swsl_/tv_/ig_/gluon "
                "aliases); use backbone='resnet'/'eff_b5' for the other "
                "reference paths"
            )
        out = UnetDecoder(
            tuple(self.decoder_channels),
            self.num_classes,
            self.train,
            self.dtype,
            name="decoder",
        )(feats[::-1])
        return out.astype(jnp.float32) if self.dtype is not None else out
