"""Generic mobile-CNN trunk builder for the timm-style Unet backbones.

The reference accepts ~70 backbone names from timm's "efficientnet builder"
universe (networks/Unet.py:316-383): efficientnetv2_* / tf_efficientnetv2_*,
efficientnet_lite* / tf_efficientnet_lite*, the EdgeTPU es/em/el variants,
mobilenetv3_* / tf_mobilenetv3_*, lcnet_*, mnasnet/semnasnet/spnasnet and
tinynet_a..e. All of them are stacks of four block types; timm encodes each
architecture as a small block-definition string DSL (e.g.
``ir_r4_k3_s2_e6_c128_se0.25_nre``). We speak the same (public, stable) DSL
here — the *implementation* is an original flax/TPU one: NHWC, 'SAME'
padding, BN eps 1e-3, dense MXU-friendly convs, no torch layout quirks.

Block types:
  cn  — conv + BN + act                      (residual only with ``_skip``)
  ds  — depthwise k,s + BN + act [+SE] + pointwise 1x1 + BN
  dsa — ds with an activation after the pointwise conv (lcnet)
  ir  — inverted residual: 1x1 expand + dw k,s [+SE] + 1x1 project
  er  — edge residual / fused-MBConv: kxk expand conv [+SE] + 1x1 project

Feature taps follow the timm ``features_only`` convention the reference
Unet consumes (networks/Unet.py:114-117): the last output at each
reduction 2/4/8/16/32.

Fidelity note: 'tf_' and plain timm variants differ only in BN eps and
padding parity (we use SAME + eps 1e-3 for both, as for the golden-tested
efficientnet family in models/efficientnet.py). No weight converter is
shipped for these exotic families (the reference's published configs never
use them); the shape/stride contract is what the tests pin.
"""

from __future__ import annotations

import math
import re

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import kaiming_normal_fanout


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def decode_block(s: str) -> dict:
    """Parse one timm-style block string into a spec dict."""
    parts = s.split("_")
    spec = dict(
        type=parts[0], repeat=1, kernel=3, stride=1, expand=1.0,
        channels=0, se=0.0, act=None, noskip=False, skip=False, fake_in=0,
        exp_groups=1, proj_groups=1, experts=0,
    )
    for p in parts[1:]:
        if p == "noskip":
            spec["noskip"] = True
        elif p == "skip":
            spec["skip"] = True
        elif p == "nre":
            spec["act"] = "relu"
        elif p == "nhs":
            spec["act"] = "hswish"
        elif p == "nsw":
            spec["act"] = "swish"
        elif p.startswith("se"):
            spec["se"] = float(p[2:])
        elif p.startswith("fc"):
            spec["fake_in"] = int(p[2:])
        elif p.startswith("cc"):
            # CondConv experts (tf_efficientnet_cc_*), e.g. cc4
            spec["experts"] = int(p[2:])
        elif p[0] == "k" and "." in p:
            # mixnet mixed depthwise kernels, e.g. k3.5.7
            spec["kernel"] = tuple(int(v) for v in p[1:].split("."))
        elif p[0] == "a" and "." in p:
            spec["exp_groups"] = len(p[1:].split("."))
        elif p[0] == "p" and "." in p:
            spec["proj_groups"] = len(p[1:].split("."))
        else:
            m = re.match(r"([a-z])([\d.]+)", p)
            if not m:
                raise ValueError(f"bad block token {p!r} in {s!r}")
            key = {"r": "repeat", "k": "kernel", "s": "stride",
                   "e": "expand", "c": "channels"}[m.group(1)]
            v = float(m.group(2))
            spec[key] = v if key == "expand" else int(v)
    return spec


# ---------------------------------------------------------------------------
# Architecture definitions (block-DSL), per family. These are the published
# architectures (EfficientNetV2 Tan&Le'21 table 4, MobileNetV3 Howard'19
# tables 1-2, MnasNet Tan'19, PP-LCNet Cui'21, TinyNet Han'20) in timm's
# encoding, which the reference's backbone list is defined against.
# ---------------------------------------------------------------------------

_V2_BASE = [
    ["cn_r1_k3_s1_e1_c16_skip"],
    ["er_r2_k3_s2_e4_c32"],
    ["er_r2_k3_s2_e4_c48"],
    ["ir_r3_k3_s2_e4_c96_se0.25"],
    ["ir_r5_k3_s1_e6_c112_se0.25"],
    ["ir_r8_k3_s2_e6_c192_se0.25"],
]
_V2_S = [
    ["cn_r2_k3_s1_e1_c24_skip"],
    ["er_r4_k3_s2_e4_c48"],
    ["er_r4_k3_s2_e4_c64"],
    ["ir_r6_k3_s2_e4_c128_se0.25"],
    ["ir_r9_k3_s1_e6_c160_se0.25"],
    ["ir_r15_k3_s2_e6_c256_se0.25"],
]
_V2_M = [
    ["cn_r3_k3_s1_e1_c24_skip"],
    ["er_r5_k3_s2_e4_c48"],
    ["er_r5_k3_s2_e4_c80"],
    ["ir_r7_k3_s2_e4_c160_se0.25"],
    ["ir_r14_k3_s1_e6_c176_se0.25"],
    ["ir_r18_k3_s2_e6_c304_se0.25"],
    ["ir_r5_k3_s1_e6_c512_se0.25"],
]
_V2_L = [
    ["cn_r4_k3_s1_e1_c32_skip"],
    ["er_r7_k3_s2_e4_c64"],
    ["er_r7_k3_s2_e4_c96"],
    ["ir_r10_k3_s2_e4_c192_se0.25"],
    ["ir_r19_k3_s1_e6_c224_se0.25"],
    ["ir_r25_k3_s2_e6_c384_se0.25"],
    ["ir_r7_k3_s1_e6_c640_se0.25"],
]
_V2_XL = [
    ["cn_r4_k3_s1_e1_c32_skip"],
    ["er_r8_k3_s2_e4_c64"],
    ["er_r8_k3_s2_e4_c96"],
    ["ir_r16_k3_s2_e4_c192_se0.25"],
    ["ir_r24_k3_s1_e6_c256_se0.25"],
    ["ir_r32_k3_s2_e6_c512_se0.25"],
    ["ir_r8_k3_s1_e6_c640_se0.25"],
]
_LITE = [  # B0 arch without SE, relu6, first/last repeats unscaled
    ["ds_r1_k3_s1_e1_c16"],
    ["ir_r2_k3_s2_e6_c24"],
    ["ir_r2_k5_s2_e6_c40"],
    ["ir_r3_k3_s2_e6_c80"],
    ["ir_r3_k5_s1_e6_c112"],
    ["ir_r4_k5_s2_e6_c192"],
    ["ir_r1_k3_s1_e6_c320"],
]
_EDGE = [  # EfficientNet-EdgeTPU es/em/el
    ["er_r1_k3_s1_e4_c24_fc24_noskip"],
    ["er_r2_k3_s2_e8_c32"],
    ["er_r4_k3_s2_e8_c48"],
    ["ir_r5_k5_s2_e8_c96"],
    ["ir_r4_k5_s1_e8_c144"],
    ["ir_r2_k5_s2_e8_c192"],
]
_MNV3_LARGE = [
    ["ds_r1_k3_s1_e1_c16_nre"],
    ["ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"],
    ["ir_r3_k5_s2_e3_c40_se0.25_nre"],
    ["ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"],
    ["ir_r2_k3_s1_e6_c112_se0.25"],
    ["ir_r3_k5_s2_e6_c160_se0.25"],
    ["cn_r1_k1_s1_c960"],
]
_MNV3_SMALL = [
    ["ds_r1_k3_s2_e1_c16_se0.25_nre"],
    ["ir_r1_k3_s2_e4.5_c24_nre", "ir_r1_k3_s1_e3.67_c24_nre"],
    ["ir_r1_k5_s2_e4_c40_se0.25", "ir_r2_k5_s1_e6_c40_se0.25"],
    ["ir_r2_k5_s1_e3_c48_se0.25"],
    ["ir_r3_k5_s2_e6_c96_se0.25"],
    ["cn_r1_k1_s1_c576"],
]
_MNV3_LARGE_MIN = [
    ["ds_r1_k3_s1_e1_c16"],
    ["ir_r1_k3_s2_e4_c24", "ir_r1_k3_s1_e3_c24"],
    ["ir_r3_k3_s2_e3_c40"],
    ["ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"],
    ["ir_r2_k3_s1_e6_c112"],
    ["ir_r3_k3_s2_e6_c160"],
    ["cn_r1_k1_s1_c960"],
]
_MNV3_SMALL_MIN = [
    ["ds_r1_k3_s2_e1_c16"],
    ["ir_r1_k3_s2_e4.5_c24", "ir_r1_k3_s1_e3.67_c24"],
    ["ir_r1_k3_s2_e4_c40", "ir_r2_k3_s1_e6_c40"],
    ["ir_r2_k3_s1_e3_c48"],
    ["ir_r3_k3_s2_e6_c96"],
    ["cn_r1_k1_s1_c576"],
]
_LCNET = [
    ["dsa_r1_k3_s1_c32"],
    ["dsa_r2_k3_s2_c64"],
    ["dsa_r2_k3_s2_c128"],
    ["dsa_r1_k3_s2_c256", "dsa_r1_k5_s1_c256"],
    ["dsa_r4_k5_s1_c256"],
    ["dsa_r2_k5_s2_c512_se0.25"],
]
_MNASNET_B1 = [
    ["ds_r1_k3_s1_c16_noskip"],
    ["ir_r3_k3_s2_e3_c24"],
    ["ir_r3_k5_s2_e3_c40"],
    ["ir_r3_k5_s2_e6_c80"],
    ["ir_r2_k3_s1_e6_c96"],
    ["ir_r4_k5_s2_e6_c192"],
    ["ir_r1_k3_s1_e6_c320_noskip"],
]
_MNASNET_A1 = [  # semnasnet
    ["ds_r1_k3_s1_c16_noskip"],
    ["ir_r2_k3_s2_e6_c24"],
    ["ir_r3_k5_s2_e3_c40_se0.25"],
    ["ir_r4_k3_s2_e6_c80"],
    ["ir_r2_k3_s1_e6_c112_se0.25"],
    ["ir_r3_k5_s2_e6_c160_se0.25"],
    ["ir_r1_k3_s1_e6_c320"],
]
_MNASNET_SMALL = [
    ["ds_r1_k3_s1_c8"],
    ["ir_r1_k3_s2_e3_c16"],
    ["ir_r2_k3_s2_e6_c16"],
    ["ir_r4_k5_s2_e6_c32_se0.25"],
    ["ir_r3_k3_s1_e6_c32_se0.25"],
    ["ir_r3_k5_s2_e6_c88_se0.25"],
    ["ir_r1_k3_s1_e6_c144"],
]
_SPNASNET = [
    ["ds_r1_k3_s1_c16_noskip"],
    ["ir_r3_k3_s2_e3_c24"],
    ["ir_r1_k5_s2_e6_c40", "ir_r3_k3_s1_e3_c40"],
    ["ir_r1_k5_s2_e6_c80", "ir_r3_k3_s1_e3_c80"],
    ["ir_r1_k5_s1_e6_c96", "ir_r3_k5_s1_e3_c96"],
    ["ir_r4_k5_s2_e6_c192"],
    ["ir_r1_k3_s1_e6_c320_noskip"],
]
_MIXNET_S = [  # Tan & Le BMVC'19; default act relu, nsw blocks swish
    ["ds_r1_k3_s1_e1_c16"],
    ["ir_r1_k3_a1.1_p1.1_s2_e6_c24", "ir_r1_k3_a1.1_p1.1_s1_e3_c24"],
    ["ir_r1_k3.5.7_s2_e6_c40_se0.5_nsw",
     "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"],
    ["ir_r1_k3.5.7_p1.1_s2_e6_c80_se0.25_nsw",
     "ir_r2_k3.5_p1.1_s1_e6_c80_se0.25_nsw"],
    ["ir_r1_k3.5.7_a1.1_p1.1_s1_e6_c120_se0.5_nsw",
     "ir_r2_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"],
    ["ir_r1_k3.5.7.9.11_s2_e6_c200_se0.5_nsw",
     "ir_r2_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"],
]
_MIXNET_M = [
    ["ds_r1_k3_s1_e1_c24"],
    ["ir_r1_k3.5.7_a1.1_p1.1_s2_e6_c32", "ir_r1_k3_a1.1_p1.1_s1_e3_c32"],
    ["ir_r1_k3.5.7.9_s2_e6_c40_se0.5_nsw",
     "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"],
    ["ir_r1_k3.5.7_s2_e6_c80_se0.25_nsw",
     "ir_r3_k3.5.7.9_p1.1_s1_e6_c80_se0.25_nsw"],
    ["ir_r1_k3_s1_e6_c120_se0.5_nsw",
     "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"],
    ["ir_r1_k3.5.7.9_s2_e6_c200_se0.5_nsw",
     "ir_r3_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"],
]
_MIXNET_COEFFS = {  # (arch, stem, width, depth)
    "s": (_MIXNET_S, 16, 1.0, 1.0), "m": (_MIXNET_M, 24, 1.0, 1.0),
    "l": (_MIXNET_M, 24, 1.3, 1.0), "xl": (_MIXNET_M, 24, 1.6, 1.2),
}
_CC_B0 = [  # CondConv (Yang et al. NeurIPS'19): experts on the last 3 stages
    ["ds_r1_k3_s1_e1_c16_se0.25"],
    ["ir_r2_k3_s2_e6_c24_se0.25"],
    ["ir_r2_k5_s2_e6_c40_se0.25"],
    ["ir_r3_k3_s2_e6_c80_se0.25"],
    ["ir_r3_k5_s1_e6_c112_se0.25_cc4"],
    ["ir_r4_k5_s2_e6_c192_se0.25_cc4"],
    ["ir_r1_k3_s1_e6_c320_se0.25_cc4"],
]
_FBNETC = [  # FBNet-C (Wu et al. CVPR'19 table 2)
    ["ir_r1_k3_s1_e1_c16"],
    ["ir_r1_k3_s2_e6_c24", "ir_r2_k3_s1_e1_c24"],
    ["ir_r1_k5_s2_e6_c32", "ir_r1_k5_s1_e3_c32", "ir_r1_k3_s1_e6_c32",
     "ir_r1_k5_s1_e6_c32"],
    ["ir_r1_k5_s2_e6_c64", "ir_r1_k5_s1_e3_c64", "ir_r2_k5_s1_e6_c64"],
    ["ir_r3_k5_s1_e6_c112", "ir_r1_k5_s1_e3_c112"],
    ["ir_r4_k5_s2_e6_c184"],
    ["ir_r1_k3_s1_e6_c352"],
]
_FBNETV3 = {  # Dai et al. CVPR'21; timm mobilenetv3.py _gen_fbnetv3 tables
    "b": (16, [
        ["ds_r2_k3_s1_e1_c16"],
        ["ir_r1_k5_s2_e4_c24", "ir_r3_k5_s1_e2_c24"],
        ["ir_r1_k5_s2_e5_c40_se0.25", "ir_r4_k5_s1_e3_c40_se0.25"],
        ["ir_r1_k5_s2_e5_c72", "ir_r4_k3_s1_e3_c72"],
        ["ir_r1_k3_s1_e5_c120_se0.25", "ir_r5_k5_s1_e3_c120_se0.25"],
        ["ir_r1_k3_s2_e6_c184_se0.25", "ir_r5_k5_s1_e4_c184_se0.25",
         "ir_r1_k5_s1_e6_c224_se0.25"],
        ["cn_r1_k1_s1_c1344"],
    ]),
    "d": (24, [
        ["ds_r2_k3_s1_e1_c16"],
        ["ir_r1_k3_s2_e5_c24", "ir_r5_k3_s1_e2_c24"],
        ["ir_r1_k5_s2_e4_c40_se0.25", "ir_r4_k3_s1_e3_c40_se0.25"],
        ["ir_r1_k3_s2_e5_c72", "ir_r4_k3_s1_e3_c72"],
        ["ir_r1_k3_s1_e5_c128_se0.25", "ir_r6_k5_s1_e3_c128_se0.25"],
        ["ir_r1_k3_s2_e6_c208_se0.25", "ir_r5_k5_s1_e5_c208_se0.25",
         "ir_r1_k5_s1_e6_c240_se0.25"],
        ["cn_r1_k1_s1_c1440"],
    ]),
    "g": (32, [
        ["ds_r3_k3_s1_e1_c24"],
        ["ir_r1_k5_s2_e4_c40", "ir_r4_k5_s1_e2_c40"],
        ["ir_r1_k5_s2_e4_c56_se0.25", "ir_r4_k5_s1_e3_c56_se0.25"],
        ["ir_r1_k5_s2_e5_c104", "ir_r4_k3_s1_e3_c104"],
        ["ir_r1_k3_s1_e5_c160_se0.25", "ir_r8_k5_s1_e3_c160_se0.25"],
        ["ir_r1_k3_s2_e6_c264_se0.25", "ir_r6_k5_s1_e5_c264_se0.25",
         "ir_r2_k5_s1_e6_c288_se0.25"],
        ["cn_r1_k1_s1_c1728"],
    ]),
}
# HardCoRe-NAS A-F (Nayman et al. '21), timm hardcorenas.py arch strings.
# a/b transcribed from timm's public table; c-f reconstructed from the same
# search space (docs/backbone_fidelity.md Tier 3 — unverified offline).
_HARDCORENAS = {
    "a": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_noskip"],
        ["ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e6_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e6_c80_se0.25", "ir_r1_k5_s1_e6_c80_se0.25"],
        ["ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"],
    ],
    "b": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_noskip",
         "ir_r1_k3_s1_e3_c24_nre_noskip"],
        ["ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre",
         "ir_r1_k5_s1_e3_c40_nre"],
        ["ir_r1_k5_s2_e3_c80", "ir_r1_k5_s1_e3_c80",
         "ir_r1_k3_s1_e3_c80", "ir_r1_k3_s1_e3_c80"],
        ["ir_r1_k5_s1_e3_c112", "ir_r1_k3_s1_e3_c112",
         "ir_r1_k3_s1_e3_c112", "ir_r1_k3_s1_e3_c112"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e3_c192_se0.25"],
        ["cn_r1_k1_s1_c960"],
    ],
    "c": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_noskip"],
        ["ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre",
         "ir_r1_k5_s1_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre"],
        ["ir_r1_k5_s2_e4_c80", "ir_r1_k5_s1_e6_c80_se0.25",
         "ir_r1_k3_s1_e3_c80", "ir_r1_k3_s1_e3_c80"],
        ["ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k3_s1_e3_c112",
         "ir_r1_k3_s1_e3_c112", "ir_r1_k3_s1_e3_c112"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e3_c192_se0.25"],
        ["cn_r1_k1_s1_c960"],
    ],
    "d": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_noskip"],
        ["ir_r1_k5_s2_e3_c40_nre_se0.25", "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k3_s1_e3_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e4_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25",
         "ir_r1_k3_s1_e3_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25"],
        ["ir_r1_k3_s1_e4_c112_se0.25", "ir_r1_k5_s1_e4_c112_se0.25",
         "ir_r1_k3_s1_e3_c112_se0.25", "ir_r1_k5_s1_e3_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"],
    ],
    "e": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_noskip"],
        ["ir_r1_k5_s2_e6_c40_nre_se0.25", "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k5_s1_e4_c40_nre_se0.25", "ir_r1_k3_s1_e3_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e4_c80_se0.25", "ir_r1_k3_s1_e6_c80_se0.25"],
        ["ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25",
         "ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e3_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"],
    ],
    "f": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_noskip"],
        ["ir_r1_k5_s2_e6_c40_nre_se0.25", "ir_r1_k5_s1_e6_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e6_c80_se0.25", "ir_r1_k5_s1_e6_c80_se0.25",
         "ir_r1_k3_s1_e3_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25"],
        ["ir_r1_k3_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25",
         "ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k3_s1_e3_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"],
    ],
}
_TINYNET_COEFFS = {  # (width, depth) — Han et al. NeurIPS'20 table 6
    "a": (1.0, 1.2), "b": (0.75, 1.1), "c": (0.54, 0.85),
    "d": (0.68, 0.54), "e": (0.51, 0.6),
}
_B0 = [  # classic efficientnet-b0 (tinynet's base recipe)
    ["ds_r1_k3_s1_e1_c16_se0.25"],
    ["ir_r2_k3_s2_e6_c24_se0.25"],
    ["ir_r2_k5_s2_e6_c40_se0.25"],
    ["ir_r3_k3_s2_e6_c80_se0.25"],
    ["ir_r3_k5_s1_e6_c112_se0.25"],
    ["ir_r4_k5_s2_e6_c192_se0.25"],
    ["ir_r1_k3_s1_e6_c320_se0.25"],
]

_V2_COEFFS = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
              "b3": (1.2, 1.4)}
_LITE_COEFFS = {"0": (1.0, 1.0), "1": (1.0, 1.1), "2": (1.1, 1.2),
                "3": (1.2, 1.4), "4": (1.4, 1.8)}
_EDGE_COEFFS = {"es": (1.0, 1.0), "em": (1.0, 1.1), "el": (1.2, 1.4)}

# SE conventions per family: ratio base ("in" = block input chs, timm
# efficientnet lineage; "mid" = expanded chs w/ divisor 8, mobilenetv3
# lineage), gate fn and inner activation.
_SE_EFF = dict(base="in", divisor=1, gate="sigmoid", act="silu")
_SE_MNAS = dict(base="in", divisor=1, gate="sigmoid", act="relu")
_SE_MNV3 = dict(base="mid", divisor=8, gate="hard_sigmoid", act="relu")


def mobile_cfg(name: str) -> dict:
    """Resolve a backbone name to (arch blocks, stem, act, se, scaling)."""
    full = name
    if name.startswith("tf_"):
        name = name[len("tf_"):]
    # weight-tag suffixes (same topology, different pretraining data)
    for suf in ("_in21ft1k", "_in21k", "_miil_in21k", "_miil"):
        if name.endswith(suf):
            name = name[: -len(suf)]

    w, d = 1.0, 1.0
    fix_first_last = False
    scale_stem = False
    gc_attn = False

    if name.startswith("gc_efficientnetv2_"):
        # gc_efficientnetv2_rw_t: SE replaced by GCNet global context
        gc_attn = True
        name = name[len("gc_"):]
    if name.startswith("efficientnetv2_"):
        v = name[len("efficientnetv2_"):]
        act, se = "silu", _SE_EFF
        if v in _V2_COEFFS:
            arch, stem, (w, d) = _V2_BASE, 32, _V2_COEFFS[v]
            scale_stem = True
        elif v in ("s", "rw_s"):
            arch, stem = _V2_S, 24
        elif v == "rw_t":
            arch, stem, (w, d) = _V2_S, 24, (0.8, 0.9)
            scale_stem = True
        elif v in ("m", "rw_m"):
            arch, stem = _V2_M, 24
        elif v == "l":
            arch, stem = _V2_L, 32
        elif v == "xl":
            arch, stem = _V2_XL, 32
        else:
            raise ValueError(f"unknown efficientnetv2 variant {full!r}")
    elif name.startswith("efficientnet_lite"):
        arch, stem, act, se = _LITE, 32, "relu6", _SE_EFF
        w, d = _LITE_COEFFS[name[len("efficientnet_lite"):]]
        fix_first_last = True  # timm _gen_efficientnet_lite
    elif name in ("efficientnet_es", "efficientnet_em", "efficientnet_el"):
        arch, stem, act, se = _EDGE, 32, "relu", _SE_EFF
        w, d = _EDGE_COEFFS[name[len("efficientnet_"):]]
        scale_stem = True
    elif name.startswith("mobilenetv3_") or name == "mobilenetv3_rw":
        v = name[len("mobilenetv3_"):]
        act, se = "hswish", _SE_MNV3
        if v == "rw":
            v = "large_100"
        size, mult = v.rsplit("_", 1) if "_" in v else (v, "100")
        if size == "large_minimal":
            arch, act, se = _MNV3_LARGE_MIN, "relu", _SE_MNV3
        elif size == "small_minimal":
            arch, act, se = _MNV3_SMALL_MIN, "relu", _SE_MNV3
        elif size == "large":
            arch = _MNV3_LARGE
        elif size == "small":
            arch = _MNV3_SMALL
        else:
            raise ValueError(f"unknown mobilenetv3 variant {full!r}")
        stem, w = 16, int(mult) / 100.0
        scale_stem = True  # make_divisible keeps 16 at w>=0.75, 8 at 0.5
    elif name.startswith("lcnet_"):
        arch, stem, act, se = _LCNET, 16, "hswish", _SE_MNV3
        w = int(name[len("lcnet_"):]) / 100.0
        scale_stem = True
    elif name.startswith("semnasnet_"):
        arch, stem, act, se = _MNASNET_A1, 32, "relu", _SE_MNAS
        w = int(name[len("semnasnet_"):]) / 100.0
        scale_stem = True
    elif name == "mnasnet_small":
        arch, stem, act, se = _MNASNET_SMALL, 8, "relu", _SE_MNAS
    elif name.startswith("mnasnet_"):
        arch, stem, act, se = _MNASNET_B1, 32, "relu", _SE_MNAS
        w = int(name[len("mnasnet_"):]) / 100.0
        scale_stem = True
    elif name.startswith("efficientnet_cc_"):
        v = name[len("efficientnet_cc_"):]  # b0_4e / b0_8e / b1_8e
        base, ex = v.split("_")
        arch = [
            [bs.replace("cc4", f"cc{int(ex[:-1])}") if "cc4" in bs else bs
             for bs in stage]
            for stage in _CC_B0
        ]
        stem, act, se = 32, "silu", _SE_EFF
        w, d = {"b0": (1.0, 1.0), "b1": (1.0, 1.1)}[base]
        scale_stem = True
    elif name.startswith("fbnetv3_"):
        # timm _gen_fbnetv3: hard_swish, se_from_exp=False (ratio on block
        # input chs), hard_sigmoid gate, relu SE act, plain-round rd chs
        stem, arch = _FBNETV3[name[len("fbnetv3_"):]]
        act = "hswish"
        se = dict(base="in", divisor=1, gate="hard_sigmoid", act="relu")
    elif name.startswith("hardcorenas_"):
        # timm _gen_hardcorenas: mobilenetv3 conventions, stem 32,
        # se_from_exp=False with make_divisible-8 rounding
        arch = _HARDCORENAS[name[len("hardcorenas_"):]]
        stem, act = 32, "hswish"
        se = dict(base="in", divisor=8, gate="hard_sigmoid", act="relu")
    elif name == "fbnetc_100":
        arch, stem, act, se = _FBNETC, 16, "relu", _SE_MNAS
    elif name == "spnasnet_100":
        arch, stem, act, se = _SPNASNET, 32, "relu", _SE_MNAS
    elif name.startswith("mixnet_"):
        if name[len("mixnet_"):] not in _MIXNET_COEFFS:
            raise ValueError(f"unknown mixnet variant {full!r}")
        arch, stem, w, d = _MIXNET_COEFFS[name[len("mixnet_"):]]
        act = "relu"
        se = dict(base="in", divisor=1, gate="sigmoid", act="relu")
        scale_stem = True
    elif name.startswith("tinynet_"):
        arch, stem, act, se = _B0, 32, "silu", _SE_EFF
        w, d = _TINYNET_COEFFS[name[len("tinynet_"):]]
        scale_stem = True
        fix_first_last = True  # timm _gen_tinynet keeps stage0/6 repeats
    else:
        raise ValueError(f"unknown mobile backbone {full!r}")

    stages = []
    n_stages = len(arch)
    for si, stage in enumerate(arch):
        blocks = []
        for bs in stage:
            spec = dict(decode_block(bs))
            spec["channels"] = make_divisible(spec["channels"] * w)
            if spec["fake_in"]:
                spec["fake_in"] = make_divisible(spec["fake_in"] * w)
            r = spec["repeat"]
            if not (fix_first_last and si in (0, n_stages - 1)):
                r = int(math.ceil(r * d))
            spec["repeat"] = r
            blocks.append(spec)
        stages.append(blocks)

    return dict(
        stages=stages, act=act, se=se, gc=gc_attn,
        stem=make_divisible(stem * w) if scale_stem else stem,
    )


# ---------------------------------------------------------------------------
# flax blocks
# ---------------------------------------------------------------------------

_ACTS = {
    "relu": nn.relu,
    "relu6": nn.relu6,
    "silu": nn.silu,
    "swish": nn.silu,
    "hswish": nn.hard_swish,
}


def _hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class MobileTrunk(nn.Module):
    """Feature-pyramid trunk for any `mobile_cfg` backbone."""

    variant: str = "mobilenetv3_large_100"
    train: bool = False
    dtype: object = None

    def _bn(self, x, name):
        return nn.BatchNorm(
            use_running_average=not self.train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name=name,
        )(x)

    def _conv(self, x, feat, k, s=1, groups=1, name=None):
        return nn.Conv(
            feat, (k, k), strides=(s, s), padding="SAME",
            feature_group_count=groups, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype, name=name,
        )(x)

    def _cond_conv(self, x, feat, k, stride, groups, experts, prefix):
        """CondConv (Yang et al. NeurIPS'19): per-sample sigmoid routing
        over expert kernels. Conv is linear in the kernel, so we run ONE
        conv with experts folded into the output channels and combine the
        E outputs with the routing weights — exact, and MXU-friendly."""
        r = x.mean(axis=(1, 2))
        r = nn.sigmoid(nn.Dense(experts, dtype=self.dtype,
                                name=f"{prefix}_route")(r))  # [B, E]
        y = nn.Conv(
            feat * experts, (k, k), strides=(stride, stride),
            padding="SAME", feature_group_count=groups, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype,
            name=f"{prefix}_experts",
        )(x)
        b, hh, ww, _ = y.shape
        # grouped convs emit group-major channels (g*E + e) -> [feat, E]
        y = y.reshape(b, hh, ww, feat, experts)
        return jnp.einsum("bhwfe,be->bhwf", y, r.astype(y.dtype))

    def _mixed_dw(self, x, kernel, stride, prefix):
        """Depthwise conv; a tuple kernel = mixnet MixedConv (channel
        groups each with their own kernel size, remainder to group 0)."""
        c = x.shape[-1]
        if not isinstance(kernel, tuple):
            return self._conv(x, c, kernel, stride, groups=c,
                              name=f"{prefix}_dw")
        n = len(kernel)
        splits = [c // n] * n
        splits[0] += c - sum(splits)
        parts, off = [], 0
        for j, (k, cj) in enumerate(zip(kernel, splits)):
            parts.append(
                self._conv(x[..., off: off + cj], cj, k, stride, groups=cj,
                           name=f"{prefix}_dw{j}")
            )
            off += cj
        return jnp.concatenate(parts, axis=-1)

    def _se(self, x, spec, se_cfg, act, prefix, gc=False):
        if not spec["se"]:
            return x
        if gc:
            from sfmnext_tpu.models.byob import gc_module

            return gc_module(x, self.dtype, self.train, f"{prefix}_gc")
        in_ch, mid = spec["_in"], x.shape[-1]
        base = in_ch if se_cfg["base"] == "in" else mid
        se_ch = max(1, int(base * spec["se"]))
        if se_cfg["divisor"] > 1:
            se_ch = make_divisible(se_ch, se_cfg["divisor"])
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype,
                    name=f"{prefix}_se_reduce")(s)
        s = _ACTS[se_cfg["act"]](s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype,
                    name=f"{prefix}_se_expand")(s)
        gate = _hard_sigmoid if se_cfg["gate"] == "hard_sigmoid" else nn.sigmoid
        return x * gate(s)

    @nn.compact
    def __call__(self, x):
        cfg = mobile_cfg(self.variant)
        act = _ACTS[cfg["act"]]
        se_cfg = cfg["se"]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = self._conv(x, cfg["stem"], 3, 2, name="conv_stem")
        y = act(self._bn(y, "bn_stem"))

        reduction = 2
        last_at = {reduction: y}
        for si, stage in enumerate(cfg["stages"]):
            bi = 0
            for spec in stage:
                for r in range(spec["repeat"]):
                    p = f"s{si}_b{bi}"
                    bi += 1
                    stride = spec["stride"] if r == 0 else 1
                    in_ch = y.shape[-1]
                    out_ch = spec["channels"]
                    sp = dict(spec, _in=in_ch)
                    shortcut = y
                    t = spec["type"]
                    bact = _ACTS[spec["act"] or cfg["act"]]
                    if t == "cn":
                        y = self._conv(y, out_ch, spec["kernel"], stride,
                                       name=f"{p}_conv")
                        y = bact(self._bn(y, f"{p}_bn"))
                        if spec["skip"] and stride == 1 and in_ch == out_ch:
                            y = y + shortcut
                    elif t in ("ds", "dsa"):
                        y = self._mixed_dw(y, spec["kernel"], stride, p)
                        y = bact(self._bn(y, f"{p}_dw_bn"))
                        y = self._se(y, sp, se_cfg, act, p, cfg["gc"])
                        y = self._conv(y, out_ch, 1, name=f"{p}_pw")
                        y = self._bn(y, f"{p}_pw_bn")
                        if t == "dsa":
                            y = bact(y)
                        elif (stride == 1 and in_ch == out_ch
                                and not spec["noskip"]):
                            y = y + shortcut
                    elif t == "ir":
                        mid = make_divisible(in_ch * spec["expand"])
                        ex = spec["experts"]
                        if ex:
                            y = self._cond_conv(y, mid, 1, 1, 1, ex,
                                                f"{p}_pw_exp")
                        else:
                            y = self._conv(y, mid, 1,
                                           groups=spec["exp_groups"],
                                           name=f"{p}_pw_exp")
                        y = bact(self._bn(y, f"{p}_pw_exp_bn"))
                        if ex:
                            y = self._cond_conv(y, mid, spec["kernel"],
                                                stride, mid, ex, f"{p}_dw")
                        else:
                            y = self._mixed_dw(y, spec["kernel"], stride, p)
                        y = bact(self._bn(y, f"{p}_dw_bn"))
                        y = self._se(y, sp, se_cfg, act, p, cfg["gc"])
                        if ex:
                            y = self._cond_conv(y, out_ch, 1, 1, 1, ex,
                                                f"{p}_pw_proj")
                        else:
                            y = self._conv(y, out_ch, 1,
                                           groups=spec["proj_groups"],
                                           name=f"{p}_pw_proj")
                        y = self._bn(y, f"{p}_pw_proj_bn")
                        if (stride == 1 and in_ch == out_ch
                                and not spec["noskip"]):
                            y = y + shortcut
                    elif t == "er":
                        base_in = spec["fake_in"] or in_ch
                        mid = make_divisible(base_in * spec["expand"])
                        y = self._conv(y, mid, spec["kernel"], stride,
                                       name=f"{p}_conv_exp")
                        y = bact(self._bn(y, f"{p}_conv_exp_bn"))
                        y = self._se(y, sp, se_cfg, act, p, cfg["gc"])
                        y = self._conv(y, out_ch, 1, name=f"{p}_pw_proj")
                        y = self._bn(y, f"{p}_pw_proj_bn")
                        if (stride == 1 and in_ch == out_ch
                                and not spec["noskip"]):
                            y = y + shortcut
                    else:
                        raise ValueError(f"unknown block type {t!r}")
                    if stride == 2:
                        reduction *= 2
                    last_at[reduction] = y

        missing = [r for r in (2, 4, 8, 16, 32) if r not in last_at]
        if missing:
            raise ValueError(
                f"{self.variant}: no feature taps at reductions {missing}"
            )
        return [last_at[r] for r in (2, 4, 8, 16, 32)]
