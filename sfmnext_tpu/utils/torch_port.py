"""Import torch ``.pth`` checkpoints (reference / torchvision) into our trees.

The reference ships per-module checkpoints (encoder.pth / depth.pth /
pose.pth, trainer.py:638-660) and initializes encoders from torchvision
ImageNet weights (networks/resnet_encoder.py:57,84). This shim maps those
state_dicts onto our Flax param/batch_stats trees so published weights can
be evaluated for parity and used as pretrained init.

Layout conversions:
  conv  weight [O,I,kh,kw] -> kernel [kh,kw,I,O]
  linear weight [O,I]      -> kernel [I,O]
  BN weight/bias           -> scale/bias;  running_mean/var -> batch_stats
  MultiheadAttention in_proj (3E,E) -> split q/k/v, reshaped to
    [E, heads, head_dim]; out_proj [E,E] -> [heads, head_dim, E]
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "items"):
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")  # DataParallel prefix (trainer.py:103)
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# --------------------------------------------------------------------- ResNet


def _bn(sd, prefix) -> Tuple[dict, dict]:
    p = {"scale": np.asarray(sd[prefix + ".weight"]),
         "bias": np.asarray(sd[prefix + ".bias"])}
    s = {"mean": np.asarray(sd[prefix + ".running_mean"]),
         "var": np.asarray(sd[prefix + ".running_var"])}
    return p, s


def convert_resnet_encoder(sd: Dict[str, np.ndarray], num_layers: int):
    """torchvision-style ResNet state_dict -> (params, batch_stats) for
    models.resnet.ResNetEncoder."""
    from sfmnext_tpu.models.resnet import RESNET_SPECS

    block_kind, stage_sizes = RESNET_SPECS[num_layers]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv_w(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = {}, {}
    bnp, bns = _bn(sd, "bn1")
    params["bn1"]["BatchNorm_0"], stats["bn1"]["BatchNorm_0"] = bnp, bns

    for stage, n_blocks in enumerate(stage_sizes):
        for i in range(n_blocks):
            src = f"layer{stage + 1}.{i}"
            dst = f"layer{stage + 1}_{i}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            n_convs = 2 if block_kind == "basic" else 3
            for c in range(1, n_convs + 1):
                blk_p[f"conv{c}"] = {"kernel": _conv_w(sd[f"{src}.conv{c}.weight"])}
                bnp, bns = _bn(sd, f"{src}.bn{c}")
                blk_p[f"bn{c}"] = {"BatchNorm_0": bnp}
                blk_s[f"bn{c}"] = {"BatchNorm_0": bns}
            if f"{src}.downsample.0.weight" in sd:
                blk_p["down_conv"] = {
                    "kernel": _conv_w(sd[f"{src}.downsample.0.weight"])
                }
                bnp, bns = _bn(sd, f"{src}.downsample.1")
                blk_p["down_bn"] = {"BatchNorm_0": bnp}
                blk_s["down_bn"] = {"BatchNorm_0": bns}
            params[dst] = blk_p
            stats[dst] = blk_s
    return params, stats


def _conv_pb(sd, prefix) -> dict:
    out = {"kernel": _conv_w(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def convert_decoder_bn(sd: Dict[str, np.ndarray], prefix: str = "decoder."):
    """Reference DecoderBN state_dict -> (params, batch_stats).

    Reference module names (resnet_encoder.py:120-134): conv2, up{1..4}
    with _net = [conv, bn, lrelu, conv, bn, lrelu], conv3.
    """
    params: Dict[str, Any] = {"conv2": {"Conv_0": _conv_pb(sd, prefix + "conv2")},
                              "conv3": {"Conv_0": _conv_pb(sd, prefix + "conv3")}}
    stats: Dict[str, Any] = {}
    for u in range(1, 5):
        src = f"{prefix}up{u}._net"
        up_p: Dict[str, Any] = {}
        up_s: Dict[str, Any] = {}
        up_p["conv_a"] = {"Conv_0": _conv_pb(sd, f"{src}.0")}
        bnp, bns = _bn(sd, f"{src}.1")
        up_p["bn_a"] = {"BatchNorm_0": bnp}
        up_s["bn_a"] = {"BatchNorm_0": bns}
        up_p["conv_b"] = {"Conv_0": _conv_pb(sd, f"{src}.3")}
        bnp, bns = _bn(sd, f"{src}.4")
        up_p["bn_b"] = {"BatchNorm_0": bnp}
        up_s["bn_b"] = {"BatchNorm_0": bns}
        params[f"up{u}"] = up_p
        stats[f"up{u}"] = up_s
    return params, stats


def convert_resnet_encoder_decoder(sd: Dict[str, np.ndarray], num_layers: int):
    """Reference ResnetEncoderDecoder (encoder.pth) -> our combined tree."""
    enc_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    enc_p, enc_s = convert_resnet_encoder(enc_sd, num_layers)
    dec_p, dec_s = convert_decoder_bn(sd, "decoder.")
    params = {"encoder": enc_p, "decoder": dec_p}
    stats = {"encoder": enc_s, "decoder": dec_s}
    return params, stats


# --------------------------------------------------------------- SQL decoder


def convert_sql_decoder(sd: Dict[str, np.ndarray], num_heads: int = 4):
    """Reference Depth_Decoder_QueryTr (depth.pth) -> SQLDecoder params."""
    params: Dict[str, Any] = {}
    params["embedding_convPxP"] = {"Conv_0": _conv_pb(sd, "embedding_convPxP")}
    params["positional_encodings"] = np.asarray(sd["positional_encodings"])
    params["conv3x3"] = {"Conv_0": _conv_pb(sd, "conv3x3")}

    for i in range(4):
        src = f"transformer_encoder.layers.{i}"
        e = np.asarray(sd[f"{src}.self_attn.in_proj_weight"]).shape[1]
        hd = e // num_heads
        in_w = np.asarray(sd[f"{src}.self_attn.in_proj_weight"])  # [3E, E]
        in_b = np.asarray(sd[f"{src}.self_attn.in_proj_bias"])  # [3E]
        qw, kw, vw = in_w[:e], in_w[e : 2 * e], in_w[2 * e :]
        qb, kb, vb = in_b[:e], in_b[e : 2 * e], in_b[2 * e :]

        def proj(w, b):
            # torch [E_out, E_in] -> flax [E_in, heads, head_dim]
            return {
                "kernel": _lin_w(w).reshape(e, num_heads, hd),
                "bias": b.reshape(num_heads, hd),
            }

        out_w = np.asarray(sd[f"{src}.self_attn.out_proj.weight"])  # [E,E]
        layer = {
            "self_attn": {
                "query": proj(qw, qb),
                "key": proj(kw, kb),
                "value": proj(vw, vb),
                "out": {
                    "kernel": _lin_w(out_w).reshape(num_heads, hd, e),
                    "bias": np.asarray(sd[f"{src}.self_attn.out_proj.bias"]),
                },
            },
            "linear1": {"Dense_0": {
                "kernel": _lin_w(sd[f"{src}.linear1.weight"]),
                "bias": np.asarray(sd[f"{src}.linear1.bias"]),
            }},
            "linear2": {"Dense_0": {
                "kernel": _lin_w(sd[f"{src}.linear2.weight"]),
                "bias": np.asarray(sd[f"{src}.linear2.bias"]),
            }},
            "norm1": {
                "scale": np.asarray(sd[f"{src}.norm1.weight"]),
                "bias": np.asarray(sd[f"{src}.norm1.bias"]),
            },
            "norm2": {
                "scale": np.asarray(sd[f"{src}.norm2.weight"]),
                "bias": np.asarray(sd[f"{src}.norm2.bias"]),
            },
        }
        params[f"tf_layer{i}"] = layer

    params["bins_reg1"] = {"Dense_0": {
        "kernel": _lin_w(sd["bins_regressor.0.weight"]),
        "bias": np.asarray(sd["bins_regressor.0.bias"]),
    }}
    params["bins_reg2"] = {"Dense_0": {
        "kernel": _lin_w(sd["bins_regressor.2.weight"]),
        "bias": np.asarray(sd["bins_regressor.2.bias"]),
    }}
    params["bins_reg3"] = {"Dense_0": {
        "kernel": _lin_w(sd["bins_regressor.4.weight"]),
        "bias": np.asarray(sd["bins_regressor.4.bias"]),
    }}

    # convert_to_prob.0: Conv2d(Q->D, 1x1): weight [D,Q,1,1] -> [Q,D]
    w = np.asarray(sd["convert_to_prob.0.weight"])[:, :, 0, 0]
    params["prob_kernel"] = np.transpose(w, (1, 0))
    params["prob_bias"] = np.asarray(sd["convert_to_prob.0.bias"])
    return params


# ------------------------------------------------------------ EfficientNet-B5


def convert_efficientnet_b5(sd: Dict[str, np.ndarray], prefix: str = "",
                            variant: str = "efficientnet_b5"):
    """gen-efficientnet / timm efficientnet state_dict ->
    (params, batch_stats) for models.efficientnet.EfficientNet.

    Key layout is the torch.hub rwightman/gen-efficientnet-pytorch model the
    reference loads (networks/base_encoder.py:91-94): conv_stem / bn1 /
    blocks.{stage}.{block}.* / conv_head, with DepthwiseSeparableConv naming
    in stage 0 (conv_dw,bn1,se,conv_pw,bn2) and InvertedResidual elsewhere
    (conv_pw,bn1,conv_dw,bn2,se,conv_pwl,bn3). conv_head is skipped when the
    checkpoint lacks it (timm features_only Unet backbones).
    """
    from sfmnext_tpu.models.efficientnet import efficientnet_cfg

    cfg = efficientnet_cfg(variant)

    def g(key):
        return sd[prefix + key]

    params: Dict[str, Any] = {"conv_stem": {"kernel": _conv_w(g("conv_stem.weight"))}}
    stats: Dict[str, Any] = {}
    bnp, bns = _bn(sd, prefix + "bn1")
    params["bn1"] = {"BatchNorm_0": bnp}
    stats["bn1"] = {"BatchNorm_0": bns}

    for si in range(7):
        expand = cfg["expand"][si]
        for bi in range(cfg["repeats"][si]):
            src = f"blocks.{si}.{bi}"
            dst = f"stage{si}_block{bi}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            if expand == 1:
                names = [("conv_dw", "dw_conv", "bn1", "dw_bn"),
                         ("conv_pw", "project_conv", "bn2", "project_bn")]
            else:
                names = [("conv_pw", "expand_conv", "bn1", "expand_bn"),
                         ("conv_dw", "dw_conv", "bn2", "dw_bn"),
                         ("conv_pwl", "project_conv", "bn3", "project_bn")]
            for t_conv, f_conv, t_bn, f_bn in names:
                blk_p[f_conv] = {"kernel": _conv_w(g(f"{src}.{t_conv}.weight"))}
                bnp, bns = _bn(sd, f"{prefix}{src}.{t_bn}")
                blk_p[f_bn] = {"BatchNorm_0": bnp}
                blk_s[f_bn] = {"BatchNorm_0": bns}
            for t_se, f_se in (
                ("se.conv_reduce", "se_reduce"),
                ("se.conv_expand", "se_expand"),
            ):
                blk_p[f_se] = {
                    "kernel": _conv_w(g(f"{src}.{t_se}.weight")),
                    "bias": np.asarray(g(f"{src}.{t_se}.bias")),
                }
            params[dst] = blk_p
            stats[dst] = blk_s

    if prefix + "conv_head.weight" in sd:
        params["conv_head"] = {"kernel": _conv_w(g("conv_head.weight"))}
    return params, stats


def convert_base_encoder_decoder(sd: Dict[str, np.ndarray]):
    """Reference eff_b5 BaseEncoder checkpoint (encoder.pth) -> combined tree
    for models.efficientnet.BaseEncoderDecoder.

    Reference module paths (base_encoder.py:60-85): encoder.original_model.*
    for the backbone, decoder.* for the same UpSampleBN decoder the resnet
    path uses.
    """
    enc_p, enc_s = convert_efficientnet_b5(sd, prefix="encoder.original_model.")
    dec_p, dec_s = convert_decoder_bn(sd, "decoder.")
    return (
        {"encoder": enc_p, "decoder": dec_p},
        {"encoder": enc_s, "decoder": dec_s},
    )


# --------------------------------------------------------------- ConvNeXt/Unet


def _normalize_convnext_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Accept the naming variants timm emits for convnext state_dicts:
    features_only flattening (stages_0 -> stages.0, stem_0 -> stem.0) and
    mlp.fc1/fc2 vs pwconv1/pwconv2 block MLP names."""
    import re

    out = {}
    for k, v in sd.items():
        k = re.sub(r"\bstages_(\d+)\.", r"stages.\1.", k)
        k = re.sub(r"\bstem_(\d+)\.", r"stem.\1.", k)
        k = k.replace(".mlp.fc1.", ".pwconv1.").replace(".mlp.fc2.", ".pwconv2.")
        k = k.replace(".conv_dw.", ".dwconv.")
        out[k] = v
    return out


def convert_convnext(sd: Dict[str, np.ndarray], depths, prefix: str = ""):
    """timm convnext (features_only) state_dict -> params for
    models.convnext.ConvNeXt (no batch_stats: LayerNorm only)."""
    sd = {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }
    sd = _normalize_convnext_keys(sd)

    def ln(key):
        return {
            "scale": np.asarray(sd[key + ".weight"]),
            "bias": np.asarray(sd[key + ".bias"]),
        }

    params: Dict[str, Any] = {
        "stem_conv": _conv_pb(sd, "stem.0"),
        "stem_norm": ln("stem.1"),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            params[f"down{si}_norm"] = ln(f"stages.{si}.downsample.0")
            params[f"down{si}_conv"] = _conv_pb(sd, f"stages.{si}.downsample.1")
        for bi in range(depth):
            src = f"stages.{si}.blocks.{bi}"
            params[f"stage{si}_block{bi}"] = {
                "dwconv": _conv_pb(sd, f"{src}.dwconv"),
                "norm": ln(f"{src}.norm"),
                "pwconv1": {
                    "kernel": _lin_w(sd[f"{src}.pwconv1.weight"]),
                    "bias": np.asarray(sd[f"{src}.pwconv1.bias"]),
                },
                "pwconv2": {
                    "kernel": _lin_w(sd[f"{src}.pwconv2.weight"]),
                    "bias": np.asarray(sd[f"{src}.pwconv2.bias"]),
                },
                "gamma": np.asarray(sd[f"{src}.gamma"]),
            }
    return params


def convert_unet_decoder(sd: Dict[str, np.ndarray], n_blocks: int = 4,
                         prefix: str = "decoder."):
    """Reference UnetDecoder state_dict -> params + batch_stats
    (networks/Unet.py:258-312: blocks.{i}.conv{1,2}.{conv,bn}, final_conv)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_blocks):
        blk_p: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        for c in (1, 2):
            src = f"{prefix}blocks.{i}.conv{c}"
            bnp, bns = _bn(sd, src + ".bn")
            blk_p[f"conv{c}"] = {
                "conv": {"kernel": _conv_w(sd[src + ".conv.weight"])},
                "bn": {"BatchNorm_0": bnp},
            }
            blk_s[f"conv{c}"] = {"bn": {"BatchNorm_0": bns}}
        params[f"block{i}"] = blk_p
        stats[f"block{i}"] = blk_s
    params["final_conv"] = _conv_pb(sd, prefix + "final_conv")
    return params, stats


def convert_convnext_unet(sd: Dict[str, np.ndarray], backbone: str):
    """Reference Unet(convnext_*) checkpoint (encoder.pth) -> combined tree
    for models.unet.Unet (encoder.* timm backbone + decoder.* UnetDecoder)."""
    from sfmnext_tpu.models.convnext import convnext_cfg

    depths, _ = convnext_cfg(backbone)
    enc_p = convert_convnext(sd, depths, prefix="encoder.")
    dec_p, dec_s = convert_unet_decoder(sd, n_blocks=4, prefix="decoder.")
    return (
        {"encoder": enc_p, "decoder": dec_p},
        {"encoder": {}, "decoder": dec_s},
    )


def convert_unet(sd: Dict[str, np.ndarray], backbone: str):
    """Reference Unet checkpoint for any supported timm backbone family."""
    from sfmnext_tpu.utils.imagenet_init import strip_weight_alias

    backbone = strip_weight_alias(backbone)
    if backbone.startswith("convnext"):
        return convert_convnext_unet(sd, backbone)
    import re as _re

    if _re.search(r"efficientnet_b\d", backbone):
        enc_p, enc_s = convert_efficientnet_b5(
            sd, prefix="encoder.", variant=backbone
        )
        dec_p, dec_s = convert_unet_decoder(sd, n_blocks=4, prefix="decoder.")
        return (
            {"encoder": enc_p, "decoder": dec_p},
            {"encoder": enc_s, "decoder": dec_s},
        )
    if backbone.startswith(
        ("resnet", "resnext", "wide_resnet", "seresnet", "seresnext",
         "legacy_seresnet", "legacy_seresnext", "ecaresnet", "gluon_resnet")
    ) and not backbone.startswith(("resnetv2", "resnetrs", "resnest")):
        from sfmnext_tpu.models.unet import parse_resnet_variant

        kw = parse_resnet_variant(backbone)
        enc_sd = {
            k[len("encoder."):]: v
            for k, v in sd.items()
            if k.startswith("encoder.")
        }
        if kw["stem_type"] or kw["attn"] or kw["se_reduction"] \
                or kw["avg_down"]:
            enc_p, enc_s = convert_timm_resnet(
                enc_sd, kw["num_layers"], stem_type=kw["stem_type"],
                se_reduction=kw["se_reduction"], attn=kw["attn"],
            )
        else:
            enc_p, enc_s = convert_resnet_encoder(enc_sd, kw["num_layers"])
        dec_p, dec_s = convert_unet_decoder(sd, n_blocks=4, prefix="decoder.")
        return (
            {"encoder": enc_p, "decoder": dec_p},
            {"encoder": enc_s, "decoder": dec_s},
        )
    if backbone.startswith(
        ("mobilenetv3_", "tf_mobilenetv3_", "efficientnetv2_",
         "tf_efficientnetv2_", "efficientnet_lite", "tf_efficientnet_lite",
         "lcnet_", "mnasnet_", "semnasnet_", "spnasnet_", "tinynet_")
    ):
        enc_p, enc_s = convert_mobile_trunk(sd, backbone, prefix="encoder.")
        dec_p, dec_s = convert_unet_decoder(sd, n_blocks=4, prefix="decoder.")
        return (
            {"encoder": enc_p, "decoder": dec_p},
            {"encoder": enc_s, "decoder": dec_s},
        )
    family_converters = (
        (("regnetx_", "regnety_"), convert_regnet),
        (("resnetv2_",), convert_resnetv2),
        (("resnest",), convert_resnest),
        (("dm_nfnet_", "eca_nfnet_", "nfnet_"), convert_nfnet),
        (("dpn",), convert_dpn),
        (("hrnet_",), convert_hrnet),
        (("ese_vovnet",), convert_vovnet),
        (("repvgg_",), convert_repvgg),
        (("ghostnet_",), convert_ghostnet),
        (("rexnet_",), convert_rexnet),
        (("xception", "gluon_xception"), convert_xception),
    )
    for prefixes, conv in family_converters:
        if backbone.startswith(prefixes):
            enc = conv(sd, backbone, prefix="encoder.")
            # normalizer-free families return params only
            enc_p, enc_s = enc if isinstance(enc, tuple) else (enc, {})
            dec_p, dec_s = convert_unet_decoder(
                sd, n_blocks=4, prefix="decoder."
            )
            return (
                {"encoder": enc_p, "decoder": dec_p},
                {"encoder": enc_s, "decoder": dec_s},
            )
    raise NotImplementedError(f"no Unet converter for backbone {backbone!r}")


def convert_encoder_pth(sd: Dict[str, np.ndarray], opt):
    """Dispatch an encoder.pth state_dict by --backbone (the reference's
    model switch, trainer.py:57-64). Returns (params, batch_stats) for the
    'encoder' module of the bundle."""
    if opt.backbone in ("resnet", "resnet_lite"):
        return convert_resnet_encoder_decoder(sd, opt.num_layers)
    if opt.backbone == "resnet18_lite":
        return convert_resnet_encoder_decoder(sd, 18)
    if opt.backbone == "eff_b5":
        return convert_base_encoder_decoder(sd)
    return convert_unet(sd, opt.backbone)


# -------------------------------------------------------------------- PoseCNN


def convert_rectify(sd: Dict[str, np.ndarray]):
    """Reference RectifyNet checkpoint (rectify.pth) -> (params, batch_stats).

    Layout (networks/rectify_net.py:6-68): encoder.encoder.* is a 2-image
    torchvision ResNet-18; decoder.conv_squeeze + decoder.convs_pose.{0,1,2}
    map to our squeeze/pose_0/pose_1/pose_2 TorchConvs.
    """
    enc_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    enc_p, enc_s = convert_resnet_encoder(enc_sd, 18)
    dec = {
        "squeeze": {"Conv_0": _conv_pb(sd, "decoder.conv_squeeze")},
        "pose_0": {"Conv_0": _conv_pb(sd, "decoder.convs_pose.0")},
        "pose_1": {"Conv_0": _conv_pb(sd, "decoder.convs_pose.1")},
        "pose_2": {"Conv_0": _conv_pb(sd, "decoder.convs_pose.2")},
    }
    return {"encoder": enc_p, "decoder": dec}, {"encoder": enc_s}


def convert_pose_cnn(sd: Dict[str, np.ndarray]):
    params: Dict[str, Any] = {}
    for i in range(7):
        params[f"conv{i}"] = {"Conv_0": _conv_pb(sd, f"net.{i}")}
    params["pose_conv"] = {"Conv_0": _conv_pb(sd, "pose_conv")}
    return params


# -------------------------------------------------------------------- RegNet


def convert_regnet(sd: Dict[str, np.ndarray], variant: str,
                   prefix: str = ""):
    """timm RegNetX/Y state_dict -> (params, batch_stats) for
    models.regnet.RegNet.

    timm naming (the reference loads these via timm.create_model,
    networks/Unet.py:114-117): stem.conv/stem.bn; stages s{1..4} with
    blocks b{1..}, each conv1/conv2/conv3 as ConvBnAct (.conv/.bn),
    optional se.fc1/se.fc2 (RegNetY), and downsample.conv/.bn on the
    first block of a stage.
    """
    from sfmnext_tpu.models.regnet import REGNET_CFG

    depths, _, _, se = REGNET_CFG[variant]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_pair(dst_p, dst_s, name, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    params["stem_conv"] = {"kernel": _conv_w(sd[prefix + "stem.conv.weight"])}
    bn_pair(params, stats, "stem_bn", "stem.bn")

    for stage, d in enumerate(depths, start=1):
        for bi in range(d):
            src = f"s{stage}.b{bi + 1}"
            dst = f"s{stage}_b{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in ("conv1", "conv2", "conv3"):
                bp[f"{c}_conv"] = {
                    "kernel": _conv_w(sd[f"{prefix}{src}.{c}.conv.weight"])
                }
                bn_pair(bp, bs, f"{c}_bn", f"{src}.{c}.bn")
            if se:
                bp["se_fc1"] = _conv_pb(sd, f"{prefix}{src}.se.fc1")
                bp["se_fc2"] = _conv_pb(sd, f"{prefix}{src}.se.fc2")
            if f"{prefix}{src}.downsample.conv.weight" in sd:
                bp["down_conv"] = {
                    "kernel": _conv_w(
                        sd[f"{prefix}{src}.downsample.conv.weight"]
                    )
                }
                bn_pair(bp, bs, "down_bn", f"{src}.downsample.bn")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


# ------------------------------------------------- timm resnet d/t variants


def convert_timm_resnet(sd: Dict[str, np.ndarray], num_layers: int,
                        stem_type: str = "", se_reduction: int = 0,
                        attn: str = "", prefix: str = ""):
    """timm ResNet state_dict (resnet*d/t, seresnet*, ecaresnet*, gluon
    v1c/v1d/v1s) -> (params, batch_stats) for models.resnet.ResNetEncoder.

    timm naming (timm/models/resnet.py): deep stems are
    ``conv1.{0,3,6}`` convs with ``conv1.{1,4}`` BNs + final ``bn1``;
    blocks ``layer{X}.{Y}.conv{1..3}/bn{1..3}`` with the attention module
    always called ``se`` (SEModule ``se.fc1/fc2``, EcaModule ``se.conv``)
    and avg-down shortcuts as ``downsample.{1,2}`` (``.0`` is the pool).
    """
    from sfmnext_tpu.models.resnet import RESNET_SPECS

    block_kind, stage_sizes = RESNET_SPECS[num_layers]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_pair(dst_p, dst_s, name, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    if stem_type:
        for i, (cw, bn_src) in enumerate(
            (("conv1.0", "conv1.1"), ("conv1.3", "conv1.4"),
             ("conv1.6", "bn1"))
        ):
            params[f"conv1_{i}"] = {
                "kernel": _conv_w(sd[f"{prefix}{cw}.weight"])
            }
            bn_pair(params, stats, f"bn1_{i}", bn_src)
    else:
        params["conv1"] = {"kernel": _conv_w(sd[prefix + "conv1.weight"])}
        bn_pair(params, stats, "bn1", "bn1")

    n_convs = 2 if block_kind == "basic" else 3
    for stage, n_blocks in enumerate(stage_sizes):
        for i in range(n_blocks):
            src = f"layer{stage + 1}.{i}"
            dst = f"layer{stage + 1}_{i}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = {
                    "kernel": _conv_w(sd[f"{prefix}{src}.conv{c}.weight"])
                }
                bn_pair(bp, bs, f"bn{c}", f"{src}.bn{c}")
            if se_reduction:
                bp["se_fc1"] = _conv_pb(sd, f"{prefix}{src}.se.fc1")
                bp["se_fc2"] = _conv_pb(sd, f"{prefix}{src}.se.fc2")
            if attn == "eca":
                w = np.asarray(sd[f"{prefix}{src}.se.conv.weight"])
                bp["eca_conv"] = {"kernel": np.transpose(w, (2, 1, 0))}
            if f"{prefix}{src}.downsample.2.running_mean" in sd:
                # avg_down: downsample = [pool, conv, bn]
                bp["down_conv"] = {
                    "kernel": _conv_w(sd[f"{prefix}{src}.downsample.1.weight"])
                }
                bn_pair(bp, bs, "down_bn", f"{src}.downsample.2")
            elif f"{prefix}{src}.downsample.0.weight" in sd:
                bp["down_conv"] = {
                    "kernel": _conv_w(sd[f"{prefix}{src}.downsample.0.weight"])
                }
                bn_pair(bp, bs, "down_bn", f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


# ----------------------------------------------------- mobile trunk (timm)


def convert_mobile_trunk(sd: Dict[str, np.ndarray], variant: str,
                         prefix: str = ""):
    """timm efficientnet-builder state_dict (mobilenetv3 / efficientnetv2 /
    lite / lcnet / mnasnet / tinynet families) -> (params, batch_stats) for
    models.mobile_builder.MobileTrunk.

    timm naming: ``conv_stem``/``bn1``; ``blocks.{stage}.{idx}.`` with
    per-type members — ds: conv_dw/bn1/[se]/conv_pw/bn2; ir: conv_pw/bn1/
    conv_dw/bn2/[se]/conv_pwl/bn3; er: conv_exp/bn1/[se]/conv_pwl/bn2;
    cn: conv/bn1. SE is ``se.conv_reduce``/``se.conv_expand``.
    """
    from sfmnext_tpu.models.mobile_builder import mobile_cfg

    cfg = mobile_cfg(variant)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst_name, src):
        p, s = _bn(sd, prefix + src)
        params[dst_name] = p
        stats[dst_name] = s

    params["conv_stem"] = {"kernel": _conv_w(sd[prefix + "conv_stem.weight"])}
    bn("bn_stem", "bn1")

    for si, stage in enumerate(cfg["stages"]):
        flat = []
        for spec in stage:
            flat += [spec] * spec["repeat"]
        for bi, spec in enumerate(flat):
            src = f"blocks.{si}.{bi}"
            dst = f"s{si}_b{bi}"
            t = spec["type"]

            def conv(dst_suffix, src_member, b=bi):
                params[f"{dst}_{dst_suffix}"] = {
                    "kernel": _conv_w(
                        sd[f"{prefix}blocks.{si}.{b}.{src_member}.weight"]
                    )
                }

            def se():
                if spec["se"]:
                    params[f"{dst}_se_reduce"] = _conv_pb(
                        sd, f"{prefix}{src}.se.conv_reduce")
                    params[f"{dst}_se_expand"] = _conv_pb(
                        sd, f"{prefix}{src}.se.conv_expand")

            if t == "cn":
                conv("conv", "conv")
                bn(f"{dst}_bn", f"{src}.bn1")
            elif t in ("ds", "dsa"):
                conv("dw", "conv_dw")
                bn(f"{dst}_dw_bn", f"{src}.bn1")
                se()
                conv("pw", "conv_pw")
                bn(f"{dst}_pw_bn", f"{src}.bn2")
            elif t == "ir":
                conv("pw_exp", "conv_pw")
                bn(f"{dst}_pw_exp_bn", f"{src}.bn1")
                conv("dw", "conv_dw")
                bn(f"{dst}_dw_bn", f"{src}.bn2")
                se()
                conv("pw_proj", "conv_pwl")
                bn(f"{dst}_pw_proj_bn", f"{src}.bn3")
            elif t == "er":
                conv("conv_exp", "conv_exp")
                bn(f"{dst}_conv_exp_bn", f"{src}.bn1")
                se()
                conv("pw_proj", "conv_pwl")
                bn(f"{dst}_pw_proj_bn", f"{src}.bn2")
    return params, stats


# -------------------------------------------------------- resnetv2 / BiT


def convert_resnetv2(sd: Dict[str, np.ndarray], variant: str,
                     prefix: str = ""):
    """timm ResNetV2/BiT state_dict -> (params, batch_stats) for
    models.resnetv2.ResNetV2.

    timm naming: ``stem.conv``; ``stages.{i}.blocks.{j}`` with
    norm1/conv1/norm2/conv2/norm3/conv3 (pre-act order: norm1 activates the
    block input) and ``downsample.conv``; trailing ``norm``. Weight-
    standardized convs store the raw kernel (standardization happens at
    forward in both frameworks), so kernels copy straight through. BN
    variants put running stats in batch_stats; GN/EvoNorm variants are
    parameter-only.
    """
    from sfmnext_tpu.models.resnetv2 import resnetv2_cfg

    depths, _, norm, _, stem = resnetv2_cfg(variant)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def norm_mod(dst_p, dst_s, name, src):
        if norm == "bn":
            p, s = _bn(sd, prefix + src)
            dst_p[name] = {"norm": {"BatchNorm_0": p}}
            dst_s[name] = {"norm": {"BatchNorm_0": s}}
        else:  # gn: weight/bias -> scale/bias, no stats
            dst_p[name] = {"norm": {
                "scale": np.asarray(sd[prefix + src + ".weight"]),
                "bias": np.asarray(sd[prefix + src + ".bias"]),
            }}

    def conv(dst, src):
        params[dst] = {"kernel": _conv_w(sd[prefix + src + ".weight"])}

    if stem == "deep":
        for i in range(3):
            conv(f"stem{i}", f"stem.conv{i + 1}")
    else:
        conv("stem", "stem.conv")

    for si, d in enumerate(depths):
        for bi in range(d):
            src = f"stages.{si}.blocks.{bi}"
            dst = f"stage{si}_block{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}

            def bconv(name, member, bp=bp, src=src):
                bp[name] = {
                    "kernel": _conv_w(sd[f"{prefix}{src}.{member}.weight"])
                }

            norm_mod(bp, bs, "preact", f"{src}.norm1")
            bconv("conv1", "conv1")
            norm_mod(bp, bs, "na1", f"{src}.norm2")
            bconv("conv2", "conv2")
            norm_mod(bp, bs, "na2", f"{src}.norm3")
            bconv("conv3", "conv3")
            if f"{prefix}{src}.downsample.conv.weight" in sd:
                bconv("down_conv", "downsample.conv")
            params[dst] = bp
            if bs:
                stats[dst] = bs
    norm_mod(params, stats, "norm", "norm")
    return params, stats


# ------------------------------------------------------------------ nfnet


def convert_nfnet(sd: Dict[str, np.ndarray], variant: str,
                  prefix: str = ""):
    """timm NFNet state_dict -> params for models.nfnet.NFNet.

    timm naming (timm/models/nfnet.py): ``stem.conv1..conv4`` scaled-std
    convs (weight / gain / bias); ``stages.{i}.{j}`` blocks with
    conv1/conv2/conv2b/conv3, ``attn_last.fc1/fc2`` SE, ``downsample.conv``
    and ``skipinit_gain``. Normalizer-free: no batch stats anywhere.
    """
    from sfmnext_tpu.models.nfnet import NFNET_SPECS

    depths = NFNET_SPECS[variant][0]
    dbl = NFNET_SPECS[variant][3]
    params: Dict[str, Any] = {}

    def std_conv(dst, src):
        params_dst = {
            "kernel": _conv_w(sd[f"{prefix}{src}.weight"]),
            "gain": np.asarray(sd[f"{prefix}{src}.gain"]).reshape(-1),
            "bias": np.asarray(sd[f"{prefix}{src}.bias"]).reshape(-1),
        }
        return params_dst

    for i in range(4):
        params[f"stem{i}"] = std_conv(f"stem{i}", f"stem.conv{i + 1}")

    for si, d in enumerate(depths):
        for bi in range(d):
            src = f"stages.{si}.{bi}"
            dst = f"s{si}_b{bi}"
            bp: Dict[str, Any] = {}
            for c in ("conv1", "conv2", "conv3") + (
                ("conv2b",) if dbl else ()
            ):
                bp[c] = std_conv(c, f"{src}.{c}")
            if f"{prefix}{src}.downsample.conv.weight" in sd:
                bp["down"] = std_conv("down", f"{src}.downsample.conv")
            if f"{prefix}{src}.attn_last.fc1.weight" in sd:
                bp["se_fc1"] = _conv_pb(sd, f"{prefix}{src}.attn_last.fc1")
                bp["se_fc2"] = _conv_pb(sd, f"{prefix}{src}.attn_last.fc2")
            bp["skipinit_gain"] = np.asarray(
                sd[f"{prefix}{src}.skipinit_gain"]
            ).reshape(())
            params[dst] = bp
    return params


# -------------------------------------------------------------------- dpn


def convert_dpn(sd: Dict[str, np.ndarray], variant: str, prefix: str = ""):
    """timm DPN state_dict -> (params, batch_stats) for models.dpn.DPN.

    timm naming (timm/models/dpn.py): ``features.conv1_1.conv/.bn`` stem;
    blocks ``features.conv{stage+2}_{idx+1}`` with pre-act BnActConv2d
    members ``c1x1_w_s1``/``c1x1_w_s2`` (proj/down), ``c1x1_a``,
    ``c3x3_b`` and either ``c1x1_c`` or (b-flavor) ``c1x1_c1``/``c1x1_c2``
    (each ``.bn`` + ``.conv``); trailing ``features.conv5_bn_ac.bn``.
    """
    from sfmnext_tpu.models.dpn import DPN_SPECS

    k_sec, b = DPN_SPECS[variant][4], DPN_SPECS[variant][6]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem_conv"] = {
        "kernel": _conv_w(sd[prefix + "features.conv1_1.conv.weight"])
    }
    p, s = _bn(sd, prefix + "features.conv1_1.bn")
    params["stem_bn"] = {"BatchNorm_0": p}
    stats["stem_bn"] = {"BatchNorm_0": s}

    for si, n in enumerate(k_sec):
        for bi in range(n):
            src = f"features.conv{si + 2}_{bi + 1}"
            dst = f"stage{si}_block{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}

            def bac(name, member, bp=bp, bs=bs, src=src):
                p_, s_ = _bn(sd, f"{prefix}{src}.{member}.bn")
                bp[f"{name}_bn"] = {"BatchNorm_0": p_}
                bs[f"{name}_bn"] = {"BatchNorm_0": s_}
                bp[f"{name}_conv"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.{member}.conv.weight"])}

            for member in ("c1x1_w_s1", "c1x1_w_s2"):
                if f"{prefix}{src}.{member}.conv.weight" in sd:
                    bac("w", member)
            bac("a", "c1x1_a")
            bac("b", "c3x3_b")
            if b:
                p_, s_ = _bn(sd, f"{prefix}{src}.c1x1_c.bn")
                bp["c_bn"] = {"BatchNorm_0": p_}
                bs["c_bn"] = {"BatchNorm_0": s_}
                bp["c1_conv"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.c1x1_c1.conv.weight"])}
                bp["c2_conv"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.c1x1_c2.conv.weight"])}
            else:
                bac("c", "c1x1_c")
            params[dst] = bp
            stats[dst] = bs

    p, s = _bn(sd, prefix + "features.conv5_bn_ac.bn")
    params["norm"] = {"BatchNorm_0": p}
    stats["norm"] = {"BatchNorm_0": s}
    return params, stats


# ----------------------------------------------------------------- resnest


def convert_resnest(sd: Dict[str, np.ndarray], variant: str,
                    prefix: str = ""):
    """timm ResNeSt state_dict -> (params, batch_stats) for
    models.resnest.ResNeSt.

    timm naming: deep stem ``conv1.{0,3,6}`` + ``conv1.{1,4}``/``bn1``
    BNs; blocks ``layer{X}.{Y}`` with conv1/bn1, the split-attention
    ``conv2`` (``conv2.conv``/``conv2.bn0``/``conv2.fc1``/``conv2.bn1``/
    ``conv2.fc2``), conv3/bn3 and avg-down ``downsample.{1,2}``.

    Fidelity: for cardinality == 1 (all six mainline resnest models) the
    attention-channel layout matches timm exactly. The two
    radix/cardinality ablations (1s4x24d / 4s2x40d) use radix-major
    r-softmax grouping where timm's rSoftMax is cardinality-major — a
    fixed channel permutation of fc2; converted ablation checkpoints
    would need that permutation applied.
    """
    from sfmnext_tpu.models.resnest import RESNEST_SPECS

    depths = RESNEST_SPECS[variant][0]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_pair(dst_p, dst_s, name, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    for i, (cw, bn_src) in enumerate(
        (("conv1.0", "conv1.1"), ("conv1.3", "conv1.4"), ("conv1.6", "bn1"))
    ):
        params[f"conv1_{i}"] = {"kernel": _conv_w(sd[f"{prefix}{cw}.weight"])}
        bn_pair(params, stats, f"bn1_{i}", bn_src)

    for stage, n in enumerate(depths):
        for bi in range(n):
            src = f"layer{stage + 1}.{bi}"
            dst = f"layer{stage + 1}_{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["conv1"] = {"kernel": _conv_w(sd[f"{prefix}{src}.conv1.weight"])}
            bn_pair(bp, bs, "bn1", f"{src}.bn1")
            sa_p: Dict[str, Any] = {
                "conv": {"kernel": _conv_w(
                    sd[f"{prefix}{src}.conv2.conv.weight"])},
                "fc1": {"kernel": _conv_w(
                    sd[f"{prefix}{src}.conv2.fc1.weight"])},
                "fc2": _conv_pb(sd, f"{prefix}{src}.conv2.fc2"),
            }
            sa_s: Dict[str, Any] = {}
            p, s = _bn(sd, f"{prefix}{src}.conv2.bn0")
            sa_p["bn0"] = {"BatchNorm_0": p}
            sa_s["bn0"] = {"BatchNorm_0": s}
            p, s = _bn(sd, f"{prefix}{src}.conv2.bn1")
            sa_p["bn1"] = {"BatchNorm_0": p}
            sa_s["bn1"] = {"BatchNorm_0": s}
            if f"{prefix}{src}.conv2.fc1.bias" in sd:
                sa_p["fc1"]["bias"] = np.asarray(
                    sd[f"{prefix}{src}.conv2.fc1.bias"])
            bp["conv2"] = sa_p
            bs["conv2"] = sa_s
            bp["conv3"] = {"kernel": _conv_w(sd[f"{prefix}{src}.conv3.weight"])}
            bn_pair(bp, bs, "bn3", f"{src}.bn3")
            if f"{prefix}{src}.downsample.1.weight" in sd:
                bp["down_conv"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.downsample.1.weight"])}
                bn_pair(bp, bs, "down_bn", f"{src}.downsample.2")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


# -------------------------------------------------------------------- hrnet


def convert_hrnet(sd: Dict[str, np.ndarray], variant: str,
                  prefix: str = ""):
    """timm/official HRNet state_dict -> (params, batch_stats) for
    models.hrnet.HRNet (features flavor with incre modules).

    Official naming: ``conv1/bn1/conv2/bn2`` stem; ``layer1.{i}``
    bottlenecks; ``transition{t}.{b}`` Sequentials (new branches are
    doubly nested); ``stage{s}.{m}.branches.{b}.{i}`` basic blocks and
    ``stage{s}.{m}.fuse_layers.{i}.{j}[.{k}]`` fusion convs;
    ``incre_modules.{b}.0`` bottleneck feature heads.
    """
    from sfmnext_tpu.models.hrnet import HRNET_SPECS

    (n1, _), *stages = HRNET_SPECS[variant]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_pair(dst_p, dst_s, name, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    def conv(dst_p, name, src):
        dst_p[name] = {"kernel": _conv_w(sd[f"{prefix}{src}.weight"])}

    for i in (1, 2):
        conv(params, f"stem{i}", f"conv{i}")
        bn_pair(params, stats, f"stem{i}_bn", f"bn{i}")

    def bottleneck(dst, src):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for c in (1, 2, 3):
            conv(bp, f"conv{c}", f"{src}.conv{c}")
            bn_pair(bp, bs, f"bn{c}", f"{src}.bn{c}")
        if f"{prefix}{src}.downsample.0.weight" in sd:
            conv(bp, "down_conv", f"{src}.downsample.0")
            bn_pair(bp, bs, "down_bn", f"{src}.downsample.1")
        params[dst] = bp
        stats[dst] = bs

    for bi in range(n1):
        bottleneck(f"layer1_{bi}", f"layer1.{bi}")

    for si, (n_mod, n_blk, _w) in enumerate(stages):
        n_br = si + 2
        # transition: existing branches (single Sequential) + new branch
        # (doubly nested Sequential)
        for b in range(n_br):
            single = f"transition{si + 1}.{b}.0.weight"
            nested = f"transition{si + 1}.{b}.0.0.weight"
            if prefix + single in sd:
                conv(params, f"t{si}_b{b}", f"transition{si + 1}.{b}.0")
                bn_pair(params, stats, f"t{si}_b{b}_bn",
                        f"transition{si + 1}.{b}.1")
            elif prefix + nested in sd:
                conv(params, f"t{si}_b{b}", f"transition{si + 1}.{b}.0.0")
                bn_pair(params, stats, f"t{si}_b{b}_bn",
                        f"transition{si + 1}.{b}.0.1")
        for mi in range(n_mod):
            src_m = f"stage{si + 2}.{mi}"
            for b in range(n_br):
                for blk in range(n_blk):
                    bp: Dict[str, Any] = {}
                    bs: Dict[str, Any] = {}
                    for c in (1, 2):
                        conv(bp, f"conv{c}",
                             f"{src_m}.branches.{b}.{blk}.conv{c}")
                        bn_pair(bp, bs, f"bn{c}",
                                f"{src_m}.branches.{b}.{blk}.bn{c}")
                    params[f"s{si}_m{mi}_b{b}_{blk}"] = bp
                    stats[f"s{si}_m{mi}_b{b}_{blk}"] = bs
            fp: Dict[str, Any] = {}
            fs: Dict[str, Any] = {}
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        conv(fp, f"up{i}_{j}",
                             f"{src_m}.fuse_layers.{i}.{j}.0")
                        bn_pair(fp, fs, f"up{i}_{j}_bn",
                                f"{src_m}.fuse_layers.{i}.{j}.1")
                    elif j < i:
                        for k in range(i - j):
                            conv(fp, f"down{i}_{j}_{k}",
                                 f"{src_m}.fuse_layers.{i}.{j}.{k}.0")
                            bn_pair(fp, fs, f"down{i}_{j}_{k}_bn",
                                    f"{src_m}.fuse_layers.{i}.{j}.{k}.1")
            params[f"s{si}_m{mi}_fuse"] = fp
            stats[f"s{si}_m{mi}_fuse"] = fs

    for b in range(4):
        bottleneck(f"incre{b}", f"incre_modules.{b}.0")
    return params, stats


# ------------------------------------------------------------------ vovnet


def convert_vovnet(sd: Dict[str, np.ndarray], variant: str,
                   prefix: str = ""):
    """timm VoVNet state_dict -> (params, batch_stats) for
    models.vovnet.VoVNet.

    timm naming (timm/models/vovnet.py): ``stem.{0,1,2}`` ConvNormAct
    (.conv/.bn; the dw stem's third entry is SeparableConvNormAct with
    .conv_dw/.conv_pw); ``stages.{i}.blocks.{j}`` OSA blocks with
    ``conv_reduction`` (dw flavor, when in != mid), ``conv_mid.{k}``,
    ``conv_concat`` and the eSE ``attn.fc``.
    """
    from sfmnext_tpu.models.vovnet import VOVNET_SPECS

    (_, _, _, n_layers, n_blocks, _, depthwise) = VOVNET_SPECS[variant]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_pair(dst_p, dst_s, name, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    for i in range(3):
        if depthwise and i == 2:
            params["stem2_dw"] = {"kernel": _conv_w(
                sd[f"{prefix}stem.2.conv_dw.weight"])}
            params["stem2_pw"] = {"kernel": _conv_w(
                sd[f"{prefix}stem.2.conv_pw.weight"])}
        else:
            params[f"stem{i}"] = {"kernel": _conv_w(
                sd[f"{prefix}stem.{i}.conv.weight"])}
        bn_pair(params, stats, f"stem{i}_bn", f"stem.{i}.bn")

    for si in range(4):
        for bi in range(n_blocks[si]):
            src = f"stages.{si}.blocks.{bi}"
            dst = f"stage{si}_block{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if f"{prefix}{src}.conv_reduction.conv.weight" in sd:
                bp["reduce_conv"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.conv_reduction.conv.weight"])}
                bn_pair(bp, bs, "reduce_bn", f"{src}.conv_reduction.bn")
            for k in range(n_layers):
                if depthwise:
                    bp[f"l{k}_dw"] = {"kernel": _conv_w(
                        sd[f"{prefix}{src}.conv_mid.{k}.conv_dw.weight"])}
                    bp[f"l{k}_pw_conv"] = {"kernel": _conv_w(
                        sd[f"{prefix}{src}.conv_mid.{k}.conv_pw.weight"])}
                    bn_pair(bp, bs, f"l{k}_pw_bn", f"{src}.conv_mid.{k}.bn")
                else:
                    bp[f"l{k}_conv"] = {"kernel": _conv_w(
                        sd[f"{prefix}{src}.conv_mid.{k}.conv.weight"])}
                    bn_pair(bp, bs, f"l{k}_bn", f"{src}.conv_mid.{k}.bn")
            bp["concat_conv"] = {"kernel": _conv_w(
                sd[f"{prefix}{src}.conv_concat.conv.weight"])}
            bn_pair(bp, bs, "concat_bn", f"{src}.conv_concat.bn")
            bp["ese_fc"] = _conv_pb(sd, f"{prefix}{src}.attn.fc")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


# ------------------------------------------------------------------ repvgg


def convert_repvgg(sd: Dict[str, np.ndarray], variant: str,
                   prefix: str = ""):
    """timm RepVGG (byobnet, training-form) state_dict -> (params,
    batch_stats) for models.repvgg.RepVGG.

    timm naming: ``stem`` and ``stages.{s}.{b}`` RepVggBlocks with
    ``conv_kxk`` / ``conv_1x1`` ConvNormAct members (.conv/.bn) and the
    ``identity`` BatchNormAct2d on shape-preserving blocks.
    """
    from sfmnext_tpu.models.repvgg import REPVGG_SPECS

    depths = REPVGG_SPECS[variant][2]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def block(dst, src):
        # RepVGGBlock uses raw nn.BatchNorm modules (no wrapper nesting)
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        bp["conv3"] = {"kernel": _conv_w(
            sd[f"{prefix}{src}.conv_kxk.conv.weight"])}
        bp["bn3"], bs["bn3"] = _bn(sd, f"{prefix}{src}.conv_kxk.bn")
        bp["conv1"] = {"kernel": _conv_w(
            sd[f"{prefix}{src}.conv_1x1.conv.weight"])}
        bp["bn1"], bs["bn1"] = _bn(sd, f"{prefix}{src}.conv_1x1.bn")
        if f"{prefix}{src}.identity.running_mean" in sd:
            bp["bn_id"], bs["bn_id"] = _bn(sd, f"{prefix}{src}.identity")
        params[dst] = bp
        stats[dst] = bs

    block("stem", "stem")
    for si, d in enumerate(depths):
        for bi in range(d):
            block(f"stage{si}_block{bi}", f"stages.{si}.{bi}")
    return params, stats


# ---------------------------------------------------------------- ghostnet


def convert_ghostnet(sd: Dict[str, np.ndarray], variant: str = "ghostnet_100",
                     prefix: str = ""):
    """timm GhostNet state_dict -> (params, batch_stats) for
    models.ghostnet.GhostNet.

    timm naming (timm/models/ghostnet.py): ``conv_stem``/``bn1`` stem;
    ``blocks.{stage}.{j}`` GhostBottlenecks — ``ghost{1,2}`` modules are
    ``primary_conv.{0,1}`` + ``cheap_operation.{0,1}`` Sequentials, stride
    blocks carry ``conv_dw``/``bn_dw``, SE is the efficientnet-style
    ``se.conv_reduce/conv_expand`` (hard-sigmoid gate), and the projection
    shortcut is the 4-entry ``shortcut`` Sequential (dw conv, bn, pw conv,
    bn); the 1x1 head is the ConvBnAct at ``blocks.9.0`` (.conv/.bn1).
    """
    del variant  # key-driven; widths come from the checkpoint shapes
    stage_sizes = (1, 1, 1, 1, 1, 1, 5, 1, 4)

    def bn_pair(dst_p, dst_s, name, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name] = {"BatchNorm_0": p}
        dst_s[name] = {"BatchNorm_0": s}

    params: Dict[str, Any] = {
        "stem": {"kernel": _conv_w(sd[prefix + "conv_stem.weight"])}
    }
    stats: Dict[str, Any] = {}
    bn_pair(params, stats, "stem_bn", "bn1")
    i = 0
    for st, n in enumerate(stage_sizes):
        for j in range(n):
            src = f"blocks.{st}.{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for g in ("ghost1", "ghost2"):
                gp: Dict[str, Any] = {}
                gs: Dict[str, Any] = {}
                gp["primary"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.{g}.primary_conv.0.weight"])}
                bn_pair(gp, gs, "bn1", f"{src}.{g}.primary_conv.1")
                gp["cheap"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.{g}.cheap_operation.0.weight"])}
                bn_pair(gp, gs, "bn2", f"{src}.{g}.cheap_operation.1")
                bp[g], bs[g] = gp, gs
            if f"{prefix}{src}.conv_dw.weight" in sd:
                bp["dw"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.conv_dw.weight"])}
                bn_pair(bp, bs, "dw_bn", f"{src}.bn_dw")
            if f"{prefix}{src}.se.conv_reduce.weight" in sd:
                bp["se_reduce"] = _conv_pb(sd, f"{prefix}{src}.se.conv_reduce")
                bp["se_expand"] = _conv_pb(sd, f"{prefix}{src}.se.conv_expand")
            if f"{prefix}{src}.shortcut.0.weight" in sd:
                bp["short_dw"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.shortcut.0.weight"])}
                bn_pair(bp, bs, "short_dw_bn", f"{src}.shortcut.1")
                bp["short_pw"] = {"kernel": _conv_w(
                    sd[f"{prefix}{src}.shortcut.2.weight"])}
                bn_pair(bp, bs, "short_pw_bn", f"{src}.shortcut.3")
            params[f"block{i}"], stats[f"block{i}"] = bp, bs
            i += 1
    params["head"] = {"kernel": _conv_w(sd[prefix + "blocks.9.0.conv.weight"])}
    bn_pair(params, stats, "head_bn", "blocks.9.0.bn1")
    return params, stats


# ------------------------------------------------------------------ rexnet


def convert_rexnet(sd: Dict[str, np.ndarray], variant: str = "rexnet_100",
                   prefix: str = ""):
    """timm ReXNet state_dict -> (params, batch_stats) for
    models.rexnet.ReXNet.

    timm naming (timm/models/rexnet.py): ``stem`` ConvNormAct (.conv/.bn);
    ``features.{i}`` LinearBottlenecks with ConvNormAct ``conv_exp`` /
    ``conv_dw`` / ``conv_pwl`` and the SEWithNorm ``se`` (fc1 -> bn -> fc2,
    1x1 convs with bias). Our ReXNet uses raw nn.BatchNorm (flat
    scale/bias), so no BatchNorm_0 nesting here.
    """
    del variant
    params: Dict[str, Any] = {
        "stem_conv": {"kernel": _conv_w(sd[prefix + "stem.conv.weight"])}
    }
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, prefix + "stem.bn")
    i = 0
    while f"{prefix}features.{i}.conv_dw.conv.weight" in sd:
        src = f"features.{i}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        if f"{prefix}{src}.conv_exp.conv.weight" in sd:
            bp["conv_exp"] = {"kernel": _conv_w(
                sd[f"{prefix}{src}.conv_exp.conv.weight"])}
            bp["bn_exp"], bs["bn_exp"] = _bn(sd, f"{prefix}{src}.conv_exp.bn")
        bp["conv_dw"] = {"kernel": _conv_w(
            sd[f"{prefix}{src}.conv_dw.conv.weight"])}
        bp["bn_dw"], bs["bn_dw"] = _bn(sd, f"{prefix}{src}.conv_dw.bn")
        if f"{prefix}{src}.se.fc1.weight" in sd:
            bp["se_reduce"] = _conv_pb(sd, f"{prefix}{src}.se.fc1")
            bp["se_bn"], bs["se_bn"] = _bn(sd, f"{prefix}{src}.se.bn")
            bp["se_expand"] = _conv_pb(sd, f"{prefix}{src}.se.fc2")
        bp["conv_pwl"] = {"kernel": _conv_w(
            sd[f"{prefix}{src}.conv_pwl.conv.weight"])}
        bp["bn_pwl"], bs["bn_pwl"] = _bn(sd, f"{prefix}{src}.conv_pwl.bn")
        params[f"block{i}"], stats[f"block{i}"] = bp, bs
        i += 1
    if i == 0:
        raise KeyError(f"no ReXNet blocks found under prefix {prefix!r}")
    return params, stats


# --------------------------------------------------------------- xception


def convert_xception(sd: Dict[str, np.ndarray], variant: str,
                     prefix: str = ""):
    """timm aligned-Xception state_dict -> (params, batch_stats) for
    models.xception.Xception (standard xception41/65/71 only).

    timm naming (timm/models/xception_aligned.py): ``stem.{0,1}``
    ConvNormAct (.conv/.bn); ``blocks.{i}`` XceptionModules with the
    ``shortcut`` ConvNormAct and ``stack.conv{1..3}`` SeparableConv2d
    members (.conv_dw/.bn_dw/.conv_pw/.bn_pw). Preact 'p' variants are
    Tier 2 (no published reference config uses them) and refuse here.
    """
    from sfmnext_tpu.models.xception import XCEPTION_SPECS

    if variant.endswith("p"):
        raise NotImplementedError(
            f"{variant}: preact xception converter not implemented "
            "(Tier 2, docs/backbone_fidelity.md)"
        )
    name = "xception65" if variant == "gluon_xception65" else variant
    entry, middle = XCEPTION_SPECS[name]
    n_blocks = len(entry) + middle + 2

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_pair(dst_p, dst_s, name_, src):
        p, s = _bn(sd, prefix + src)
        dst_p[name_] = {"BatchNorm_0": p}
        dst_s[name_] = {"BatchNorm_0": s}

    for i in range(2):
        params[f"stem{i}"] = {"kernel": _conv_w(
            sd[f"{prefix}stem.{i}.conv.weight"])}
        bn_pair(params, stats, f"stem{i}_bn", f"stem.{i}.bn")

    for bi in range(n_blocks):
        src = f"blocks.{bi}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        if f"{prefix}{src}.shortcut.conv.weight" in sd:
            bp["down_conv"] = {"kernel": _conv_w(
                sd[f"{prefix}{src}.shortcut.conv.weight"])}
            bn_pair(bp, bs, "down_bn", f"{src}.shortcut.bn")
        for j in range(3):
            sp: Dict[str, Any] = {}
            ss: Dict[str, Any] = {}
            sp["conv_dw"] = {"kernel": _conv_w(
                sd[f"{prefix}{src}.stack.conv{j + 1}.conv_dw.weight"])}
            bn_pair(sp, ss, "bn_dw", f"{src}.stack.conv{j + 1}.bn_dw")
            sp["conv_pw"] = {"kernel": _conv_w(
                sd[f"{prefix}{src}.stack.conv{j + 1}.conv_pw.weight"])}
            bn_pair(sp, ss, "bn_pw", f"{src}.stack.conv{j + 1}.bn_pw")
            bp[f"sep{j}"] = sp
            bs[f"sep{j}"] = ss
        params[f"block{bi}"] = bp
        stats[f"block{bi}"] = bs
    return params, stats
