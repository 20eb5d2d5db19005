"""Export our Flax trees to reference-style torch ``.pth`` checkpoints.

Inverse of :mod:`sfmnext_tpu.utils.torch_port` — lets models trained here
be evaluated by the reference (and mirrors finetune/ckpt_to_pth.py:11-37,
which converts finetune checkpoints back to monodepth2-style per-module
pth files with embedded height/width/use_stereo).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _conv_w(k) -> "np.ndarray":
    return np.transpose(np.asarray(k), (3, 2, 0, 1))  # HWIO -> OIHW


def _lin_w(k) -> "np.ndarray":
    return np.transpose(np.asarray(k), (1, 0))


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def export_resnet_encoder_decoder(params, batch_stats) -> Dict[str, np.ndarray]:
    """Our combined tree -> reference ResnetEncoderDecoder state_dict keys."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(dst, node):
        sd[dst + ".weight"] = _conv_w(node["kernel"])
        if "bias" in node:
            sd[dst + ".bias"] = np.asarray(node["bias"])

    def put_bn(dst, pnode, snode):
        sd[dst + ".weight"] = np.asarray(pnode["scale"])
        sd[dst + ".bias"] = np.asarray(pnode["bias"])
        sd[dst + ".running_mean"] = np.asarray(snode["mean"])
        sd[dst + ".running_var"] = np.asarray(snode["var"])

    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    put_conv("encoder.encoder.conv1", enc_p["conv1"])
    put_bn("encoder.encoder.bn1", enc_p["bn1"]["BatchNorm_0"],
           enc_s["bn1"]["BatchNorm_0"])
    for name, blk in enc_p.items():
        if not name.startswith("layer"):
            continue
        stage, idx = name.replace("layer", "").split("_")
        dst = f"encoder.encoder.layer{stage}.{idx}"
        for c in ("conv1", "conv2", "conv3"):
            if c in blk:
                put_conv(f"{dst}.{c}", blk[c])
        for b in ("bn1", "bn2", "bn3"):
            if b in blk:
                put_bn(f"{dst}.{b}", blk[b]["BatchNorm_0"],
                       enc_s[name][b]["BatchNorm_0"])
        if "down_conv" in blk:
            put_conv(f"{dst}.downsample.0", blk["down_conv"])
            put_bn(f"{dst}.downsample.1", blk["down_bn"]["BatchNorm_0"],
                   enc_s[name]["down_bn"]["BatchNorm_0"])

    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    put_conv("decoder.conv2", dec_p["conv2"]["Conv_0"])
    put_conv("decoder.conv3", dec_p["conv3"]["Conv_0"])
    for u in range(1, 5):
        up_p, up_s = dec_p[f"up{u}"], dec_s[f"up{u}"]
        put_conv(f"decoder.up{u}._net.0", up_p["conv_a"]["Conv_0"])
        put_bn(f"decoder.up{u}._net.1", up_p["bn_a"]["BatchNorm_0"],
               up_s["bn_a"]["BatchNorm_0"])
        put_conv(f"decoder.up{u}._net.3", up_p["conv_b"]["Conv_0"])
        put_bn(f"decoder.up{u}._net.4", up_p["bn_b"]["BatchNorm_0"],
               up_s["bn_b"]["BatchNorm_0"])
    return sd


def _put_conv(sd, dst, node):
    sd[dst + ".weight"] = _conv_w(node["kernel"])
    if "bias" in node:
        sd[dst + ".bias"] = np.asarray(node["bias"])


def _put_bn(sd, dst, pnode, snode):
    sd[dst + ".weight"] = np.asarray(pnode["scale"])
    sd[dst + ".bias"] = np.asarray(pnode["bias"])
    sd[dst + ".running_mean"] = np.asarray(snode["mean"])
    sd[dst + ".running_var"] = np.asarray(snode["var"])


def _put_ln(sd, dst, node):
    sd[dst + ".weight"] = np.asarray(node["scale"])
    sd[dst + ".bias"] = np.asarray(node["bias"])


def export_efficientnet_b5(params, batch_stats,
                           prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of torch_port.convert_efficientnet_b5 (gen-efficientnet keys)."""
    from sfmnext_tpu.models.efficientnet import B5_STAGES as cfg

    sd: Dict[str, np.ndarray] = {}
    _put_conv(sd, prefix + "conv_stem", params["conv_stem"])
    _put_bn(sd, prefix + "bn1", params["bn1"]["BatchNorm_0"],
            batch_stats["bn1"]["BatchNorm_0"])
    for si in range(7):
        expand = cfg["expand"][si]
        for bi in range(cfg["repeats"][si]):
            p = params[f"stage{si}_block{bi}"]
            s = batch_stats[f"stage{si}_block{bi}"]
            dst = f"{prefix}blocks.{si}.{bi}"
            if expand == 1:
                names = [("conv_dw", "dw_conv", "bn1", "dw_bn"),
                         ("conv_pw", "project_conv", "bn2", "project_bn")]
            else:
                names = [("conv_pw", "expand_conv", "bn1", "expand_bn"),
                         ("conv_dw", "dw_conv", "bn2", "dw_bn"),
                         ("conv_pwl", "project_conv", "bn3", "project_bn")]
            for t_conv, f_conv, t_bn, f_bn in names:
                _put_conv(sd, f"{dst}.{t_conv}", p[f_conv])
                _put_bn(sd, f"{dst}.{t_bn}", p[f_bn]["BatchNorm_0"],
                        s[f_bn]["BatchNorm_0"])
            _put_conv(sd, f"{dst}.se.conv_reduce", p["se_reduce"])
            _put_conv(sd, f"{dst}.se.conv_expand", p["se_expand"])
    _put_conv(sd, prefix + "conv_head", params["conv_head"])
    return sd


def export_base_encoder_decoder(params, batch_stats) -> Dict[str, np.ndarray]:
    """Inverse of torch_port.convert_base_encoder_decoder (eff_b5 encoder.pth)."""
    sd = export_efficientnet_b5(
        params["encoder"], batch_stats["encoder"],
        prefix="encoder.original_model.",
    )
    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    _put_conv(sd, "decoder.conv2", dec_p["conv2"]["Conv_0"])
    _put_conv(sd, "decoder.conv3", dec_p["conv3"]["Conv_0"])
    for u in range(1, 5):
        up_p, up_s = dec_p[f"up{u}"], dec_s[f"up{u}"]
        _put_conv(sd, f"decoder.up{u}._net.0", up_p["conv_a"]["Conv_0"])
        _put_bn(sd, f"decoder.up{u}._net.1", up_p["bn_a"]["BatchNorm_0"],
                up_s["bn_a"]["BatchNorm_0"])
        _put_conv(sd, f"decoder.up{u}._net.3", up_p["conv_b"]["Conv_0"])
        _put_bn(sd, f"decoder.up{u}._net.4", up_p["bn_b"]["BatchNorm_0"],
                up_s["bn_b"]["BatchNorm_0"])
    return sd


def export_convnext_unet(params, batch_stats, backbone: str) -> Dict[str, np.ndarray]:
    """Inverse of torch_port.convert_convnext_unet (timm convnext + UnetDecoder)."""
    from sfmnext_tpu.models.convnext import convnext_cfg

    depths, _ = convnext_cfg(backbone)
    sd: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    _put_conv(sd, "encoder.stem.0", enc["stem_conv"])
    _put_ln(sd, "encoder.stem.1", enc["stem_norm"])
    for si, depth in enumerate(depths):
        if si > 0:
            _put_ln(sd, f"encoder.stages.{si}.downsample.0",
                    enc[f"down{si}_norm"])
            _put_conv(sd, f"encoder.stages.{si}.downsample.1",
                      enc[f"down{si}_conv"])
        for bi in range(depth):
            blk = enc[f"stage{si}_block{bi}"]
            dst = f"encoder.stages.{si}.blocks.{bi}"
            _put_conv(sd, f"{dst}.dwconv", blk["dwconv"])
            _put_ln(sd, f"{dst}.norm", blk["norm"])
            for pw in ("pwconv1", "pwconv2"):
                sd[f"{dst}.{pw}.weight"] = _lin_w(blk[pw]["kernel"])
                sd[f"{dst}.{pw}.bias"] = np.asarray(blk[pw]["bias"])
            sd[f"{dst}.gamma"] = np.asarray(blk["gamma"])

    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    for i in range(4):
        for c in (1, 2):
            node = dec_p[f"block{i}"][f"conv{c}"]
            dst = f"decoder.blocks.{i}.conv{c}"
            _put_conv(sd, f"{dst}.conv", node["conv"])
            _put_bn(sd, f"{dst}.bn", node["bn"]["BatchNorm_0"],
                    dec_s[f"block{i}"][f"conv{c}"]["bn"]["BatchNorm_0"])
    _put_conv(sd, "decoder.final_conv", dec_p["final_conv"])
    return sd


def export_sql_decoder(params, num_heads: int = 4) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd["embedding_convPxP.weight"] = _conv_w(
        params["embedding_convPxP"]["Conv_0"]["kernel"]
    )
    sd["embedding_convPxP.bias"] = np.asarray(
        params["embedding_convPxP"]["Conv_0"]["bias"]
    )
    sd["positional_encodings"] = np.asarray(params["positional_encodings"])
    sd["conv3x3.weight"] = _conv_w(params["conv3x3"]["Conv_0"]["kernel"])
    sd["conv3x3.bias"] = np.asarray(params["conv3x3"]["Conv_0"]["bias"])

    for i in range(4):
        lp = params[f"tf_layer{i}"]
        dst = f"transformer_encoder.layers.{i}"
        attn = lp["self_attn"]
        e = attn["query"]["kernel"].shape[0]

        def unproj(node):
            w = np.asarray(node["kernel"]).reshape(e, e)  # [E_in, E_out]
            b = np.asarray(node["bias"]).reshape(e)
            return np.transpose(w, (1, 0)), b

        qw, qb = unproj(attn["query"])
        kw, kb = unproj(attn["key"])
        vw, vb = unproj(attn["value"])
        sd[f"{dst}.self_attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
        sd[f"{dst}.self_attn.in_proj_bias"] = np.concatenate([qb, kb, vb], 0)
        ow = np.asarray(attn["out"]["kernel"]).reshape(e, e)
        sd[f"{dst}.self_attn.out_proj.weight"] = np.transpose(ow, (1, 0))
        sd[f"{dst}.self_attn.out_proj.bias"] = np.asarray(attn["out"]["bias"])
        for tname, fname in (("linear1", "linear1"), ("linear2", "linear2")):
            sd[f"{dst}.{tname}.weight"] = _lin_w(lp[fname]["Dense_0"]["kernel"])
            sd[f"{dst}.{tname}.bias"] = np.asarray(lp[fname]["Dense_0"]["bias"])
        for norm in ("norm1", "norm2"):
            sd[f"{dst}.{norm}.weight"] = np.asarray(lp[norm]["scale"])
            sd[f"{dst}.{norm}.bias"] = np.asarray(lp[norm]["bias"])

    for j, name in ((0, "bins_reg1"), (2, "bins_reg2"), (4, "bins_reg3")):
        sd[f"bins_regressor.{j}.weight"] = _lin_w(
            params[name]["Dense_0"]["kernel"]
        )
        sd[f"bins_regressor.{j}.bias"] = np.asarray(
            params[name]["Dense_0"]["bias"]
        )

    w = np.asarray(params["prob_kernel"])  # [Q,D]
    sd["convert_to_prob.0.weight"] = np.transpose(w, (1, 0))[:, :, None, None]
    sd["convert_to_prob.0.bias"] = np.asarray(params["prob_bias"])
    return sd


def export_resnet_encoder(params, batch_stats,
                          prefix: str = "") -> Dict[str, np.ndarray]:
    """Standalone ResNetEncoder tree -> torchvision-style state_dict keys
    (inverse of torch_port.convert_resnet_encoder)."""
    sd: Dict[str, np.ndarray] = {}
    _put_conv(sd, prefix + "conv1", params["conv1"])
    _put_bn(sd, prefix + "bn1", params["bn1"]["BatchNorm_0"],
            batch_stats["bn1"]["BatchNorm_0"])
    for name, blk in params.items():
        if not name.startswith("layer"):
            continue
        stage, idx = name.replace("layer", "").split("_")
        dst = f"{prefix}layer{stage}.{idx}"
        for c in ("conv1", "conv2", "conv3"):
            if c in blk:
                _put_conv(sd, f"{dst}.{c}", blk[c])
        for b in ("bn1", "bn2", "bn3"):
            if b in blk:
                _put_bn(sd, f"{dst}.{b}", blk[b]["BatchNorm_0"],
                        batch_stats[name][b]["BatchNorm_0"])
        if "down_conv" in blk:
            _put_conv(sd, f"{dst}.downsample.0", blk["down_conv"])
            _put_bn(sd, f"{dst}.downsample.1", blk["down_bn"]["BatchNorm_0"],
                    batch_stats[name]["down_bn"]["BatchNorm_0"])
    return sd


def export_rectify(params, batch_stats) -> Dict[str, np.ndarray]:
    """RectifyNet tree -> reference rectify.pth keys (inverse of
    torch_port.convert_rectify; reference networks/rectify_net.py:6-68)."""
    sd = export_resnet_encoder(
        params["encoder"], batch_stats["encoder"], prefix="encoder.encoder."
    )
    dec = params["decoder"]
    _put_conv(sd, "decoder.conv_squeeze", dec["squeeze"]["Conv_0"])
    for i, name in enumerate(("pose_0", "pose_1", "pose_2")):
        _put_conv(sd, f"decoder.convs_pose.{i}", dec[name]["Conv_0"])
    return sd


def export_pose_cnn(params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for i in range(7):
        node = params[f"conv{i}"]["Conv_0"]
        sd[f"net.{i}.weight"] = _conv_w(node["kernel"])
        sd[f"net.{i}.bias"] = np.asarray(node["bias"])
    node = params["pose_conv"]["Conv_0"]
    sd["pose_conv.weight"] = _conv_w(node["kernel"])
    sd["pose_conv.bias"] = np.asarray(node["bias"])
    return sd


def save_reference_style_checkpoint(folder: str, params, batch_stats, opt=None):
    """Write encoder.pth / depth.pth / pose.pth (trainer.py:638-660 layout)."""
    import torch

    os.makedirs(folder, exist_ok=True)
    enc = {
        k: torch.from_numpy(v.copy())
        for k, v in export_resnet_encoder_decoder(
            params["encoder"], batch_stats["encoder"]
        ).items()
    }
    if opt is not None:
        enc["height"] = opt.height
        enc["width"] = opt.width
        enc["use_stereo"] = opt.use_stereo
    torch.save(enc, os.path.join(folder, "encoder.pth"))
    torch.save(
        {k: torch.from_numpy(v.copy())
         for k, v in export_sql_decoder(params["depth"]).items()},
        os.path.join(folder, "depth.pth"),
    )
    if "pose" in params:
        torch.save(
            {k: torch.from_numpy(v.copy())
             for k, v in export_pose_cnn(params["pose"]).items()},
            os.path.join(folder, "pose.pth"),
        )
