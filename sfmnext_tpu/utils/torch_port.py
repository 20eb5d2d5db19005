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


# -------------------------------------------------------------------- PoseCNN


def convert_pose_cnn(sd: Dict[str, np.ndarray]):
    params: Dict[str, Any] = {}
    for i in range(7):
        params[f"conv{i}"] = {"Conv_0": _conv_pb(sd, f"net.{i}")}
    params["pose_conv"] = {"Conv_0": _conv_pb(sd, "pose_conv")}
    return params
