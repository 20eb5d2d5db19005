"""weights_init='pretrained' wiring: builder init from local ImageNet weights.

The reference initializes every encoder from torchvision / torch.hub / timm
ImageNet checkpoints (networks/resnet_encoder.py:44,57, base_encoder.py:94,
Unet.py:114-117). Here the weights come from $SFMNEXT_WEIGHTS as raw torch
state_dicts; these tests generate fixture state_dicts in the external
layouts via utils.torch_export and verify build+init lands exactly the
converted values in the backbone (decoder stays random) for resnet50,
eff_b5, and convnext — per round-2 verdict item 1.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sfmnext_tpu.config import Options
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.utils import torch_export as te
from sfmnext_tpu.utils.imagenet_init import (
    apply_weights_init,
    imagenet_resnet,
)


def _save_sd(path, sd):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)


def _tiny_opt(**kw):
    d = dict(
        height=64, width=96, patch_size=4, query_nums=16, dim_out=16,
        model_dim=16, num_features=64, weights_init="pretrained",
    )
    d.update(kw)
    return Options(**d).validate()


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _any_leaf_differs(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            return True
    return False


def test_resnet50_pretrained_init(tmp_path, monkeypatch):
    """torchvision-layout resnet50.pth lands in the encoder backbone."""
    opt = _tiny_opt(backbone="resnet", num_layers=50)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))

    # fixture: a differently-seeded backbone exported to torchvision naming
    donor = init_params(opt, models, jax.random.PRNGKey(7))
    sd = te.export_resnet_encoder_decoder(
        donor["params"]["encoder"], donor["batch_stats"]["encoder"]
    )
    tv_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    _save_sd(tmp_path / "resnet50.pth", tv_sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    out = apply_weights_init(opt, models, variables)
    _leaves_equal(
        out["params"]["encoder"]["encoder"],
        donor["params"]["encoder"]["encoder"],
    )
    _leaves_equal(
        out["batch_stats"]["encoder"]["encoder"],
        donor["batch_stats"]["encoder"]["encoder"],
    )
    # decoder + depth stay at the build rng (reference: only the backbone
    # is pretrained)
    _leaves_equal(
        out["params"]["encoder"]["decoder"],
        variables["params"]["encoder"]["decoder"],
    )
    _leaves_equal(out["params"]["depth"], variables["params"]["depth"])
    assert _any_leaf_differs(
        out["params"]["encoder"]["encoder"],
        variables["params"]["encoder"]["encoder"],
    )


def test_eff_b5_pretrained_init(tmp_path, monkeypatch):
    """gen-efficientnet-layout tf_efficientnet_b5_ap.pth lands in eff_b5."""
    opt = _tiny_opt(backbone="eff_b5")
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(1))

    donor = init_params(opt, models, jax.random.PRNGKey(8))
    sd = te.export_efficientnet_b5(
        donor["params"]["encoder"]["encoder"],
        donor["batch_stats"]["encoder"]["encoder"],
        prefix="",
    )
    _save_sd(tmp_path / "tf_efficientnet_b5_ap.pth", sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    out = apply_weights_init(opt, models, variables)
    _leaves_equal(
        out["params"]["encoder"]["encoder"],
        donor["params"]["encoder"]["encoder"],
    )
    _leaves_equal(
        out["batch_stats"]["encoder"]["encoder"],
        donor["batch_stats"]["encoder"]["encoder"],
    )
    _leaves_equal(
        out["params"]["encoder"]["decoder"],
        variables["params"]["encoder"]["decoder"],
    )


def test_convnext_pretrained_init(tmp_path, monkeypatch):
    """timm-layout convnext state_dict lands in the Unet encoder."""
    opt = _tiny_opt(
        backbone="convnext_atto", dec_channels=(64, 48, 32, 24)
    )
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(2))

    donor = init_params(opt, models, jax.random.PRNGKey(9))
    sd = te.export_convnext_unet(
        donor["params"]["encoder"], donor["batch_stats"]["encoder"],
        "convnext_atto",
    )
    timm_sd = {
        k[len("encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.")
    }
    _save_sd(tmp_path / "convnext_atto.pth", timm_sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    out = apply_weights_init(opt, models, variables)
    _leaves_equal(
        out["params"]["encoder"]["encoder"],
        donor["params"]["encoder"]["encoder"],
    )
    _leaves_equal(
        out["params"]["encoder"]["decoder"],
        variables["params"]["encoder"]["decoder"],
    )


def test_multiimage_conv1_tiling(tmp_path, monkeypatch):
    """Pose/rectify 2-image stems tile conv1/n (resnet_encoder.py:55-61)."""
    opt = _tiny_opt(backbone="resnet", num_layers=18)
    models = build_models(opt, train=True)
    donor = init_params(opt, models, jax.random.PRNGKey(3))
    sd = te.export_resnet_encoder_decoder(
        donor["params"]["encoder"], donor["batch_stats"]["encoder"]
    )
    tv_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    _save_sd(tmp_path / "resnet18.pth", tv_sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    p, s = imagenet_resnet(18, num_input_images=2)
    k1 = np.asarray(donor["params"]["encoder"]["encoder"]["conv1"]["kernel"])
    got = np.asarray(p["conv1"]["kernel"])
    assert got.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(got, np.concatenate([k1, k1], axis=2) / 2.0)


def test_separate_resnet_pose_and_rectify_init(tmp_path, monkeypatch):
    """apply_weights_init covers pose_encoder and the rectify encoder."""
    opt = _tiny_opt(
        backbone="resnet", num_layers=18,
        pose_model_type="separate_resnet", use_rectify_net=True,
    )
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(4))

    donor = init_params(opt, models, jax.random.PRNGKey(11))
    sd = te.export_resnet_encoder_decoder(
        donor["params"]["encoder"], donor["batch_stats"]["encoder"]
    )
    tv_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    _save_sd(tmp_path / "resnet18.pth", tv_sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    out = apply_weights_init(opt, models, variables)
    donor_k1 = np.asarray(
        donor["params"]["encoder"]["encoder"]["conv1"]["kernel"]
    )
    tiled = np.concatenate([donor_k1, donor_k1], axis=2) / 2.0
    np.testing.assert_allclose(
        np.asarray(out["params"]["pose_encoder"]["conv1"]["kernel"]), tiled
    )
    np.testing.assert_allclose(
        np.asarray(out["params"]["rectify"]["encoder"]["conv1"]["kernel"]),
        tiled,
    )


def test_missing_weights_fail_loudly(tmp_path, monkeypatch):
    opt = _tiny_opt(backbone="resnet", num_layers=50)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(5))
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="resnet50.pth"):
        apply_weights_init(opt, models, variables)


def test_scratch_is_noop():
    opt = _tiny_opt(backbone="resnet", num_layers=18, weights_init="scratch")
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(6))
    out = apply_weights_init(opt, models, variables)
    assert out is variables


def test_wrong_architecture_weights_rejected(tmp_path, monkeypatch):
    """A resnet18-shaped file under a resnet50 name must raise, not load."""
    opt18 = _tiny_opt(backbone="resnet", num_layers=18)
    models18 = build_models(opt18, train=True)
    donor = init_params(opt18, models18, jax.random.PRNGKey(12))
    sd = te.export_resnet_encoder_decoder(
        donor["params"]["encoder"], donor["batch_stats"]["encoder"]
    )
    tv_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    _save_sd(tmp_path / "resnet50.pth", tv_sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    opt50 = _tiny_opt(backbone="resnet", num_layers=50)
    models50 = build_models(opt50, train=True)
    variables = init_params(opt50, models50, jax.random.PRNGKey(13))
    with pytest.raises((KeyError, ValueError)):
        apply_weights_init(opt50, models50, variables)
