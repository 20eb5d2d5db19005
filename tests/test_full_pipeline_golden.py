"""Full-pipeline numerics golden test against the LIVE reference code.

Runs the reference's own loss graph — its real ``layers.py`` (SSIM,
BackprojectDepth, Project3D, transformation_from_parameters,
get_smooth_loss), its real ``Depth_Decoder_QueryTr`` and ``PoseCNN``
modules imported from /root/reference, and a line-by-line replication of
``Trainer.generate_images_pred``/``compute_losses`` (trainer.py:386-549,
scales=[0], posecnn pairs, automask) — on the SAME weights and batch as
our jitted JAX pipeline, and asserts total loss + per-term match in f32.

The reference's ResnetEncoderDecoder module imports torchvision (absent
here), so the encoder is rebuilt from torch primitives with torchvision
state_dict naming and the reference's exact forward (resnet_encoder.py:
89-100 normalization + taps; DecoderBN :120-147 incl. the conv2 padding=1
quirk). Weights flow flax->torch through utils/torch_export, so this also
pins the export path against the live reference modules.

The only reference line intentionally dropped on both sides is the
``randn * 1e-5`` automask tie-break noise (trainer.py:516-517) — our eval
pipeline disables it, and it would swamp a 1e-4 tolerance.
"""

import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.step import make_eval_step
from sfmnext_tpu.utils import torch_export as te

H, W = 64, 96
SMOOTH_W = 1e-3


def _load_reference():
    """Import the reference's layers.py + QTR/PoseCNN modules live."""
    if "kornia" not in sys.modules:
        m = types.ModuleType("kornia")
        g = types.ModuleType("kornia.geometry")
        d = types.ModuleType("kornia.geometry.depth")
        d.depth_to_3d = lambda *a, **k: None
        sys.modules.update(
            {"kornia": m, "kornia.geometry": g, "kornia.geometry.depth": d}
        )
    spec = importlib.util.spec_from_file_location(
        "ref_layers", "/root/reference/layers.py"
    )
    ref_layers = importlib.util.module_from_spec(spec)
    sys.modules["ref_layers"] = ref_layers
    spec.loader.exec_module(ref_layers)

    if "refnetworks" not in sys.modules:
        pkg = types.ModuleType("refnetworks")
        pkg.__path__ = ["/root/reference/networks"]
        sys.modules["refnetworks"] = pkg
    qtr = importlib.import_module("refnetworks.depth_decoder_QTR")
    pose = importlib.import_module("refnetworks.pose_cnn")
    return ref_layers, qtr, pose


# ------------------------- torch ResNet-50 enc/dec (torchvision naming) ----


class _TB(nn.Module):  # torchvision Bottleneck
    def __init__(self, in_ch, width, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        if stride != 1 or in_ch != width * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, width * 4, 1, stride, bias=False),
                nn.BatchNorm2d(width * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class _TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for li, (width, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3))
        ):
            stage = []
            for bi in range(blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                stage.append(_TB(in_ch, width, stride))
                in_ch = width * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*stage))


class _TorchResnetEncoder(nn.Module):
    """reference ResnetEncoder.forward (resnet_encoder.py:89-100)."""

    def __init__(self):
        super().__init__()
        self.encoder = _TorchResNet50()

    def forward(self, x):
        x = (x - 0.45) / 0.225
        feats = [self.encoder.relu(self.encoder.bn1(self.encoder.conv1(x)))]
        feats.append(self.encoder.layer1(self.encoder.maxpool(feats[-1])))
        feats.append(self.encoder.layer2(feats[-1]))
        feats.append(self.encoder.layer3(feats[-1]))
        feats.append(self.encoder.layer4(feats[-1]))
        return feats


class _TorchUpSampleBN(nn.Module):
    def __init__(self, skip_input, out):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(skip_input, out, 3, 1, 1), nn.BatchNorm2d(out),
            nn.LeakyReLU(), nn.Conv2d(out, out, 3, 1, 1),
            nn.BatchNorm2d(out), nn.LeakyReLU(),
        )

    def forward(self, x, skip):
        up = F.interpolate(
            x, size=skip.shape[-2:], mode="bilinear", align_corners=True
        )
        return self._net(torch.cat([up, skip], 1))


class _TorchDecoderBN(nn.Module):
    """reference DecoderBN for res50 (resnet_encoder.py:120-147), incl. the
    1x1-conv-with-padding-1 conv2 quirk."""

    def __init__(self, f, model_dim):
        super().__init__()
        self.conv2 = nn.Conv2d(2048, f, 1, 1, padding=1)
        self.up1 = _TorchUpSampleBN(f + 1024, f // 2)
        self.up2 = _TorchUpSampleBN(f // 2 + 512, f // 4)
        self.up3 = _TorchUpSampleBN(f // 4 + 256, f // 8)
        self.up4 = _TorchUpSampleBN(f // 8 + 64, f // 16)
        self.conv3 = nn.Conv2d(f // 16, model_dim, 3, 1, 1)

    def forward(self, feats):
        x0, x1, x2, x3, x4 = feats
        y = self.conv2(x4)
        y = self.up1(y, x3)
        y = self.up2(y, x2)
        y = self.up3(y, x1)
        y = self.up4(y, x0)
        return self.conv3(y)


class _TorchEncDec(nn.Module):
    def __init__(self, num_features, model_dim):
        super().__init__()
        self.encoder = _TorchResnetEncoder()
        self.decoder = _TorchDecoderBN(num_features, model_dim)

    def forward(self, x):
        return self.decoder(self.encoder(x))


# ---------------------------------------------------------------- the test


def _torch_pipeline(ref_layers, encdec, qtr_m, pose_m, batch, b):
    """trainer.py:266-299 + :386-439 + :455-549 at scale 0, posecnn pairs."""
    to_t = lambda a: torch.from_numpy(np.ascontiguousarray(a))
    nchw = lambda a: to_t(np.transpose(a, (0, 3, 1, 2)))
    colors = {
        f: nchw(batch["color"][:, i]) for i, f in enumerate((0, -1, 1))
    }
    K, inv_K = to_t(batch["K"]), to_t(batch["inv_K"])

    feats = encdec(nchw(batch["color_aug"][:, 0]))
    outputs = qtr_m(feats)

    # predict_poses pairs mode (:306-337)
    poses = {}
    for f_i in (-1, 1):
        if f_i < 0:
            pair = torch.cat([colors[f_i], colors[0]], 1)
        else:
            pair = torch.cat([colors[0], colors[f_i]], 1)
        poses[f_i] = pose_m(pair)

    # generate_images_pred (:386-439)
    disp = outputs[("disp", 0)]
    depth = F.interpolate(disp, [H, W], mode="bilinear", align_corners=False)
    backproject = ref_layers.BackprojectDepth(b, H, W)
    project = ref_layers.Project3D(b, H, W)
    preds = {}
    for f_i in (-1, 1):
        aa, t = poses[f_i]
        inv_depth = 1 / depth
        mean_inv_depth = inv_depth.mean(3, True).mean(2, True)
        T = ref_layers.transformation_from_parameters(
            aa[:, 0], t[:, 0] * mean_inv_depth[:, 0], f_i < 0
        )
        cam_points = backproject(depth, inv_K)
        pix = project(cam_points, K, T)
        preds[f_i] = F.grid_sample(
            colors[f_i], pix, padding_mode="border", align_corners=True
        )

    # compute_losses (:455-549), randn tie-break dropped
    ssim = ref_layers.SSIM().eval()

    def reproj_loss(pred, target):
        l1 = torch.abs(target - pred).mean(1, True)
        s = ssim(pred, target).mean(1, True)
        return 0.85 * s + 0.15 * l1

    target = colors[0]
    reprojection = torch.cat(
        [reproj_loss(preds[f], target) for f in (-1, 1)], 1
    )
    identity = torch.cat(
        [reproj_loss(colors[f], target) for f in (-1, 1)], 1
    )
    combined = torch.cat((identity, reprojection), dim=1)
    to_optimise, idxs = torch.min(combined, dim=1)
    loss = to_optimise.mean()

    mean_disp = depth.mean(2, True).mean(3, True)
    norm_disp = depth / (mean_disp + 1e-7)
    smooth = ref_layers.get_smooth_loss(norm_disp, target)
    total = loss + SMOOTH_W * smooth
    return {
        "loss": float(total),
        "reprojection": float(loss),
        "smooth": float(smooth),
        "depth": depth.detach().numpy(),
        "total_t": total,  # live tensor for gradient golden tests
    }


def test_full_pipeline_matches_live_reference():
    ref_layers, qtr_mod, pose_mod = _load_reference()
    torch.manual_seed(0)

    opt = Options(
        backbone="resnet", num_layers=50, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=H, width=W,
        compute_dtype="float32", disparity_smoothness=SMOOTH_W,
        use_pallas=False,
    ).validate()
    models = build_models(opt, train=False)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]

    # flax -> torch through the export shims, loaded strict into the LIVE
    # reference QTR/PoseCNN and the torchvision-named encoder
    encdec = _TorchEncDec(opt.num_features, opt.model_dim).eval()
    enc_sd = te.export_resnet_encoder_decoder(params["encoder"], stats["encoder"])
    missing, unexpected = encdec.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in enc_sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    qtr = qtr_mod.Depth_Decoder_QueryTr(
        in_channels=opt.model_dim, patch_size=opt.patch_size,
        dim_out=opt.dim_out, embedding_dim=opt.model_dim,
        query_nums=opt.query_nums, num_heads=4,
        min_val=opt.min_depth, max_val=opt.max_depth,
    ).eval()
    dep_sd = te.export_sql_decoder(params["depth"])
    qtr.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in dep_sd.items()}, strict=True
    )

    posecnn = pose_mod.PoseCNN(2).eval()
    pose_sd = te.export_pose_cnn(params["pose"])
    posecnn.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in pose_sd.items()}, strict=True
    )

    b = 2
    batch = make_batch(b, H, W, seed=4)

    with torch.no_grad():
        expect = _torch_pipeline(ref_layers, encdec, qtr, posecnn, batch, b)

    eval_fn = make_eval_step(opt, models)
    metrics, outputs = eval_fn(params, stats, batch)

    got_depth = np.transpose(np.asarray(outputs["depth"]), (0, 3, 1, 2))
    np.testing.assert_allclose(
        got_depth, expect["depth"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["loss/reprojection"]), expect["reprojection"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["loss/smooth"]), expect["smooth"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), expect["loss"], rtol=1e-4
    )


def test_full_pipeline_gradients_match_live_reference():
    """Gradient golden test: d(total)/d(params) of the FULL pipeline vs
    torch autograd through the live reference graph.

    Pins the whole backward — warp VJP, SSIM backward, min-combine
    subgradients, smoothness, pose chain — not just forward values.
    Compares the SQL decoder (the paper's core) and PoseCNN gradients;
    both reach through every loss term. Torch modules in eval mode
    (matching our train=False running-average BN) with requires_grad on.
    """
    ref_layers, qtr_mod, pose_mod = _load_reference()
    torch.manual_seed(0)

    opt = Options(
        backbone="resnet", num_layers=50, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=H, width=W,
        compute_dtype="float32", disparity_smoothness=SMOOTH_W,
        use_pallas=False,
    ).validate()
    models = build_models(opt, train=False)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]

    encdec = _TorchEncDec(opt.num_features, opt.model_dim).eval()
    enc_sd = te.export_resnet_encoder_decoder(params["encoder"], stats["encoder"])
    encdec.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in enc_sd.items()}, strict=False
    )
    qtr = qtr_mod.Depth_Decoder_QueryTr(
        in_channels=opt.model_dim, patch_size=opt.patch_size,
        dim_out=opt.dim_out, embedding_dim=opt.model_dim,
        query_nums=opt.query_nums, num_heads=4,
        min_val=opt.min_depth, max_val=opt.max_depth,
    ).eval()
    dep_sd = te.export_sql_decoder(params["depth"])
    qtr.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in dep_sd.items()}, strict=True
    )
    posecnn = pose_mod.PoseCNN(2).eval()
    pose_sd = te.export_pose_cnn(params["pose"])
    posecnn.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in pose_sd.items()}, strict=True
    )

    b = 2
    batch = make_batch(b, H, W, seed=4)

    # ---- torch backward through the live reference graph
    expect = _torch_pipeline(ref_layers, encdec, qtr, posecnn, batch, b)
    expect["total_t"].backward()
    t_grads = {
        "depth": {n: p.grad.numpy() for n, p in qtr.named_parameters()
                  if p.grad is not None},
        "pose": {n: p.grad.numpy() for n, p in posecnn.named_parameters()
                 if p.grad is not None},
    }

    # ---- jax backward through our pipeline
    from sfmnext_tpu.training.pipeline import forward

    def loss_fn(p_dep, p_pose):
        p2 = dict(params)
        p2["depth"] = p_dep
        p2["pose"] = p_pose
        total, _ = forward(models, p2, stats, batch, None, opt)
        return total

    g_dep, g_pose = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(
        params["depth"], params["pose"]
    )
    # the export shims are pure layout maps, so they convert grad pytrees
    # into torch-keyed grad dicts too
    j_grads = {
        "depth": te.export_sql_decoder(jax.tree_util.tree_map(np.asarray, g_dep)),
        "pose": te.export_pose_cnn(jax.tree_util.tree_map(np.asarray, g_pose)),
    }

    for mod in ("depth", "pose"):
        for name, tg in t_grads[mod].items():
            jg = j_grads[mod][name]
            scale = max(np.abs(tg).max(), 1e-12)
            # elements below ~0.5% of the tensor's max are compared by
            # absolute scale (their relative error is f32 noise), with a
            # 1e-8 floor: accumulated f32 rounding through the deep graph
            # for near-vanishing grads (e.g. late transformer layers)
            np.testing.assert_allclose(
                jg, tg, rtol=2e-3, atol=max(5e-3 * scale, 1e-8),
                err_msg=f"{mod}.{name}",
            )
