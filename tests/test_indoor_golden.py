"""Indoor-pipeline numerics golden test against the LIVE reference code.

Mirrors tests/test_full_pipeline_golden.py for trainer_indoor.py: the
rectify losses (:877-924), occlusion-weighted min-reprojection
(:615-719) and photo_and_geometry_loss_imp (:926-1012) run through the
reference's real ``layers.py`` (euler2mat, inverse_rotation_warp,
BackprojectDepth/Project3D/ProjectDepth, SSIM, compute_smooth_loss) and
its live QTR/PoseCNN modules on the SAME weights and batch as our jitted
forward_indoor, asserting losses AND gradients in f32.

Reference modules that import torchvision (ResnetEncoder, RectifyNet) are
rebuilt from torch primitives with the reference's exact forward
(rectify_net.py:6-68: half-res 2-frame stack -> 2-image ResNet-18 ->
RotDecoder with zeroed third component). kornia's depth_to_3d (the one
kornia symbol layers.py uses, :8) is provided as a real torch
implementation instead of the outdoor test's inert stub.

The ``com_depth`` producer consumed by compute_pairwise_loss_imp is
commented out in the reference (:586-593); both sides here use the
previously-active variant ProjectDepth(cam_points, K, T) — the repo's
documented resolution of that dead code (training/indoor.py docstring).

The randn tie-break (:683-684) is dropped on both sides (rng=None).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.indoor import forward_indoor
from sfmnext_tpu.utils import torch_export as te

from test_full_pipeline_golden import (  # tests/ is rootdir-importable
    _load_reference,
    _TorchEncDec,
)

H, W = 64, 96
SMOOTH_W = 1e-3
REG_WT = 0.01


def _load_reference_with_depth_to_3d():
    """_load_reference with a REAL kornia.depth_to_3d (layers.py:8)."""
    import sys
    import types

    def depth_to_3d(depth, K, normalize_points=False):
        b, _, h, w = depth.shape
        ys, xs = torch.meshgrid(
            torch.arange(h, dtype=torch.float32),
            torch.arange(w, dtype=torch.float32),
            indexing="ij",
        )
        pts = torch.stack([xs, ys, torch.ones_like(xs)], 0).reshape(1, 3, -1)
        cam = torch.inverse(K) @ pts.repeat(b, 1, 1)
        return (cam * depth.reshape(b, 1, -1)).reshape(b, 3, h, w)

    if "kornia" not in sys.modules:
        m = types.ModuleType("kornia")
        g = types.ModuleType("kornia.geometry")
        d = types.ModuleType("kornia.geometry.depth")
        sys.modules.update(
            {"kornia": m, "kornia.geometry": g, "kornia.geometry.depth": d}
        )
    sys.modules["kornia.geometry.depth"].depth_to_3d = depth_to_3d
    return _load_reference()


# ----------------------- torch 2-image ResNet-18 + RotDecoder (rectify) ----


class _BB(nn.Module):  # torchvision BasicBlock
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class _TorchResNet18Multi(nn.Module):
    def __init__(self, num_input_images=2):
        super().__init__()
        self.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for li, width in enumerate((64, 128, 256, 512)):
            stage = []
            for bi in range(2):
                stride = 2 if (bi == 0 and li > 0) else 1
                stage.append(_BB(in_ch, width, stride))
                in_ch = width
            setattr(self, f"layer{li + 1}", nn.Sequential(*stage))


class _TorchRectifyEncoder(nn.Module):
    """reference ResnetEncoder.forward for the 2-image stem."""

    def __init__(self):
        super().__init__()
        self.encoder = _TorchResNet18Multi(2)

    def forward(self, x):
        x = (x - 0.45) / 0.225
        e = self.encoder
        feats = [e.relu(e.bn1(e.conv1(x)))]
        feats.append(e.layer1(e.maxpool(feats[-1])))
        feats.append(e.layer2(feats[-1]))
        feats.append(e.layer3(feats[-1]))
        feats.append(e.layer4(feats[-1]))
        return feats


class _TorchRotDecoder(nn.Module):
    """reference RotDecoder (rectify_net.py:27-68)."""

    def __init__(self):
        super().__init__()
        self.conv_squeeze = nn.Conv2d(512, 256, 1)
        self.convs_pose = nn.ModuleList(
            [
                nn.Conv2d(256, 256, 3, 1, 1),
                nn.Conv2d(256, 256, 3, 1, 1),
                nn.Conv2d(256, 3, 1),
            ]
        )
        self.relu = nn.ReLU()

    def forward(self, input_features):
        last = [f[-1] for f in input_features]
        out = torch.cat([self.relu(self.conv_squeeze(f)) for f in last], 1)
        for i in range(3):
            out = self.convs_pose[i](out)
            if i != 2:
                out = self.relu(out)
        out = out.mean(3).mean(2).view(-1, 3)
        # rot[:, 2] = 0 without in-place autograd trouble
        return out * torch.tensor([1.0, 1.0, 0.0])


class _TorchRectify(nn.Module):
    """reference RectifyNet.forward (rectify_net.py:17-25)."""

    def __init__(self):
        super().__init__()
        self.encoder = _TorchRectifyEncoder()
        self.decoder = _TorchRotDecoder()

    def forward(self, img1, img2):
        x = torch.cat([img1, img2], 1)
        b, c, h, w = x.size()
        x = F.interpolate(
            x, [h // 2, w // 2], mode="bilinear", align_corners=True
        )
        return self.decoder([self.encoder(x)])


# ------------------------------------------------------------- torch side


def _torch_rectify_imgs(rectify, ref_layers, tgt, refs, K3):
    """trainer_indoor.py:877-924 (the `if True` branch)."""
    rot1s, rot2s, rot3s, rot3_gts, warped = [], [], [], [], []
    for ref in refs:
        rot1 = rectify(tgt, ref)
        ref_w = ref_layers.inverse_rotation_warp(ref, rot1, K3)
        rot2 = rectify(tgt, ref_w)
        rot3_gt = rot1.clone().detach()
        rot3 = rectify(ref_w.clone().detach(), ref)
        rot1s.append(rot1)
        rot2s.append(rot2)
        rot3s.append(rot3)
        rot3_gts.append(rot3_gt)
        warped.append(ref_w)
    rot1 = torch.stack(rot1s)
    rot2 = torch.stack(rot2s)
    rot3 = torch.stack(rot3s)
    rot3_gt = torch.stack(rot3_gts)
    loss_rc = (rot3 - rot3_gt).abs().mean()
    loss_rt = (rot2.abs() - rot1.abs() + 0.05).clamp(min=0).mean()
    return warped, loss_rc, loss_rt


def _torch_indoor_common(ref_layers, encdec, qtr, posecnn, batch, b,
                         refs_for_depth, pose_refs, need_geo):
    """Shared depth/pose/warp graph (trainer_indoor.py:332-423, 511-598)."""
    to_t = lambda a: torch.from_numpy(np.ascontiguousarray(a))
    nchw = lambda a: to_t(np.transpose(a, (0, 3, 1, 2)))
    color = {f: nchw(batch["color"][:, i]) for i, f in enumerate((0, -1, 1))}
    K, inv_K = to_t(batch["K"]), to_t(batch["inv_K"])

    disp = qtr(encdec(nchw(batch["color_aug"][:, 0])))[("disp", 0)]
    depth = F.interpolate(disp, [H, W], mode="bilinear", align_corners=False)

    depth_refs = {}
    if need_geo:
        for f_i, ref in zip((-1, 1), refs_for_depth):
            d = qtr(encdec(ref))[("disp", 0)]
            depth_refs[f_i] = F.interpolate(
                d, [H, W], mode="bilinear", align_corners=False
            )

    # poses: raw target + (rectified) refs (trainer_indoor.py:439-444)
    poses = {}
    for f_i, ref in zip((-1, 1), pose_refs):
        if f_i < 0:
            pair = torch.cat([ref, color[0]], 1)
        else:
            pair = torch.cat([color[0], ref], 1)
        poses[f_i] = posecnn(pair)

    backproject = ref_layers.BackprojectDepth(b, H, W)
    project = ref_layers.Project3D(b, H, W)
    project_depth = ref_layers.ProjectDepth(b, H, W)

    warped_colors, pred_deps, com_deps = {}, {}, {}
    for f_i, src in zip((-1, 1), refs_for_depth):
        aa, t = poses[f_i]
        inv_depth = 1 / depth
        mean_inv_depth = inv_depth.mean(3, True).mean(2, True)
        T = ref_layers.transformation_from_parameters(
            aa[:, 0], t[:, 0] * mean_inv_depth[:, 0], f_i < 0
        )
        cam_points = backproject(depth, inv_K)
        pix = project(cam_points, K, T)
        warped_colors[f_i] = F.grid_sample(
            src, pix, padding_mode="border", align_corners=True
        )
        if need_geo:
            pred_deps[f_i] = F.grid_sample(
                depth_refs[f_i], pix, padding_mode="border",
                align_corners=True,
            )
            com_deps[f_i] = project_depth(cam_points, K, T)
    return color, disp, depth, depth_refs, warped_colors, pred_deps, com_deps


def _torch_occ_losses(ssim, color, disp, depth, warped_colors, pred_deps):
    """compute_losses_with_occ (trainer_indoor.py:615-719), no randn."""

    def reproj_loss(pred, target):
        l1 = torch.abs(target - pred).mean(1, True)
        s = ssim(pred, target).mean(1, True)
        return 0.85 * s + 0.15 * l1

    target = color[0]
    reproj, l1_reg = [], []
    for f_i in (-1, 1):
        pred = warped_colors[f_i]
        valid = (pred.abs().mean(dim=1, keepdim=True) > 1e-3).float()
        err = reproj_loss(pred, target)
        projected = pred_deps[f_i]
        computed = depth
        d = (computed - projected).abs() / (computed + projected)
        l1_reg.append(d * valid)
        wmask = (1 - torch.sqrt(1 - (d - 1) ** 2)).detach()
        reproj.append(err * wmask * valid)
    reproj = torch.cat(reproj, 1)
    l1_reg = torch.cat(l1_reg, 1)
    ident = torch.cat(
        [reproj_loss(color[f], target) for f in (-1, 1)], 1
    )
    combined = torch.cat((ident, reproj), dim=1)
    to_optimise, _ = torch.min(combined, dim=1)

    loss = to_optimise.mean() + REG_WT * l1_reg.mean(1, True).mean()
    mean_disp = disp.mean(2, True).mean(3, True)
    norm_disp = disp / (mean_disp + 1e-7)
    color_small = F.interpolate(
        target, list(norm_disp.shape[-2:]), mode="bilinear",
        align_corners=False,
    )
    smooth = ref_smooth(norm_disp, color_small)
    return loss + SMOOTH_W * smooth, to_optimise.mean(), smooth


def ref_smooth(disp, img):
    grad_disp_x = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    grad_disp_y = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_img_x = torch.mean(
        torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]), 1, keepdim=True
    )
    grad_img_y = torch.mean(
        torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), 1, keepdim=True
    )
    return (
        (grad_disp_x * torch.exp(-grad_img_x)).mean()
        + (grad_disp_y * torch.exp(-grad_img_y)).mean()
    )


def _torch_photo_geo(ssim, color, depth, depth_refs, warped_colors,
                     pred_deps, com_deps):
    """photo_and_geometry_loss_imp (trainer_indoor.py:926-1012)."""
    diff_imgs, diff_colors, valids, geos = [], [], [], []
    tgt = color[0]
    for f_i in (-1, 1):
        warped = warped_colors[f_i]
        projected = pred_deps[f_i]
        computed = com_deps[f_i]
        d = (computed - projected).abs() / (computed + projected)
        geo = (computed - depth_refs[f_i]).abs().mean(1, True)
        valid = (
            (warped.abs().mean(1, True) > 1e-3).float()
            * (tgt.abs().mean(1, True) > 1e-3).float()
        )
        diff_color = (tgt - warped).abs().mean(1, True)
        ident = (tgt - color[f_i]).abs().mean(1, True)
        valid = valid * (diff_color < ident).float()
        di = (tgt - warped).abs().clamp(0, 1)
        di = (0.15 * di + 0.85 * ssim(warped, tgt)).mean(1, True)
        w = (1 - d).detach()
        diff_imgs.append(di * w)
        geos.append(geo * w)
        diff_colors.append(diff_color)
        valids.append(valid)
    diff_img = torch.cat(diff_imgs, 1)
    diff_color = torch.cat(diff_colors, 1)
    valid = torch.cat(valids, 1)
    geo = torch.cat(geos, 1)
    idx = torch.argmin(diff_color, dim=1, keepdim=True)
    diff_img = torch.gather(diff_img, 1, idx)
    valid = torch.gather(valid, 1, idx)
    geo = torch.gather(geo, 1, idx)

    def mean_on_mask(x, m):
        s = m.sum()
        if s > 100:
            return (x * m).sum() / s
        return torch.tensor(0.0)

    return mean_on_mask(diff_img, valid), mean_on_mask(geo, valid)


# --------------------------------------------------------------- fixtures


def _build(mode):
    """mode: 'occ_rectify' or 'photo_geo'."""
    opt = Options(
        backbone="resnet", num_layers=50, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=H, width=W,
        compute_dtype="float32", disparity_smoothness=SMOOTH_W,
        reg_wt=REG_WT, use_pallas=False, dataset="nyu_raw",
        use_rectify_net=(mode == "occ_rectify"),
        use_improved_mini_reproj_loss=(mode == "occ_rectify"),
        use_photo_geo_loss=(mode == "photo_geo"),
    ).validate()
    models = build_models(opt, train=False)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    return opt, models, variables


def _torch_models(opt, params, stats, with_rectify):
    ref_layers, qtr_mod, pose_mod = _load_reference_with_depth_to_3d()
    torch.manual_seed(0)

    encdec = _TorchEncDec(opt.num_features, opt.model_dim).eval()
    enc_sd = te.export_resnet_encoder_decoder(
        params["encoder"], stats["encoder"]
    )
    missing, unexpected = encdec.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in enc_sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    qtr = qtr_mod.Depth_Decoder_QueryTr(
        in_channels=opt.model_dim, patch_size=opt.patch_size,
        dim_out=opt.dim_out, embedding_dim=opt.model_dim,
        query_nums=opt.query_nums, num_heads=4,
        min_val=opt.min_depth, max_val=opt.max_depth,
    ).eval()
    qtr.load_state_dict(
        {
            k: torch.from_numpy(v.copy())
            for k, v in te.export_sql_decoder(params["depth"]).items()
        },
        strict=True,
    )
    posecnn = pose_mod.PoseCNN(2).eval()
    posecnn.load_state_dict(
        {
            k: torch.from_numpy(v.copy())
            for k, v in te.export_pose_cnn(params["pose"]).items()
        },
        strict=True,
    )
    rectify = None
    if with_rectify:
        rectify = _TorchRectify().eval()
        rect_sd = te.export_rectify(params["rectify"], stats["rectify"])
        missing, unexpected = rectify.load_state_dict(
            {k: torch.from_numpy(v.copy()) for k, v in rect_sd.items()},
            strict=False,
        )
        assert not unexpected, unexpected
        assert all("num_batches_tracked" in k for k in missing), missing
    return ref_layers, encdec, qtr, posecnn, rectify


def _torch_total(mode, ref_layers, encdec, qtr, posecnn, rectify, batch, b):
    to_t = lambda a: torch.from_numpy(np.ascontiguousarray(a))
    nchw = lambda a: to_t(np.transpose(a, (0, 3, 1, 2)))
    K3 = to_t(batch["K"][:, :3, :3])
    color = {f: nchw(batch["color"][:, i]) for i, f in enumerate((0, -1, 1))}
    raw_refs = [color[-1], color[1]]

    terms = {}
    if mode == "occ_rectify":
        warped_refs, loss_rc, loss_rt = _torch_rectify_imgs(
            rectify, ref_layers, color[0], raw_refs, K3
        )
        refs_for_depth = pose_refs = warped_refs
        terms["rc"], terms["rt"] = loss_rc, loss_rt
    else:
        refs_for_depth = pose_refs = raw_refs

    (color_d, disp, depth, depth_refs, warped_colors, pred_deps,
     com_deps) = _torch_indoor_common(
        ref_layers, encdec, qtr, posecnn, batch, b, refs_for_depth,
        pose_refs, need_geo=True,
    )
    ssim = ref_layers.SSIM().eval()
    if mode == "occ_rectify":
        total, reproj, smooth = _torch_occ_losses(
            ssim, color_d, disp, depth, warped_colors, pred_deps
        )
        total = total + 1.0 * terms["rc"] + 1.0 * terms["rt"]
        terms.update({"reproj": reproj, "smooth": smooth})
    else:
        photo, geo = _torch_photo_geo(
            ssim, color_d, depth, depth_refs, warped_colors, pred_deps,
            com_deps,
        )
        mean_d = depth.mean(2, True).mean(3, True)
        smooth = ref_smooth(depth / (mean_d + 1e-7), color_d[0])
        total = 1.0 * photo + 1.0 * geo + SMOOTH_W * smooth
        terms.update({"photo": photo, "geo": geo, "smooth": smooth})
    terms["total"] = total
    return total, terms


@pytest.mark.parametrize("mode", ["occ_rectify", "photo_geo"])
def test_indoor_pipeline_matches_live_reference(mode):
    opt, models, variables = _build(mode)
    params, stats = variables["params"], variables["batch_stats"]
    ref_layers, encdec, qtr, posecnn, rectify = _torch_models(
        opt, params, stats, with_rectify=(mode == "occ_rectify")
    )

    b = 2
    batch = make_batch(b, H, W, seed=6)
    batch["K3x3"] = batch["K"][:, :3, :3].copy()

    with torch.no_grad():
        _, terms = _torch_total(
            mode, ref_layers, encdec, qtr, posecnn, rectify, batch, b
        )

    total, aux = jax.jit(
        lambda p, s, bt: forward_indoor(models, p, s, bt, None, opt)
    )(params, stats, batch)
    m = aux["metrics"]

    np.testing.assert_allclose(
        float(total), float(terms["total"]), rtol=1e-4
    )
    if mode == "occ_rectify":
        np.testing.assert_allclose(
            float(m["loss/rc"]), float(terms["rc"]), rtol=1e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            float(m["loss/rt"]), float(terms["rt"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m["loss/reprojection"]), float(terms["reproj"]), rtol=1e-4
        )
    else:
        np.testing.assert_allclose(
            float(m["loss/photo"]), float(terms["photo"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m["loss/geo"]), float(terms["geo"]), rtol=1e-4
        )
    np.testing.assert_allclose(
        float(m["loss/smooth"]), float(terms["smooth"]), rtol=1e-4
    )


@pytest.mark.parametrize("mode", ["occ_rectify", "photo_geo"])
def test_indoor_gradients_match_live_reference(mode):
    """d(total)/d(params) through the full indoor graph vs torch autograd —
    pins the rectify chain (incl. the stop-gradient placements), the
    occlusion weights, pred_dep sampling and the photo/geo selection."""
    opt, models, variables = _build(mode)
    params, stats = variables["params"], variables["batch_stats"]
    ref_layers, encdec, qtr, posecnn, rectify = _torch_models(
        opt, params, stats, with_rectify=(mode == "occ_rectify")
    )

    b = 2
    batch = make_batch(b, H, W, seed=6)
    batch["K3x3"] = batch["K"][:, :3, :3].copy()

    total_t, _ = _torch_total(
        mode, ref_layers, encdec, qtr, posecnn, rectify, batch, b
    )
    total_t.backward()
    t_grads = {
        "depth": {n: p.grad.numpy() for n, p in qtr.named_parameters()
                  if p.grad is not None},
        "pose": {n: p.grad.numpy() for n, p in posecnn.named_parameters()
                 if p.grad is not None},
    }
    if rectify is not None:
        t_grads["rectify"] = {
            n: p.grad.numpy() for n, p in rectify.named_parameters()
            if p.grad is not None
        }

    def loss_fn(p_sub):
        p2 = dict(params)
        p2.update(p_sub)
        total, _ = forward_indoor(models, p2, stats, batch, None, opt)
        return total

    sub = {"depth": params["depth"], "pose": params["pose"]}
    if rectify is not None:
        sub["rectify"] = params["rectify"]
    grads = jax.jit(jax.grad(loss_fn))(sub)
    grads = jax.tree_util.tree_map(np.asarray, grads)

    j_grads = {
        "depth": te.export_sql_decoder(grads["depth"]),
        "pose": te.export_pose_cnn(grads["pose"]),
    }
    if rectify is not None:
        # grads carry no BN running stats; reuse the value stats for layout
        j_grads["rectify"] = te.export_rectify(
            grads["rectify"], stats["rectify"]
        )

    for mod, tg_dict in t_grads.items():
        for name, tg in tg_dict.items():
            jg = j_grads[mod][name]
            scale = max(np.abs(tg).max(), 1e-12)
            # the indoor graph is ~3x deeper than outdoor (3 enc/dec
            # passes + rectify chains), so near-vanishing elements carry
            # proportionally more f32 rounding: 1e-2*scale floor vs the
            # outdoor test's 5e-3 (elements above it still match at 2e-3).
            # The rectify encoder sits behind THREE stacked rectify
            # forwards + the warp/pose/depth_ref consumers — its tail
            # elements (observed: ~0.03% of them, at ~1.5e-2 of scale)
            # need one more factor.
            floor = 2.5e-2 if mod == "rectify" else 1e-2
            np.testing.assert_allclose(
                jg, tg, rtol=2e-3, atol=max(floor * scale, 1e-8),
                err_msg=f"{mod}.{name}",
            )
