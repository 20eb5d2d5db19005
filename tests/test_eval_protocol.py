"""Eval-protocol tests: crops, median scaling, flip blending, KITTI depth GT."""

import os

import numpy as np

from sfmnext_tpu.config import Options
from sfmnext_tpu.evaluation import evaluate_predictions, resize_np_bilinear
from sfmnext_tpu.ops import metrics as M


def test_evaluate_predictions_median_scaling_recovers_scale():
    """Predictions off by a global scale must evaluate near-perfect under
    median scaling (the mono protocol, evaluate_depth_config.py:253-256)."""
    # smooth GT (resize-invariant), predictions off by a global scale
    yy, xx = np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 300),
                         indexing="ij")
    base = 5 + 40 * (0.3 * yy + 0.7 * xx)
    gt = np.stack([base * s for s in (1.0, 1.2, 0.8, 1.1)])
    preds = (gt * 0.37).astype(np.float32)[:, ::2, ::2]  # wrong scale + res

    opt = Options(eval_mono=True, height=64, width=96, patch_size=4,
                  query_nums=16)
    res = evaluate_predictions(opt, preds, list(gt), "eigen")
    assert res["abs_rel"] < 0.02, res
    assert abs(res["med_ratio"] - 1 / 0.37) < 0.1


def test_evaluate_predictions_stereo_scale_factor():
    gt = np.full((2, 50, 80), 10.0)
    preds = np.full((2, 50, 80), 10.0 / 5.4, np.float32)
    opt = Options(eval_stereo=True, height=64, width=96, patch_size=4,
                  query_nums=16, disable_median_scaling=True)
    res = evaluate_predictions(opt, preds, list(gt), "benchmark")
    assert res["abs_rel"] < 1e-5


def test_eigen_crop_fractions():
    m = M.eigen_crop_mask(375, 1242)
    ys, xs = np.where(m)
    assert ys.min() == int(0.40810811 * 375)
    assert xs.min() == int(0.03594771 * 1242)


def test_resize_np_matches_device_resize():
    import jax.numpy as jnp

    from sfmnext_tpu.ops.image import resize_bilinear

    rng = np.random.RandomState(1)
    x = rng.rand(20, 30).astype(np.float32)
    a = resize_np_bilinear(x, (37, 61))
    b = np.asarray(
        resize_bilinear(jnp.asarray(x)[None, :, :, None], (37, 61))
    )[0, :, :, 0]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_generate_depth_map_synthetic_velodyne(tmp_path):
    """Velodyne->depth projection on a synthetic calib + point cloud."""
    from sfmnext_tpu.data.kitti_utils import generate_depth_map

    calib = tmp_path / "calib"
    calib.mkdir()
    (calib / "calib_cam_to_cam.txt").write_text(
        "S_rect_02: 100.0 40.0\n"
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: 50 0 50 0 0 50 20 0 0 0 1 0\n"
    )
    (calib / "calib_velo_to_cam.txt").write_text(
        # velodyne x-forward -> camera z-forward
        "R: 0 -1 0 0 0 -1 1 0 0\n"
        "T: 0 0 0\n"
    )
    # one point 10m ahead, slightly left/up in velo coords
    pts = np.array([[10.0, 0.5, 0.2, 1.0]], np.float32)
    velo = tmp_path / "points.bin"
    pts.tofile(velo)

    depth = generate_depth_map(str(calib), str(velo), cam=2)
    assert depth.shape == (40, 100)
    ys, xs = np.where(depth > 0)
    assert len(ys) == 1
    np.testing.assert_allclose(depth[ys[0], xs[0]], 10.0, rtol=1e-5)
    # projected pixel: u = 50*(-0.5)/10+50 = 47.5 -> round-1 = 47
    assert xs[0] == 47


def test_duplicate_velodyne_points_keep_min_depth(tmp_path):
    from sfmnext_tpu.data.kitti_utils import generate_depth_map

    calib = tmp_path / "calib"
    calib.mkdir()
    (calib / "calib_cam_to_cam.txt").write_text(
        "S_rect_02: 100.0 40.0\n"
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: 50 0 50 0 0 50 20 0 0 0 1 0\n"
    )
    (calib / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
    )
    # two points on the same ray at 10m and 6m -> pixel keeps 6m
    pts = np.array(
        [[10.0, 0.0, 0.0, 1.0], [6.0, 0.0, 0.0, 1.0]], np.float32
    )
    velo = tmp_path / "points.bin"
    pts.tofile(velo)
    depth = generate_depth_map(str(calib), str(velo), cam=2)
    vals = depth[depth > 0]
    np.testing.assert_allclose(vals, [6.0], rtol=1e-5)


def test_coords_grid_and_bilinear_sampler():
    """RAFT helpers vs reference semantics (layers.py:552-571)."""
    import jax.numpy as jnp

    from sfmnext_tpu.ops.warp import bilinear_sampler, coords_grid, grid_sample

    b, h, w, c = 2, 8, 12, 3
    img = jnp.asarray(np.random.RandomState(0).rand(b, h, w, c), jnp.float32)
    grid = coords_grid(b, h, w)
    assert grid.shape == (b, h, w, 2)
    # identity coords reproduce the image; mask is interior-true
    out, mask = bilinear_sampler(img, grid, mask=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert float(mask[0, 4, 6]) == 1.0 and float(mask[0, 0, 0]) == 0.0
    # shifted coords match grid_sample zeros/align_corners=True
    shifted = grid + 1.5
    got = bilinear_sampler(img, shifted)
    xg = 2 * shifted[..., 0] / (w - 1) - 1
    yg = 2 * shifted[..., 1] / (h - 1) - 1
    expect = grid_sample(
        img, jnp.stack([xg, yg], -1), "zeros", True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_pretrained_model_cache(tmp_path):
    """download_model_if_doesnt_exist: cached models short-circuit, unknown
    names raise (reference utils.py:53-117; offline-safe behavior)."""
    import pytest as _pytest

    from sfmnext_tpu.utils.pretrained import download_model_if_doesnt_exist

    mdir = tmp_path / "models" / "mono_640x192"
    mdir.mkdir(parents=True)
    (mdir / "encoder.pth").write_bytes(b"x")
    got = download_model_if_doesnt_exist(
        "mono_640x192", models_dir=str(tmp_path / "models")
    )
    assert got == str(mdir)
    with _pytest.raises(KeyError):
        download_model_if_doesnt_exist("nope", models_dir=str(tmp_path))
