"""End-to-end evaluate(): fake KITTI images + gt npz through the full path."""

import os

import numpy as np
import pytest
from PIL import Image

from sfmnext_tpu.config import Options


@pytest.fixture
def fake_eval_setup(tmp_path, monkeypatch):
    # images
    seq = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = tmp_path / "data" / seq / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 3
    for i in range(n):
        Image.fromarray(
            rng.randint(0, 255, (96, 320, 3), np.uint8)
        ).save(img_dir / f"{i:010d}.png")

    # split + gt depths
    split_dir = tmp_path / "splits" / "eigen"
    split_dir.mkdir(parents=True)
    (split_dir / "test_files.txt").write_text(
        "\n".join(f"{seq} {i} l" for i in range(n))
    )
    gts = np.empty(n, object)
    for i in range(n):
        gts[i] = (rng.rand(96, 320) * 30 + 2).astype(np.float32)
    np.savez_compressed(split_dir / "gt_depths.npz", data=gts)

    monkeypatch.setenv("SFMNEXT_SPLITS", str(tmp_path / "splits"))
    return tmp_path


def test_evaluate_ext_disp_and_artifacts(fake_eval_setup, tmp_path):
    """--ext_disp_to_eval skips the model; --save_pred_disps dumps disps+errors."""
    from sfmnext_tpu.evaluation import evaluate

    rng = np.random.RandomState(1)
    preds = (rng.rand(3, 48, 160) * 20 + 1).astype(np.float32)
    ext = tmp_path / "ext_disps.npy"
    np.save(ext, preds)
    out = tmp_path / "evalout"

    opt = Options(
        backbone="resnet", num_layers=18, height=64, width=96,
        eval_mono=True, eval_split="eigen",
        ext_disp_to_eval=str(ext), save_pred_disps=True,
        eval_out_dir=str(out),
    )
    result = evaluate(opt)
    assert np.isfinite(result["abs_rel"])
    assert os.path.exists(out / "disps_eigen_split.npy")
    saved = np.load(out / "disps_eigen_split.npy")
    np.testing.assert_array_equal(saved, preds)
    errs = np.load(out / "error_eigen_split.npy.npz", allow_pickle=True)["data"]
    assert len(errs) == 3 and errs[0].shape == (96, 320)


def test_evaluate_no_eval_early_exit(fake_eval_setup, tmp_path):
    from sfmnext_tpu.evaluation import evaluate

    ext = tmp_path / "d.npy"
    np.save(ext, np.ones((2, 48, 160), np.float32))
    opt = Options(
        backbone="resnet", num_layers=18, height=64, width=96,
        eval_mono=True, eval_split="eigen",
        ext_disp_to_eval=str(ext), no_eval=True,
    )
    assert evaluate(opt) == {}


def test_evaluate_benchmark_split_saves_pngs(fake_eval_setup, tmp_path):
    from PIL import Image

    from sfmnext_tpu.evaluation import evaluate

    ext = tmp_path / "d.npy"
    np.save(ext, np.full((2, 48, 160), 5.4, np.float32))
    out = tmp_path / "bench_out"
    opt = Options(
        backbone="resnet", num_layers=18, height=64, width=96,
        eval_mono=True, eval_split="benchmark",
        ext_disp_to_eval=str(ext), eval_out_dir=str(out),
    )
    assert evaluate(opt) == {}
    png = out / "benchmark_predictions" / "0000000000.png"
    arr = np.array(Image.open(png))
    assert arr.shape == (352, 1216) and arr.dtype == np.uint16
    # depth = 5.4 / 5.4 = 1.0 -> uint16 256
    assert int(arr[176, 608]) == 256


def test_evaluate_eigen_to_benchmark_remap(fake_eval_setup, tmp_path):
    from sfmnext_tpu.evaluation import evaluate

    # remap ids live in splits/benchmark (reference evaluate_depth_config.py:171-176)
    bench_dir = fake_eval_setup / "splits" / "benchmark"
    bench_dir.mkdir(parents=True)
    np.save(bench_dir / "eigen_to_benchmark_ids.npy", np.array([2, 0]))

    preds = np.stack([np.full((48, 160), v, np.float32) for v in (1, 2, 3)])
    ext = tmp_path / "d.npy"
    np.save(ext, preds)
    out = tmp_path / "remap_out"
    opt = Options(
        backbone="resnet", num_layers=18, height=64, width=96,
        eval_mono=True, eval_split="eigen",
        ext_disp_to_eval=str(ext), eval_eigen_to_benchmark=True,
        no_eval=True, save_pred_disps=True, eval_out_dir=str(out),
    )
    evaluate(opt)
    saved = np.load(out / "disps_eigen_split.npy")
    np.testing.assert_array_equal(saved, preds[[2, 0]])


def test_evaluate_end_to_end(fake_eval_setup):
    from sfmnext_tpu.evaluation import evaluate

    opt = Options(
        data_path=str(fake_eval_setup / "data"),
        backbone="resnet", num_layers=18, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=64, width=96,
        eval_mono=True, post_process=True, eval_split="eigen",
        num_workers=1,
    )
    result = evaluate(opt)  # random init — metrics just need to be finite
    for k in ("abs_rel", "rmse", "a1", "med_ratio"):
        assert np.isfinite(result[k]), result
    # median scaling keeps the scale ratio well-defined
    assert result["med_ratio"] > 0


def test_evaluate_batched_matches_batch1(fake_eval_setup):
    """--eval_batch_size N (padded last batch) reproduces the batch-1
    protocol metrics (round-2 verdict item 8). 3 images, batch 2 ->
    one full + one padded batch."""
    from sfmnext_tpu.evaluation import evaluate

    common = dict(
        data_path=str(fake_eval_setup / "data"),
        backbone="resnet", num_layers=18, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=64, width=96,
        eval_mono=True, post_process=True, eval_split="eigen",
        num_workers=1, seed=3,
    )
    r1 = evaluate(Options(**common))
    rN = evaluate(Options(**common, eval_batch_size=2))
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
        np.testing.assert_allclose(rN[k], r1[k], rtol=1e-5, err_msg=k)
