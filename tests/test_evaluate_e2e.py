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
