#!/usr/bin/env python
"""Host input-pipeline headroom check (round-3 verdict item 8).

Measures PrefetchLoader throughput at the flagship config (KITTI RAW
triplets decoded from real JPEG bytes, LANCZOS-resized to 320x1024) for
several worker counts, against the reference's DataLoader(num_workers=8)
(options.py:269-272). A fake KITTI tree of real JPEGs is generated under
/tmp so the per-item cost (jpeg decode + resize x3 frames) is the real
one.

Usage: python tools/bench_loader.py [n_items] [batch_size]
Prints one JSON line per worker count: items here are IMAGES (a triplet
item counts as 3), so compare directly against the device step's
imgs/sec from bench.py.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sfmnext_tpu.data.kitti import KITTIRAWDataset
from sfmnext_tpu.data.loader import PrefetchLoader


def make_fake_kitti(root: str, n_frames: int = 24):
    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = os.path.join(root, drive, "image_02/data")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    base = (rng.rand(375, 1242, 3) * 255).astype(np.uint8)
    for i in range(n_frames):
        # vary content so jpeg decode cost is realistic, reuse the base to
        # keep generation fast on the single host core
        arr = np.roll(base, i * 7, axis=1)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{i:010d}.jpg"), quality=92
        )
    lines = [f"{drive} {i} l" for i in range(1, n_frames - 1)]
    return lines


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    root = tempfile.mkdtemp(prefix="kitti_loader_bench_")
    lines = make_fake_kitti(root)

    ds = KITTIRAWDataset(
        root, lines, 320, 1024, frame_idxs=[0, -1, 1], is_train=True,
        img_ext=".jpg", load_depth=False,
    )

    for workers in (4, 8, 16):
        loader = PrefetchLoader(
            ds, batch_size=batch_size, shuffle=True, num_workers=workers,
            infinite=True, prefetch=4,
        )
        it = iter(loader)
        next(it)  # warm the worker pool
        t0 = time.perf_counter()
        done = 0
        while done < n_items:
            b = next(it)
            done += b["color"].shape[0]
        dt = time.perf_counter() - t0
        frames = done * len(ds.frame_idxs)
        print(json.dumps({
            "metric": "kitti_loader_imgs_per_sec",
            "num_workers": workers,
            "value": round(frames / dt, 2),
            "unit": "decoded+resized imgs/sec (triplet frames)",
            "items_per_sec": round(done / dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
