"""Host-side dataset: file lists -> decoded, resized numpy frame stacks.

Behavioral reference: datasets/mono_dataset.py:28-210 (MonoDataset). The
split of responsibilities differs TPU-side:

  reference (CPU workers)              | here
  -------------------------------------+--------------------------------
  PIL decode + ANTIALIAS resize        | host threads (decode + resize)
  per-item flip / ColorJitter          | ON DEVICE (data/augment.py)
  per-scale pyramid (num_scales)       | single scale (scales=[0] is the
                                       | reference default; v1_multiscale
                                       | resizes on device when needed)
  K scaled per scale + pinv            | K scaled once; inverse on host

Items are dicts of numpy arrays:
  'color' [F,H,W,3] float32 in [0,1] (frame order = frame_idxs),
  'K'/'inv_K' [4,4], optional 'depth_gt' [H,W,1], 'stereo_T' [4,4].
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def read_lines(path: str) -> List[str]:
    with open(path, "r") as f:
        return [ln.strip() for ln in f if ln.strip()]


def pil_load(path: str) -> Image.Image:
    with open(path, "rb") as f:
        with Image.open(f) as img:
            return img.convert("RGB")


class MonoDataset:
    """Base class; subclasses implement get_color / get_depth / K."""

    # normalized intrinsics [4,4]; subclasses override
    K = np.eye(4, dtype=np.float32)
    full_res_shape = (1242, 375)  # (W, H)

    def __init__(
        self,
        data_path: str,
        filenames: Sequence[str],
        height: int,
        width: int,
        frame_idxs: Sequence,
        is_train: bool = False,
        img_ext: str = ".png",
        load_depth: Optional[bool] = None,
    ):
        self.data_path = data_path
        self.filenames = list(filenames)
        self.height = height
        self.width = width
        self.frame_idxs = list(frame_idxs)
        self.is_train = is_train
        self.img_ext = img_ext
        self.load_depth = (
            self.check_depth() if load_depth is None else load_depth
        )

    def __len__(self):
        return len(self.filenames)

    # -- per-dataset hooks -------------------------------------------------
    def check_depth(self) -> bool:
        return False

    def get_color(self, folder, frame_index, side) -> Image.Image:
        raise NotImplementedError

    def get_depth(self, folder, frame_index, side) -> np.ndarray:
        raise NotImplementedError

    def parse_line(self, line: str):
        parts = line.split()
        folder = parts[0]
        frame_index = int(parts[1]) if len(parts) >= 2 else 0
        side = parts[2] if len(parts) >= 3 else None
        return folder, frame_index, side

    def intrinsics(self, folder=None, frame_index=None):
        """Pixel-scaled K at the training resolution (+ its inverse)."""
        K = self.K.copy()
        K[0] *= self.width
        K[1] *= self.height
        return K, np.linalg.inv(K).astype(np.float32)

    # -- item assembly -----------------------------------------------------
    def _resize(self, img: Image.Image) -> np.ndarray:
        img = img.resize((self.width, self.height), Image.LANCZOS)
        return np.asarray(img, dtype=np.float32) / 255.0

    def __getitem__(self, index: int):
        folder, frame_index, side = self.parse_line(self.filenames[index])

        frames = []
        for f in self.frame_idxs:
            if f == "s":
                other = {"r": "l", "l": "r"}[side]
                img = self.get_color(folder, frame_index, other)
            else:
                img = self.get_color(folder, frame_index + f, side)
            frames.append(self._resize(img))

        K, inv_K = self.intrinsics(folder, frame_index)
        item = {
            "color": np.stack(frames, 0),
            "K": K,
            "inv_K": inv_K,
        }
        if self.load_depth and side is not None:
            depth = self.get_depth(folder, frame_index, side)
            item["depth_gt"] = depth[..., None].astype(np.float32)
        if "s" in self.frame_idxs:
            stereo_T = np.eye(4, dtype=np.float32)
            side_sign = -1 if side == "l" else 1
            stereo_T[0, 3] = side_sign * 0.1  # flip sign applied on device
            item["stereo_T"] = stereo_T
        return item
