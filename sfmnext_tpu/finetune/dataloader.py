"""BTS-style supervised depth data loading.

Behavioral reference: finetune/dataloader.py:28-288 —
  - filenames_file lines: "<image> <depth> <focal>"
  - KITTI: kb-crop to 352x1216 (bottom-center), depth png / 256
  - NYU: crop depth/image margins, depth png / 1000
  - train augs: random rotate (+-degree), random crop to
    (input_height, input_width), 50% flip, 50% gamma/brightness/color
  - 'has_valid_depth' skip flag for missing GT
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np
from PIL import Image


class DepthDataset:
    """Items: {'image' [H,W,3] f32, 'depth' [H,W,1] f32 (meters),
    'focal' scalar, 'has_valid_depth' bool}."""

    def __init__(
        self,
        data_path: str,
        gt_path: str,
        filenames_file: str,
        mode: str = "train",
        dataset: str = "kitti",
        input_height: int = 352,
        input_width: int = 1216,
        do_kb_crop: bool = True,
        degree: float = 1.0,
        seed: int = 0,
    ):
        with open(filenames_file) as f:
            self.frames = [ln.split() for ln in f if ln.strip()]
        self.data_path = data_path
        self.gt_path = gt_path
        self.mode = mode
        self.dataset = dataset
        self.h, self.w = input_height, input_width
        self.do_kb_crop = do_kb_crop
        self.degree = degree
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.frames)

    def _load_pair(self, rec):
        img_rel, depth_rel = rec[0], rec[1]
        focal = float(rec[2]) if len(rec) > 2 else 721.5377
        image = Image.open(os.path.join(self.data_path, img_rel)).convert("RGB")
        depth_path = os.path.join(self.gt_path, depth_rel)
        if not os.path.exists(depth_path):
            return image, None, focal
        depth = Image.open(depth_path)
        return image, depth, focal

    def __getitem__(self, index):
        image, depth, focal = self._load_pair(self.frames[index])
        if depth is None:
            # reference skips these in-loop (train_ft_SQLdepth.py:227-229)
            z = np.zeros((self.h, self.w), np.float32)
            return {
                "image": np.zeros((self.h, self.w, 3), np.float32),
                "depth": z[..., None],
                "focal": np.float32(focal),
                "has_valid_depth": np.asarray(False),
            }

        if self.do_kb_crop and self.dataset == "kitti":
            # bottom-center 352x1216 (reference dataloader.py kb_crop);
            # skipped when the frame is smaller than the crop
            w, h = image.size
            if w >= 1216 and h >= 352:
                top, left = h - 352, (w - 1216) // 2
                image = image.crop((left, top, left + 1216, top + 352))
                depth = depth.crop((left, top, left + 1216, top + 352))

        if self.dataset == "nyu" and self.mode == "train":
            # margin crop avoiding blank pixel-registration borders, then
            # force the input size (reference dataloader.py:109-112)
            w, h = image.size
            if w >= 608 and h >= 472:
                image = image.crop((43, 45, 608, 472))
                depth = depth.crop((43, 45, 608, 472))
            image = image.resize((self.w, self.h), Image.Resampling.BILINEAR)

        if self.mode == "train":
            if self.degree > 0:
                angle = self.rng.uniform(-self.degree, self.degree)
                image = image.rotate(angle, resample=Image.BILINEAR)
                depth = depth.rotate(angle, resample=Image.NEAREST)
            img = np.asarray(image, np.float32) / 255.0
            dep = np.asarray(depth, np.float32)
            dep = dep / (256.0 if self.dataset == "kitti" else 1000.0)

            if self.dataset != "nyu":
                img, dep = self._random_crop(img, dep)
            # NYU: image was force-resized to input size while depth stays
            # at the 565x427 margin crop (reference dataloader.py:110-112;
            # its random_crop is commented out, :128) — shapes already fixed
            if self.rng.random() > 0.5:
                img, dep = img[:, ::-1].copy(), dep[:, ::-1].copy()
            if self.rng.random() > 0.5:
                img = self._augment_color(img)
        else:
            img = np.asarray(image, np.float32) / 255.0
            dep = np.asarray(depth, np.float32)
            dep = dep / (256.0 if self.dataset == "kitti" else 1000.0)

        return {
            "image": img.astype(np.float32),
            "depth": dep[..., None].astype(np.float32),
            "focal": np.float32(focal),
            "has_valid_depth": np.asarray(True),
        }

    def _random_crop(self, img, dep):
        h, w = img.shape[:2]
        if h <= self.h or w <= self.w:
            return img[: self.h, : self.w], dep[: self.h, : self.w]
        y = self.rng.randint(0, h - self.h)
        x = self.rng.randint(0, w - self.w)
        return (
            img[y : y + self.h, x : x + self.w],
            dep[y : y + self.h, x : x + self.w],
        )

    def _augment_color(self, img):
        # gamma, brightness, per-channel color (reference train_preprocess)
        gamma = self.rng.uniform(0.9, 1.1)
        img = img ** gamma
        brightness = self.rng.uniform(
            0.9, 1.1 if self.dataset == "nyu" else 1.1
        )
        img = img * brightness
        colors = np.asarray(
            [self.rng.uniform(0.9, 1.1) for _ in range(3)], np.float32
        )
        img = img * colors[None, None, :]
        return np.clip(img, 0, 1)
