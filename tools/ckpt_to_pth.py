#!/usr/bin/env python
"""Convert an orbax checkpoint to reference-style per-module .pth files.

Behavioral reference: finetune/ckpt_to_pth.py:11-37 (which converts finetune
.pt checkpoints to monodepth2-style encoder.pth/depth.pth with embedded
height/width/use_stereo).

    python tools/ckpt_to_pth.py --checkpoint runs/mdp/models/weights_24 \
        --out_folder export/ [--height 320 --width 1024]
"""

import argparse
import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out_folder", required=True)
    args = p.parse_args()

    from sfmnext_tpu.config import Options
    from sfmnext_tpu.utils import checkpoint as ckpt
    from sfmnext_tpu.utils.torch_export import save_reference_style_checkpoint

    restored = ckpt.load_checkpoint(args.checkpoint)
    meta = ckpt.read_meta(args.checkpoint)
    opt = Options(
        height=meta.get("height", 320),
        width=meta.get("width", 1024),
        use_stereo=meta.get("use_stereo", False),
    )
    save_reference_style_checkpoint(
        args.out_folder, restored["params"], restored["batch_stats"], opt
    )
    print(f"-> wrote encoder.pth / depth.pth / pose.pth to {args.out_folder}")


if __name__ == "__main__":
    main()
