#!/usr/bin/env python
"""Indoor self-supervised training CLI (reference train_indoor.py:15-23).

    python train_indoor.py args_files/<config>.txt
Uses the indoor pipeline (RectifyNet, occlusion-weighted / photo-geo
losses) selected automatically from the flags.
"""

import sys

from sfmnext_tpu.config import parse_options
from sfmnext_tpu.training.trainer import Trainer


def main(argv=None):
    opt = parse_options(argv if argv is not None else sys.argv[1:])
    Trainer(opt).train()


if __name__ == "__main__":
    main()
