#!/usr/bin/env python
"""Outdoor self-supervised training CLI.

Public-surface parity with the reference (train.py:15-23):
    python train.py args_files/<config>.txt
A bare .txt positional is expanded as an @argfile.
"""

import sys

from sfmnext_tpu.config import parse_options
from sfmnext_tpu.training.trainer import Trainer


def main(argv=None):
    opt = parse_options(argv if argv is not None else sys.argv[1:])
    Trainer(opt).train()


if __name__ == "__main__":
    main()
