#!/usr/bin/env python
"""KITTI depth evaluation CLI (reference evaluate_depth_config.py:286-296).

    python evaluate_depth_config.py args_files/<config>.txt
"""

import sys

from sfmnext_tpu.config import parse_options
from sfmnext_tpu.evaluation import evaluate


def main(argv=None):
    opt = parse_options(argv if argv is not None else sys.argv[1:])
    evaluate(opt)


if __name__ == "__main__":
    main()
