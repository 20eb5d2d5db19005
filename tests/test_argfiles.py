"""Every shipped argfile parses, validates, and (flagships) builds.

The reference's model zoo is its args_files/ directory; a config that no
longer parses is a broken product surface (reference train.py:15-23).
"""

import glob
import os

import pytest

from sfmnext_tpu.config import parse_options

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_ARGFILES = sorted(
    glob.glob(os.path.join(REPO, "args_files", "**", "*.txt"), recursive=True)
    + glob.glob(
        os.path.join(REPO, "args_files", "**", "*.config"), recursive=True
    )
    + glob.glob(os.path.join(REPO, "conf", "*.txt"))
)
# reference-finetune-namespace files parse through the ft parser instead
FT_ARGFILES = [p for p in ALL_ARGFILES if os.sep + "ft" + os.sep in p]
OPT_ARGFILES = [p for p in ALL_ARGFILES if p not in FT_ARGFILES]


def test_zoo_is_shipped():
    # the reference ships 28 top-level + hisfog configs; ours must not shrink
    assert len(ALL_ARGFILES) >= 38, sorted(ALL_ARGFILES)


@pytest.mark.parametrize(
    "path", OPT_ARGFILES, ids=[os.path.basename(p) for p in OPT_ARGFILES]
)
def test_argfile_parses_and_validates(path):
    opt = parse_options([path])
    opt.validate()
    # token budget must clear the positional table AND the query count
    h2, w2 = opt.height // 2, opt.width // 2
    n_tokens = (h2 // opt.patch_size) * (w2 // opt.patch_size)
    assert opt.query_nums <= n_tokens <= 500


@pytest.mark.parametrize(
    "path", FT_ARGFILES, ids=[os.path.basename(p) for p in FT_ARGFILES]
)
def test_ft_argfile_parses(path):
    import sys

    sys.path.insert(0, REPO)
    from finetune_metric_depth import parse_ft

    ft_args, rest = parse_ft([path])
    assert ft_args.ft_batch_size == 16  # --bs alias resolved
    assert ft_args.ft_lr == 1e-4
    assert ft_args.ft_input_height == 320
    # every token consumed by one of the two namespaces
    opt = parse_options(rest)
    opt.validate()


@pytest.mark.parametrize(
    "name",
    [
        "args_files/hisfog/kitti/cvnXt_L_320x1024.txt",
        "args_files/hisfog/nyu/ssl_effb5_train.txt",
        "args_files/args_cityscapes_train.txt",
        "args_files/args_kitti_LR_train.txt",
    ],
)
def test_flagship_argfiles_build(name):
    """The flagship configs construct their model bundles."""
    from sfmnext_tpu.training.builder import build_models

    opt = parse_options([os.path.join(REPO, name)]).validate()
    models = build_models(opt, train=True)
    assert models.encoder is not None and models.depth is not None
    if opt.use_rectify_net:
        assert models.rectify is not None
    if "LR" in name:
        assert models.pose is None  # stereo-only: no pose net
