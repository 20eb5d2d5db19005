"""Misc helpers mirroring reference utils.py.

readlines (:13-17), sec_to_hm/sec_to_hm_str (:28-45), normalize_image
(:20-25), download_model_if_doesnt_exist (:53-117 — stubbed: this
environment is zero-egress; point --load_pt_folder at local weights).
"""

from __future__ import annotations

import jax.numpy as jnp

from sfmnext_tpu.data.mono_dataset import read_lines as readlines  # noqa: F401
from sfmnext_tpu.utils.logging import sec_to_hm_str  # noqa: F401


def sec_to_hm(t: float):
    t = int(t)
    s = t % 60
    t //= 60
    return t // 60, t % 60, s


def normalize_image(x):
    """Rescale to [0,1] for visualization (reference utils.py:20-25)."""
    ma = jnp.max(x)
    mi = jnp.min(x)
    return (x - mi) / (ma - mi + 1e-5)


def download_model_if_doesnt_exist(model_name: str):
    raise RuntimeError(
        "pretrained-zoo download is unavailable (zero-egress environment); "
        "place reference .pth files locally and pass --load_pt_folder "
        f"(requested: {model_name!r})"
    )
