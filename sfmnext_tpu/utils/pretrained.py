"""Pretrained monodepth2 model zips: cache-aware fetch + unzip.

Behavioral reference: /root/reference/utils.py:53-117
(download_model_if_doesnt_exist) — the published monodepth2 KITTI
weights used to warm-start / compare. Same model names, URLs, md5
verification, and models/<name>/ layout; additionally honors an offline
cache (a pre-placed zip passes the md5 check and is unzipped without
network), and raises a clear error instead of quit() when offline with
no cache.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import zipfile

# (<google cloud URL>, <md5 checksum>) — reference utils.py:57-86
DOWNLOAD_PATHS = {
    "mono_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_640x192.zip",
         "a964b8356e08a02d009609d9e3928f7c"),
    "stereo_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_640x192.zip",
         "3dfb76bcff0786e4ec07ac00f658dd07"),
    "mono+stereo_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_640x192.zip",
         "c024d69012485ed05d7eaa9617a96b81"),
    "mono_no_pt_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_no_pt_640x192.zip",
         "9c2f071e35027c895a4728358ffc913a"),
    "stereo_no_pt_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_no_pt_640x192.zip",
         "41ec2de112905f85541ac33a854742d1"),
    "mono+stereo_no_pt_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_no_pt_640x192.zip",
         "46c3b824f541d143a45c37df65fbab0a"),
    "mono_1024x320":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_1024x320.zip",
         "0ab0766efdfeea89a0d9ea8ba90e1e63"),
    "stereo_1024x320":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_1024x320.zip",
         "afc2f2126d70cf3fdf26b550898b501a"),
    "mono+stereo_1024x320":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_1024x320.zip",
         "cdc5fc9b23513c07d5b19235d9ef08f7"),
}


def _md5_matches(checksum: str, fpath: str) -> bool:
    if not os.path.exists(fpath):
        return False
    with open(fpath, "rb") as f:
        return hashlib.md5(f.read()).hexdigest() == checksum


def download_model_if_doesnt_exist(model_name: str, models_dir: str = "models"):
    """Ensure models/<name>/encoder.pth exists (download + unzip if not).

    Returns the model directory. The resulting .pth files load through
    utils.torch_port (see tools/ckpt_to_pth.py for the inverse).
    """
    if model_name not in DOWNLOAD_PATHS:
        raise KeyError(
            f"unknown pretrained model {model_name!r}; "
            f"choices: {sorted(DOWNLOAD_PATHS)}"
        )
    os.makedirs(models_dir, exist_ok=True)
    model_path = os.path.join(models_dir, model_name)
    if os.path.exists(os.path.join(model_path, "encoder.pth")):
        return model_path

    model_url, required_md5 = DOWNLOAD_PATHS[model_name]
    zip_path = model_path + ".zip"
    if not _md5_matches(required_md5, zip_path):
        try:
            print(f"-> Downloading pretrained model to {zip_path}")
            urllib.request.urlretrieve(model_url, zip_path)
        except OSError as e:
            raise RuntimeError(
                f"cannot download {model_url} (offline?); place the zip "
                f"at {zip_path} (md5 {required_md5}) and retry"
            ) from e
    if not _md5_matches(required_md5, zip_path):
        raise RuntimeError(
            f"{zip_path} does not match md5 {required_md5} - aborting"
        )
    print("   Unzipping model...")
    with zipfile.ZipFile(zip_path, "r") as f:
        f.extractall(model_path)
    print(f"   Model unzipped to {model_path}")
    return model_path
