"""Metric-depth finetuning (supervised SILog) subsystem.

Reference: /root/reference/finetune/ — train_ft_SQLdepth.py (AdamW +
OneCycleLR, per-sample median rescale during training, SILog, grad-clip
0.1), dataloader.py (BTS-style kb-crop/rotate/flip/gamma augments),
evaluate_metric_depth.py (flip-TTA, 9 metrics), model_io.py.
"""

from sfmnext_tpu.finetune.trainer import FinetuneTrainer, make_finetune_step  # noqa: F401
from sfmnext_tpu.finetune.dataloader import DepthDataset  # noqa: F401
