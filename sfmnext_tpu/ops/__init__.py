"""Pure-function compute ops: geometry, warping, image ops, losses, metrics.

Everything here is shape-polymorphic, layout NHWC, and safe to call under
``jax.jit`` / ``shard_map``. No module state, no frozen batch sizes.
"""

from sfmnext_tpu.ops.geometry import (  # noqa: F401
    backproject_depth,
    disp_to_depth,
    euler_to_mat,
    get_translation_matrix,
    pixel_grid,
    pose_vec_to_mat,
    project_3d,
    project_depth,
    quat_to_mat,
    rot_from_axisangle,
    transformation_from_parameters,
)
from sfmnext_tpu.ops.image import (  # noqa: F401
    avg_pool_same,
    reflection_pad_2d,
    resize_bilinear,
    resize_nearest,
    ssim,
)
from sfmnext_tpu.ops.warp import (  # noqa: F401
    grid_sample,
    inverse_rotation_warp,
    inverse_warp,
    warp_frame,
)
from sfmnext_tpu.ops.losses import (  # noqa: F401
    edge_aware_smoothness,
    min_reprojection_loss,
    reprojection_loss,
    silog_loss,
)
from sfmnext_tpu.ops.metrics import compute_depth_errors  # noqa: F401
