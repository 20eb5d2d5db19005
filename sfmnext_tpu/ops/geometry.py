"""Camera geometry as pure JAX functions.

Behavioral reference: /root/reference/layers.py (SQLdepth):
  - disp_to_depth            layers.py:51-60
  - rot_from_axisangle       layers.py:111-150
  - get_translation_matrix   layers.py:95-108
  - transformation_from_parameters  layers.py:75-92
  - BackprojectDepth         layers.py:186-215  (here: shape-polymorphic fn)
  - Project3D                layers.py:236-258
  - ProjectDepth             layers.py:217-234
  - euler2mat / pose_vec2mat / quat2mat  layers.py:422-520

Design notes (TPU-first):
  * No frozen batch-size buffers — pixel grids are computed on the fly and
    constant-folded by XLA under jit.
  * Layout: images / depth are NHWC ([B,H,W,1] for depth); point clouds are
    kept as [B, 3|4, H*W] so K/T application is a batched (4x4)x(4xHW)
    matmul that XLA maps onto the MXU.
  * Everything works in float32; callers may cast inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pixel-coordinate math must stay in f32 on the MXU (default TPU matmul
# precision is bf16, which shifts warp coordinates by ~1e-3 of the frame).
_HI = jax.lax.Precision.HIGHEST


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Sigmoid-disparity to (scaled_disp, depth). Reference layers.py:51-60."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec):
    """Axis-angle [B,3] -> rotation as 4x4 homogeneous matrix [B,4,4].

    Rodrigues formula, matching reference layers.py:111-150 (which takes
    [B,1,3]; we take [B,3]).
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [B,1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs,    zxC + ys,    zeros,
            xyC + zs,    y * yC + ca, yzC - xs,    zeros,
            zxC - ys,    yzC + xs,    z * zC + ca, zeros,
            zeros,       zeros,       zeros,       ones,
        ],
        axis=-1,
    )
    return rot.reshape(vec.shape[0], 4, 4)


def get_translation_matrix(t):
    """Translation [B,3] -> homogeneous 4x4 [B,4,4]. Reference layers.py:95-108."""
    b = t.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (b, 4, 4))
    return eye.at[:, :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axis-angle [B,3], translation [B,3]) -> SE(3) [B,4,4].

    Matches reference layers.py:75-92 including the invert path used for
    backward-in-time frames: R^T composed after negated translation.
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.matmul(R, T, precision=_HI)
    return jnp.matmul(T, R, precision=_HI)


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Homogeneous pixel coordinates [3, H*W] in (x, y, 1) order.

    Replaces the batch-frozen buffers of reference layers.py:189-208.
    Constant-folded under jit.
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # each [H,W]
    ones = jnp.ones((height * width,), dtype=dtype)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), ones], axis=0)


def backproject_depth(depth, inv_K):
    """Depth map -> homogeneous camera-frame points.

    Args:
      depth: [B,H,W,1] (or [B,H,W]) depth map.
      inv_K: [B,4,4] inverse intrinsics (pixel -> ray).
    Returns:
      cam_points [B,4,H*W]. Reference layers.py:210-215.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)  # [3, HW]
    rays = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], grid, precision=_HI)  # [B,3,HW]
    pts = depth.reshape(b, 1, h * w) * rays
    ones = jnp.ones((b, 1, h * w), dtype=depth.dtype)
    return jnp.concatenate([pts, ones], axis=1)


def project_3d(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Project homogeneous cam points into another camera.

    Args:
      points: [B,4,H*W] from :func:`backproject_depth`.
      K: [B,4,4] intrinsics; T: [B,4,4] extrinsics (cam_T_cam).
    Returns:
      pix_coords [B,H,W,2] normalized to [-1,1] (grid_sample convention).
    Reference layers.py:247-258.
    """
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]
    cam_points = jnp.einsum("bij,bjn->bin", P, points, precision=_HI)  # [B,3,HW]
    xy = cam_points[:, :2] / (cam_points[:, 2:3] + eps)  # [B,2,HW]
    b = points.shape[0]
    pix = xy.reshape(b, 2, height, width).transpose(0, 2, 3, 1)  # [B,H,W,2]
    sx = pix[..., 0] / (width - 1)
    sy = pix[..., 1] / (height - 1)
    return jnp.stack([(sx - 0.5) * 2.0, (sy - 0.5) * 2.0], axis=-1)


def project_depth(points, K, T, height: int, width: int):
    """Project points and return the z (depth) channel as [B,H,W,1].

    Reference layers.py:228-234 (indoor geometry-consistency loss).
    """
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]
    cam_points = jnp.einsum("bij,bjn->bin", P, points, precision=_HI)
    b = points.shape[0]
    return cam_points[:, 2].reshape(b, height, width, 1)


def euler_to_mat(angle):
    """Euler angles [B,3] (x,y,z) -> rotation matrix [B,3,3].

    Rotation order matches reference layers.py:422-457: R = Rx @ Ry @ Rz.
    """
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    zmat = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    ymat = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=1
    ).reshape(-1, 3, 3)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=1
    ).reshape(-1, 3, 3)
    return jnp.matmul(jnp.matmul(xmat, ymat, precision=_HI), zmat, precision=_HI)


def quat_to_mat(quat):
    """Quaternion (x,y,z with implied w for unit norm) [B,3] -> [B,3,3].

    Reference layers.py:499-520.
    """
    w = jnp.ones_like(quat[:, :1])
    q = jnp.concatenate([w, quat], axis=1)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz,   2 * wy + 2 * xz,
            2 * wz + 2 * xy,   w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy,   2 * wx + 2 * yz,   w2 - x2 - y2 + z2,
        ],
        axis=1,
    ).reshape(-1, 3, 3)


def pose_vec_to_mat(vec, mean_inv_depth, rotation_mode: str = "euler"):
    """6-DoF pose vector [B,6] (tx,ty,tz,rx,ry,rz) -> [B,3,4].

    Translation is scaled by the mean inverse depth (SC-Depth convention),
    reference layers.py:481-497.
    """
    translation = vec[:, :3, None] * mean_inv_depth[:, 0]  # [B,3,1]
    rot = vec[:, 3:]
    if rotation_mode == "euler":
        rot_mat = euler_to_mat(rot)
    elif rotation_mode == "quat":
        rot_mat = quat_to_mat(rot)
    else:
        raise ValueError(f"unknown rotation_mode {rotation_mode!r}")
    return jnp.concatenate([rot_mat, translation], axis=2)
