"""Differentiable image warping (grid_sample) and inverse warps.

Behavioral reference:
  - torch ``F.grid_sample(padding_mode='border', align_corners=True)`` as
    used in the reference trainer (trainer.py:431-435),
  - ``inverse_warp`` (layers.py:382-419, SC-Depth style, zeros padding,
    align_corners=False),
  - ``inverse_rotation_warp`` (layers.py:460-479).

TPU-first notes: the bilinear sample is a 4-corner gather over a flattened
spatial axis (`jnp.take_along_axis`), which XLA lowers to a dynamic-gather
that streams from HBM. All shapes are static; padding is handled by index
clamping (border) or per-corner masks (zeros) — no data-dependent control
flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # pixel-coordinate matmuls stay f32

from sfmnext_tpu.ops import geometry


def _gather_2d(img_flat, iy, ix, width: int):
    """Gather pixels: img_flat [B,H*W,C], iy/ix [B,N] int32 -> [B,N,C]."""
    idx = iy * width + ix
    return jnp.take_along_axis(img_flat, idx[..., None], axis=1)


def grid_sample(img, grid, padding_mode: str = "border", align_corners: bool = True):
    """Bilinear sampling of [B,H,W,C] at normalized coords [B,Ho,Wo,2].

    Grid (x, y) in [-1, 1]; matches torch semantics for both
    ``padding_mode`` in {'border','zeros'} and both align_corners modes.
    """
    b, h, w, c = img.shape
    _, oh, ow, _ = grid.shape
    gx = grid[..., 0].reshape(b, -1)
    gy = grid[..., 1].reshape(b, -1)

    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    wx1 = fx - x0f
    wy1 = fy - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def corner(iy, ix):
        cy = jnp.clip(iy, 0, h - 1)
        cx = jnp.clip(ix, 0, w - 1)
        v = _gather_2d(img.reshape(b, h * w, c), cy, cx, w)
        if padding_mode == "zeros":
            inb = (
                (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            ).astype(img.dtype)
            v = v * inb[..., None]
        return v

    out = (
        corner(y0, x0) * (wy0 * wx0)[..., None]
        + corner(y0, x1) * (wy0 * wx1)[..., None]
        + corner(y1, x0) * (wy1 * wx0)[..., None]
        + corner(y1, x1) * (wy1 * wx1)[..., None]
    )
    return out.reshape(b, oh, ow, c)


def warp_frame(src_img, depth, inv_K, K, T, padding_mode: str = "border"):
    """Backproject target depth, transform by T, project, and sample src.

    The main-path view-synthesis warp (trainer.py:423-435):
    grid_sample with border padding, align_corners=True.

    Args:
      src_img: [B,H,W,C] source frame to sample from.
      depth:   [B,H,W,1] target-frame depth.
      inv_K, K: [B,4,4]; T: [B,4,4] target->source.
    Returns:
      (warped [B,H,W,C], pix_coords [B,H,W,2]).
    """
    b, h, w, _ = src_img.shape
    cam_points = geometry.backproject_depth(depth, inv_K)
    pix_coords = geometry.project_3d(cam_points, K, T, h, w)
    warped = grid_sample(src_img, pix_coords, padding_mode=padding_mode, align_corners=True)
    return warped, pix_coords


def _intrinsics_3x3_points(depth, K3):
    """depth [B,H,W,1], K3 [B,3,3] -> cam points [B,3,HW] (kornia depth_to_3d)."""
    b, h, w, _ = depth.shape
    grid = geometry.pixel_grid(h, w, depth.dtype)  # [3,HW]
    invK = jnp.linalg.inv(K3)
    rays = jnp.einsum("bij,jn->bin", invK, grid, precision=_HI)
    return depth.reshape(b, 1, h * w) * rays


def inverse_warp(img, depth, ref_depth, pose, intrinsics, padding_mode: str = "zeros"):
    """SC-Depth bidirectional warp. Reference layers.py:382-419.

    Args:
      img:       [B,H,W,3] source image to sample.
      depth:     [B,H,W,1] target depth D(a).
      ref_depth: [B,H,W,1] source depth D(b).
      pose:      [B,6] (tx,ty,tz,rx,ry,rz) target->source.
      intrinsics:[B,3,3].
    Returns:
      (projected_img, projected_depth, computed_depth), all [B,H,W,*].
    """
    b, h, w, _ = img.shape
    inv_depth = 1.0 / depth
    mean_inv_depth = inv_depth.mean(axis=(1, 2), keepdims=True)  # [B,1,1,1]
    T = geometry.pose_vec_to_mat(pose, mean_inv_depth)  # [B,3,4]
    P = jnp.matmul(intrinsics, T, precision=_HI)[:, :3, :]

    pts = _intrinsics_3x3_points(depth, intrinsics)  # [B,3,HW]
    ones = jnp.ones((b, 1, h * w), dtype=img.dtype)
    world = jnp.concatenate([pts, ones], axis=1)  # [B,4,HW]
    cam_points = jnp.einsum("bij,bjn->bin", P, world, precision=_HI)  # [B,3,HW]

    xy = cam_points[:, :2] / (cam_points[:, 2:3] + 1e-7)
    pix = xy.reshape(b, 2, h, w).transpose(0, 2, 3, 1)
    sx = pix[..., 0] / (w - 1)
    sy = pix[..., 1] / (h - 1)
    coords = jnp.stack([(sx - 0.5) * 2.0, (sy - 0.5) * 2.0], axis=-1)

    computed_depth = cam_points[:, 2].reshape(b, h, w, 1)
    projected_img = grid_sample(img, coords, padding_mode=padding_mode, align_corners=False)
    projected_depth = grid_sample(ref_depth, coords, padding_mode=padding_mode, align_corners=False)
    return projected_img, projected_depth, computed_depth


def inverse_rotation_warp(img, rot, intrinsics, padding_mode: str = "zeros"):
    """Rotation-only rewarp (RectifyNet losses). Reference layers.py:460-479."""
    b, h, w, _ = img.shape
    R = geometry.euler_to_mat(rot)  # [B,3,3]
    P = jnp.matmul(intrinsics, R, precision=_HI)

    ones_depth = jnp.ones((b, h, w, 1), dtype=img.dtype)
    pts = _intrinsics_3x3_points(ones_depth, intrinsics)  # [B,3,HW]
    cam_points = jnp.einsum("bij,bjn->bin", P, pts, precision=_HI)

    xy = cam_points[:, :2] / (cam_points[:, 2:3] + 1e-7)
    pix = xy.reshape(b, 2, h, w).transpose(0, 2, 3, 1)
    sx = pix[..., 0] / (w - 1)
    sy = pix[..., 1] / (h - 1)
    coords = jnp.stack([(sx - 0.5) * 2.0, (sy - 0.5) * 2.0], axis=-1)
    return grid_sample(img, coords, padding_mode=padding_mode, align_corners=True)
