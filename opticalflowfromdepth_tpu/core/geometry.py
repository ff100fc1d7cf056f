"""Pinhole-camera geometry primitives (pure jnp).

Functional re-design of the reference's torch modules
(`/root/reference/geometry.py:17-153`, originally from monodepth2):

  * :func:`pixel_grid`            — the (x, y) identity coordinate grid
  * :func:`backproject_depth`     — depth map -> homogeneous camera points
  * :func:`project_3d`            — camera points -> normalized pixel coords
  * :func:`rot_from_axisangle`    — axis-angle -> 4x4 rotation (Rodrigues)
  * :func:`get_translation_matrix`— translation -> 4x4 matrix
  * :func:`transformation_from_parameters` — (axisangle, t) -> SE(3)

Conventions (identical to the reference):
  * pixel coordinates are (x, y) with x along width, y along height;
  * flow fields are channel-first [2, H, W] with channel 0 = x-flow;
  * projected coordinates are normalized to [-1, 1] over (W-1, H-1).

Everything here is shape-static, differentiable, f32, and safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST  # geometry matmuls are tiny; keep them exact f32


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity pixel-coordinate grid, shape [2, H, W]; grid[0]=x, grid[1]=y.

    Matches ``torch.meshgrid(arange(w), arange(h), indexing='xy')`` stacked on
    axis 0 (reference `geometry.py:27-28`, `alt_cuda/fw.py:27-29`).
    """
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    gx, gy = jnp.meshgrid(x, y, indexing="xy")  # each [H, W]
    return jnp.stack([gx, gy], axis=0)


def pixel_grid_last(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity pixel grid with channels last, shape [H, W, 2] (x, y)."""
    return jnp.moveaxis(pixel_grid(h, w, dtype), 0, -1)


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Lift a depth map to homogeneous 3-D camera points.

    Args:
      depth: [B, 1, H, W] (or [B, H, W]) metric depth.
      inv_K: [B, 4, 4] inverse intrinsics.

    Returns:
      cam_points: [B, 4, H*W] homogeneous points (x, y, z, 1).

    Reference: `geometry.py:37-42` (BackprojectDepth.forward).
    """
    if depth.ndim == 3:
        depth = depth[:, None]
    b, _, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype).reshape(2, h * w)  # [2, HW]
    ones = jnp.ones((1, h * w), depth.dtype)
    pix = jnp.concatenate([grid, ones], axis=0)  # [3, HW]
    pix = jnp.broadcast_to(pix[None], (b, 3, h * w))
    cam = jnp.einsum("bij,bjk->bik", inv_K[:, :3, :3], pix, precision=_HI)
    cam = depth.reshape(b, 1, h * w) * cam
    ones_b = jnp.ones((b, 1, h * w), depth.dtype)
    return jnp.concatenate([cam, ones_b], axis=1)


def project_3d(points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray,
               h: int, w: int, eps: float = 1e-7):
    """Project homogeneous camera points through K @ T.

    Args:
      points: [B, 4, H*W] homogeneous points.
      K, T:   [B, 4, 4].
      h, w:   image size (static).

    Returns:
      (pix_coords, z) where pix_coords is [B, H, W, 2] normalized to [-1, 1]
      ((x, y) order) and z is [B, 1, H*W] projected depth.

    Reference: `geometry.py:56-67` (Project3D.forward).
    """
    b = points.shape[0]
    P = jnp.einsum("bij,bjk->bik", K, T, precision=_HI)[:, :3, :]  # [B, 3, 4]
    cam = jnp.einsum("bij,bjk->bik", P, points, precision=_HI)  # [B, 3, HW]
    z = cam[:, 2:3, :]
    pix = cam[:, :2, :] / (z + eps)  # [B, 2, HW]
    pix = pix.reshape(b, 2, h, w).transpose(0, 2, 3, 1)  # [B, H, W, 2]
    scale = jnp.asarray([w - 1, h - 1], pix.dtype)
    pix = (pix / scale - 0.5) * 2.0
    return pix, z


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Translation vector [B, 3] (or [B, 1, 3]) -> [B, 4, 4].

    Reference: `geometry.py:91-105`.
    """
    t = t.reshape(-1, 3)
    b = t.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype)[None], (b, 4, 4))
    return T.at[:, :3, 3].set(t)


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [B, 1, 3] -> [B, 4, 4] rotation (Rodrigues formula).

    Reference: `geometry.py:108-153`.
    """
    vec = vec.reshape(-1, 1, 3)
    angle = jnp.linalg.norm(vec, axis=2, keepdims=True)  # [B, 1, 1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]  # [B, 1]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x = axis[..., 0]  # [B, 1]
    y = axis[..., 1]
    z = axis[..., 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    def s(v):
        return v[:, 0]

    b = vec.shape[0]
    rot = jnp.zeros((b, 4, 4), vec.dtype)
    rot = rot.at[:, 0, 0].set(s(x * xC + ca))
    rot = rot.at[:, 0, 1].set(s(xyC - zs))
    rot = rot.at[:, 0, 2].set(s(zxC + ys))
    rot = rot.at[:, 1, 0].set(s(xyC + zs))
    rot = rot.at[:, 1, 1].set(s(y * yC + ca))
    rot = rot.at[:, 1, 2].set(s(yzC - xs))
    rot = rot.at[:, 2, 0].set(s(zxC - ys))
    rot = rot.at[:, 2, 1].set(s(yzC + xs))
    rot = rot.at[:, 2, 2].set(s(z * zC + ca))
    rot = rot.at[:, 3, 3].set(1.0)
    return rot


def transformation_from_parameters(axisangle: jnp.ndarray,
                                   translation: jnp.ndarray,
                                   invert: bool = False) -> jnp.ndarray:
    """(axisangle [B, 1, 3], translation [B, 1, 3]) -> SE(3) [B, 4, 4].

    Reference: `geometry.py:70-88`.
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.einsum("bij,bjk->bik", R, T, precision=_HI)
    return jnp.einsum("bij,bjk->bik", T, R, precision=_HI)
