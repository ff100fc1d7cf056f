"""Geometry primitives vs tiny NumPy oracles (SURVEY.md §4 seam 1)."""

import numpy as np
import jax.numpy as jnp

from opticalflowfromdepth_tpu.core import geometry


def _np_rodrigues(vec):
    """NumPy oracle for axis-angle -> 4x4 rotation."""
    vec = vec.reshape(3)
    angle = np.linalg.norm(vec)
    axis = vec / (angle + 1e-7)
    x, y, z = axis
    ca, sa = np.cos(angle), np.sin(angle)
    C = 1 - ca
    R = np.array([
        [x * x * C + ca, x * y * C - z * sa, z * x * C + y * sa],
        [x * y * C + z * sa, y * y * C + ca, y * z * C - x * sa],
        [z * x * C - y * sa, y * z * C + x * sa, z * z * C + ca],
    ])
    out = np.eye(4)
    out[:3, :3] = R
    return out


def test_rot_from_axisangle_matches_rodrigues():
    rng = np.random.default_rng(0)
    for _ in range(5):
        vec = rng.normal(size=(1, 1, 3)).astype(np.float32) * 0.5
        got = np.asarray(geometry.rot_from_axisangle(jnp.asarray(vec)))[0]
        want = _np_rodrigues(vec)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_is_orthonormal():
    vec = jnp.asarray([[[0.1, -0.2, 0.3]]], jnp.float32)
    R = np.asarray(geometry.rot_from_axisangle(vec))[0][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_translation_matrix():
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    T = np.asarray(geometry.get_translation_matrix(t))[0]
    want = np.eye(4)
    want[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(T, want)


def test_transformation_invert_roundtrip():
    ax = jnp.asarray([[[0.05, -0.1, 0.2]]], jnp.float32)
    t = jnp.asarray([[[0.3, -0.4, 0.5]]], jnp.float32)
    T = np.asarray(geometry.transformation_from_parameters(ax, t))[0]
    Ti = np.asarray(
        geometry.transformation_from_parameters(ax, t, invert=True))[0]
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-5)


def test_backproject_project_identity():
    """Identity camera motion must reproject every pixel onto itself."""
    h, w = 12, 17
    rng = np.random.default_rng(1)
    depth = jnp.asarray(
        rng.uniform(1.0, 50.0, size=(1, 1, h, w)).astype(np.float32))
    K = jnp.asarray(np.array([[[0.58 * w, 0, 0.5 * w, 0],
                               [0, 0.58 * h, 0.5 * h, 0],
                               [0, 0, 1, 0],
                               [0, 0, 0, 1]]], np.float32))
    inv_K = jnp.linalg.inv(K)
    points = geometry.backproject_depth(depth, inv_K)
    T = jnp.eye(4)[None]
    pix, z = geometry.project_3d(points, K, T, h, w)
    # back to pixel units
    pix = np.asarray((pix + 1) / 2 * np.array([w - 1, h - 1]))
    grid = np.stack(np.meshgrid(np.arange(w), np.arange(h)), axis=-1)
    np.testing.assert_allclose(pix[0], grid, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z).reshape(1, h, w),
                               np.asarray(depth)[0], rtol=1e-5)


def test_pixel_grid_convention():
    g = np.asarray(geometry.pixel_grid(3, 4))
    assert g.shape == (2, 3, 4)
    assert g[0, 0, 2] == 2  # channel 0 is x
    assert g[1, 2, 0] == 2  # channel 1 is y
