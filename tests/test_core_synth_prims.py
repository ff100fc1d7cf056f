"""Conversions, depth hygiene, special flows — distribution/property tests."""

import numpy as np
import jax
import jax.numpy as jnp

from opticalflowfromdepth_tpu.core import convert, depth_utils, special_flow
from opticalflowfromdepth_tpu.core.rng import get_random


def test_get_random_distribution():
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    vals = np.asarray(
        jnp.stack([get_random(k, 2.0, 8.0) for k in keys]))
    mags = np.abs(vals)
    assert mags.min() >= 8.0 and mags.max() <= 10.0
    assert (vals > 0).mean() > 0.35 and (vals > 0).mean() < 0.65


def test_normalize_depth_range_and_sentinel():
    rng = np.random.default_rng(0)
    d = rng.uniform(0.5, 80.0, size=(1, 8, 8)).astype(np.float32)
    d[0, 0, 0] = 0.0      # hole
    d[0, 1, 1] = 150.0    # too far
    out = np.asarray(depth_utils.normalize_depth(jnp.asarray(d)))
    assert out[0, 0, 0] == 100.0 and out[0, 1, 1] == 100.0
    body = np.delete(out.ravel(), [0, 9])
    assert body.min() >= 1.0 - 1e-5 and body.max() <= 99.0 + 1e-4
    # ordering preserved
    flat_in = np.delete(d.ravel(), [0, 9])
    assert np.all(np.argsort(flat_in) == np.argsort(body))


def test_fix_warped_depth():
    d = jnp.asarray(np.array([[[0.0, 50.0, 99.6, 100.0]]], np.float32))
    out = np.asarray(depth_utils.fix_warped_depth(d))
    np.testing.assert_allclose(out, [[[100.0, 50.0, 100.0, 100.0]]])


def test_smooth_closer():
    d = jnp.asarray(np.array([[0.0, 250.0]], np.float32))
    out = np.asarray(depth_utils.smooth_closer(d))
    np.testing.assert_allclose(out, [[1 / 255.0, 1 / 15.0]], rtol=1e-6)


def test_depth_disparity_roundtrip_scale():
    key = jax.random.PRNGKey(1)
    depth = jnp.asarray(np.full((1, 4, 4), 25.0, np.float32))
    disp = convert.depth_to_disparity(key, depth)
    s = float(np.asarray(disp)[0, 0, 0]) * 25.0 / 50.0
    assert 0.8 <= s <= 1.1
    back = convert.disparity_to_depth(disp)
    np.testing.assert_allclose(np.asarray(back), 25.0 / s, rtol=1e-2)


def test_disparity_to_flow_horizontal_only():
    disp = jnp.asarray(np.random.default_rng(2).uniform(
        1, 5, size=(1, 6, 6)).astype(np.float32))
    flow = np.asarray(convert.disparity_to_flow(disp, random_sign=False))
    np.testing.assert_allclose(flow[0], -np.asarray(disp)[0])
    assert np.all(flow[1] == 0)


def test_depth_to_random_flow_zero_motion_is_zero_flow():
    depth = jnp.asarray(np.random.default_rng(3).uniform(
        5, 50, size=(1, 10, 14)).astype(np.float32))
    T_id = jnp.eye(4)[None]
    flow, _ = convert.depth_to_random_flow(jax.random.PRNGKey(0), depth, T1=T_id)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-3)


def test_depth_to_random_flow_translation_parallax():
    """Pure x-translation: closer pixels move more; flow is horizontal."""
    h, w = 12, 16
    depth = np.full((1, h, w), 50.0, np.float32)
    depth[0, :, :8] = 5.0  # near half
    import opticalflowfromdepth_tpu.core.geometry as geom
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 1.0  # translate along x
    flow, _ = convert.depth_to_random_flow(
        jax.random.PRNGKey(0), jnp.asarray(depth), T1=jnp.asarray(T[None]))
    flow = np.asarray(flow)
    assert np.all(np.abs(flow[1]) < 1e-3)  # no vertical flow
    assert np.abs(flow[0, 0, 2]) > np.abs(flow[0, 0, 12])  # near moves more


def test_flip_flow_maps_correctly():
    h, w = 6, 8
    sf, bsf = special_flow.flip_flow(h, w)
    # vertical flip: pixel (x, y) -> (x, h-1-y)
    grid_y = np.arange(h)[:, None]
    np.testing.assert_allclose(np.asarray(sf)[1], (h - 1 - 2 * grid_y) *
                               np.ones((h, w)))
    np.testing.assert_allclose(np.asarray(sf)[0], 0.0)
    np.testing.assert_allclose(np.asarray(bsf), np.asarray(sf))


def test_rotate_flow_properties():
    sf, bsf = special_flow.rotate_flow(jax.random.PRNGKey(4), 16, 16)
    sf, bsf = np.asarray(sf), np.asarray(bsf)
    assert sf.shape == (2, 16, 16)
    # rotation is rigid: flow magnitude grows with distance from pivot but
    # forward and backward flows have equal magnitudes pointwise
    np.testing.assert_allclose(np.linalg.norm(sf, axis=0),
                               np.linalg.norm(bsf, axis=0), atol=1e-3)


def test_shear_flow_structure():
    sf, _ = special_flow.shear_flow(jax.random.PRNGKey(5), 10, 10)
    sf = np.asarray(sf)
    # vertical-displacement shear: dx = 0, dy = s * x
    np.testing.assert_allclose(sf[0], 0.0, atol=1e-6)
    s = sf[1, 0, 1]
    np.testing.assert_allclose(sf[1], s * np.arange(10)[None, :] *
                               np.ones((10, 10)), atol=1e-4)
    assert 0.2 <= abs(s) <= 0.35
