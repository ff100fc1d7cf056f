"""forward_warp vs a serial NumPy z-buffer oracle.

The oracle mirrors the CUDA kernel's exact visitation semantics
(`alt_cuda/fw_cuda_kernel.cu:25-49`): raster-order scan, strict < depth test
against a 1000-initialized z-buffer, valid set on every hit, collision from
the z-buffer state at the final visit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.ops.forward_warp import (
    back_flow, concat_flow, forward_warp)


def np_forward_warp(obj, flow, depth):
    c, h, w = obj.shape
    out = np.zeros_like(obj)
    dlut = np.full((h, w), 1000.0, np.float32)
    valid = np.zeros((1, h, w), np.float32)
    collision = np.zeros((1, h, w), np.float32)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    px = np.clip(gx + flow[0], 0, w - 1).astype(np.int64)
    py = np.clip(gy + flow[1], 0, h - 1).astype(np.int64)
    for j in range(h):
        for i in range(w):
            x, y = px[j, i], py[j, i]
            if depth[0, j, i] < dlut[y, x]:
                out[:, y, x] = obj[:, j, i]
                dlut[y, x] = depth[0, j, i]
            valid[0, y, x] = 1
            collision[0, y, x] = 0.0 if dlut[y, x] != 1000.0 else 1.0
    return out, valid, collision


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_warp_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    h, w, c = 13, 19, 4
    obj = rng.normal(size=(c, h, w)).astype(np.float32)
    flow = rng.uniform(-6, 6, size=(2, h, w)).astype(np.float32)
    depth = rng.uniform(1, 100, size=(1, h, w)).astype(np.float32)

    want = np_forward_warp(obj, flow, depth)
    got = forward_warp(jnp.asarray(obj), jnp.asarray(flow), jnp.asarray(depth))
    for g, wnt, name in zip(got, want, ["output", "valid", "collision"]):
        np.testing.assert_allclose(np.asarray(g), wnt, atol=1e-6, err_msg=name)


def test_forward_warp_depth_ties_break_by_raster_order():
    """Equal depths: the first raster-order writer must win (strict <)."""
    rng = np.random.default_rng(3)
    h, w, c = 9, 11, 2
    obj = rng.normal(size=(c, h, w)).astype(np.float32)
    # integer flows with many collisions, constant depth => all ties
    flow = rng.integers(-4, 5, size=(2, h, w)).astype(np.float32)
    depth = np.full((1, h, w), 7.0, np.float32)
    want = np_forward_warp(obj, flow, depth)
    got = forward_warp(jnp.asarray(obj), jnp.asarray(flow), jnp.asarray(depth))
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), wnt, atol=1e-6)


def test_forward_warp_zero_flow_is_identity():
    rng = np.random.default_rng(4)
    obj = rng.normal(size=(3, 8, 8)).astype(np.float32)
    flow = np.zeros((2, 8, 8), np.float32)
    depth = rng.uniform(1, 99, size=(1, 8, 8)).astype(np.float32)
    out, valid, collision = forward_warp(
        jnp.asarray(obj), jnp.asarray(flow), jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(out), obj, atol=1e-6)
    assert np.all(np.asarray(valid) == 1)
    assert np.all(np.asarray(collision) == 0)


def test_forward_warp_constant_depth_translation_is_permutation():
    """SURVEY.md §5.2 property: integer shift at constant depth permutes."""
    obj = np.arange(5 * 6, dtype=np.float32).reshape(1, 5, 6)
    flow = np.zeros((2, 5, 6), np.float32)
    flow[0] = 2.0  # shift right by 2
    depth = np.full((1, 5, 6), 3.0, np.float32)
    out, valid, _ = forward_warp(
        jnp.asarray(obj), jnp.asarray(flow), jnp.asarray(depth))
    out = np.asarray(out)
    # interior columns shifted; cols 0..1 are holes except clamped edge writes
    np.testing.assert_allclose(out[0, :, 2:6], obj[0, :, 0:4])
    assert np.all(np.asarray(valid)[0, :, 2:6] == 1)
    assert np.all(np.asarray(valid)[0, :, 0:2] == 0)


def test_concat_and_back_flow_shapes_and_masks():
    rng = np.random.default_rng(5)
    h, w = 10, 12
    f_ab = jnp.asarray(rng.uniform(-3, 3, size=(2, h, w)).astype(np.float32))
    f_bc = jnp.asarray(rng.uniform(-3, 3, size=(2, h, w)).astype(np.float32))
    bf_ab = -f_ab
    depth = jnp.asarray(rng.uniform(1, 99, size=(1, h, w)).astype(np.float32))
    cf, v1 = concat_flow(f_ab, bf_ab, f_bc, depth)
    bk, v2 = back_flow(f_ab, depth)
    assert cf.shape == (2, h, w) and bk.shape == (2, h, w)
    for v in (v1, v2):
        v = np.asarray(v)
        assert set(np.unique(v)).issubset({0.0, 1.0})
    # masked outputs must be zero outside the valid mask
    assert np.all(np.asarray(cf)[:, np.asarray(v1)[0] == 0] == 0)


@pytest.mark.parametrize("horizontal", [False, True])
@pytest.mark.parametrize("seed", [0, 3])
def test_flip_fast_path_exact(horizontal, seed):
    """forward_warp_flip == forward_warp along the flip special flow,
    including the depth>=1000 no-write / collision semantics."""
    from opticalflowfromdepth_tpu.core.special_flow import flip_flow
    from opticalflowfromdepth_tpu.ops.forward_warp import forward_warp_flip

    rng = np.random.default_rng(seed)
    h, w, c = 11, 17, 5
    obj = rng.normal(size=(c, h, w)).astype(np.float32)
    depth = rng.uniform(1, 100, size=(1, h, w)).astype(np.float32)
    depth[0, rng.integers(0, h, 7), rng.integers(0, w, 7)] = 1000.0

    sf, _ = flip_flow(h, w, horizontal=horizontal)
    want = forward_warp(jnp.asarray(obj), sf, jnp.asarray(depth))
    got = forward_warp_flip(jnp.asarray(obj), jnp.asarray(depth),
                            horizontal=horizontal)
    for g, wnt, name in zip(got, want, ["output", "valid", "collision"]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wnt),
                                      err_msg=name)
