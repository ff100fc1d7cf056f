"""Sparse bilateral filter: discontinuity map + weighted median semantics."""

import numpy as np
import jax.numpy as jnp

from opticalflowfromdepth_tpu.ops.bilateral import (
    depth_discontinuity, sparse_bilateral_filtering, weighted_median)


def test_weighted_median_simple():
    depth = jnp.asarray([[3.0, 1.0, 2.0, 100.0]])
    coef = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    # sorted by depth: [1, 2, 3, 100], coef [1,1,1,0]/3, cum [.33,.67,1,1]
    # first cum >= 0.5 is index 1 -> value 2
    out = weighted_median(depth, coef)
    assert float(out[0]) == 2.0


def test_weighted_median_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    depth = rng.uniform(1, 100, (50, 9)).astype(np.float32)
    coef = (rng.random((50, 9)) > 0.3).astype(np.float32)
    coef[:, 0] = 1.0  # never all-zero
    got = np.asarray(weighted_median(jnp.asarray(depth), jnp.asarray(coef)))
    for i in range(50):
        order = depth[i].argsort()
        c = coef[i][order] / coef[i].sum()
        cum = np.cumsum(c)
        ind = np.digitize(0.5, cum)
        want = depth[i][order][min(ind, 8)]
        assert got[i] == want, i


def test_discontinuity_map_flags_edges():
    depth = np.full((16, 16), 10.0, np.float32)
    depth[:, 8:] = 50.0  # sharp edge
    disc = np.asarray(depth_discontinuity(jnp.asarray(depth), 0.04))
    # edge columns flagged, flat regions not
    assert disc[5, 7] == 1.0 or disc[5, 8] == 1.0
    assert disc[5, 2] == 0.0 and disc[5, 13] == 0.0


def test_filter_preserves_flat_regions():
    rng = np.random.default_rng(0)
    depth = np.full((24, 24), 20.0, np.float32)
    out = np.asarray(sparse_bilateral_filtering(
        jnp.asarray(depth), filter_sizes=(5, 5)))
    np.testing.assert_allclose(out, 20.0, atol=1e-5)


def test_filter_smooths_isolated_spike_near_edge():
    depth = np.full((24, 24), 10.0, np.float32)
    depth[:, 12:] = 50.0
    depth[6, 11] = 49.0  # spike on the near side of the edge
    out = np.asarray(sparse_bilateral_filtering(
        jnp.asarray(depth), filter_sizes=(7,)))
    # the spike sits in a discontinuity window: median pulls it to a
    # dominant side value
    assert out[6, 11] in (10.0, 50.0)
    # values far from the edge untouched
    assert out[6, 2] == 10.0 and out[6, 21] == 50.0
