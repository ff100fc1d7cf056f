"""Pallas fused 3x3 conv vs XLA oracle (interpret mode) + VJP check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowfromdepth_tpu.ops.conv2d import (
    _conv3x3_s1_pallas, _conv3x3_s1_xla, conv3x3_s1)


@pytest.mark.parametrize("shape,co", [
    ((2, 32, 24, 16), 32),
    ((1, 33, 17, 8), 8),     # H not a multiple of the tile
    ((1, 16, 128, 64), 64),
])
def test_pallas_matches_xla(shape, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, shape[-1], co)
                               ).astype(np.float32))
    want = np.asarray(_conv3x3_s1_xla(x, w))
    got = np.asarray(_conv3x3_s1_pallas(x, w, tile_h=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 32, 32)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 32, 32)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    want = np.asarray(_conv3x3_s1_xla(x, w), np.float32)
    got = np.asarray(_conv3x3_s1_pallas(x, w, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 10, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 8, 16)).astype(np.float32))

    def loss(x, w):
        return jnp.sum(jnp.tanh(conv3x3_s1(x, w)))

    def loss_ref(x, w):
        return jnp.sum(jnp.tanh(_conv3x3_s1_xla(x, w)))

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)
