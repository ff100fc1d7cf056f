"""Fused Pallas InstanceNorm vs the dense XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowfromdepth_tpu.ops.instance_norm import (
    _instance_norm_fwd_pallas, _instance_norm_xla, instance_norm)


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("shape", [(2, 12, 10, 64), (1, 7, 9, 96),
                                   (3, 16, 16, 128)])
def test_pallas_matches_xla(shape, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, shape).astype(np.float32))
    y_ref, m_ref, r_ref = _instance_norm_xla(x, 1e-5, relu)
    y, m, r = _instance_norm_fwd_pallas(x, 1e-5, relu, block=64,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bf16_and_ragged_tiles():
    # HW not a multiple of the block: padding rows must not pollute stats
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 5, 7, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y_ref = _instance_norm_xla(x, 1e-5, False)[0]
    y = _instance_norm_fwd_pallas(x, 1e-5, False, block=16,
                                  interpret=True)[0]
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("relu", [False, True])
def test_custom_vjp_matches_autodiff(relu):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 2, (2, 6, 8, 32)).astype(np.float32))

    def loss_custom(x):
        return jnp.sum(jnp.sin(instance_norm(x, 1e-5, relu)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(_instance_norm_xla(x, 1e-5, relu)[0]))

    g_custom = jax.grad(loss_custom)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_zero_variance_channel_is_finite():
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    y = instance_norm(x)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)
