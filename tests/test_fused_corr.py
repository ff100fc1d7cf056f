"""Fused Pallas correlation lookup vs the CorrPyramid oracle.

Forward parity and — the point of the kernel — gradient parity of the
hand-written backward against XLA's derived VJP of the indicator-matmul
path, on CPU via interpret mode (SURVEY §4 seam 2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.ops.correlation import CorrPyramid
from opticalflowfromdepth_tpu.ops.fused_corr import fused_corr_lookup


def _inputs(b=2, h=12, w=16, c=32, seed=0, spread=6.0):
    rng = np.random.default_rng(seed)
    f1 = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    # coords around the identity grid +- spread px, incl. out-of-range
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([xx, yy], -1)[None].repeat(b, 0)
    coords = jnp.asarray(
        base + rng.uniform(-spread, spread, (b, h, w, 2)).astype(np.float32))
    return f1, f2, coords


@pytest.mark.parametrize("levels,radius", [(4, 4), (2, 3)])
def test_fused_forward_matches_pyramid(levels, radius):
    f1, f2, coords = _inputs()
    ref = CorrPyramid(f1, f2, levels, radius)(coords)
    got = fused_corr_lookup(f1, f2, coords, levels, radius,
                            jnp.float32, 64, True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_forward_far_out_of_range():
    """Centers far outside the level match zero taps (zero padding)."""
    f1, f2, coords = _inputs(spread=0.0)
    coords = coords + 1000.0
    got = fused_corr_lookup(f1, f2, coords, 4, 4, jnp.float32, 64, True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_fused_gradients_match_xla_vjp():
    f1, f2, coords = _inputs(b=2, h=10, w=12, c=16, seed=3)
    levels, radius = 4, 4

    def loss_ref(f1, f2):
        out = CorrPyramid(f1, f2, levels, radius)(coords)
        return jnp.sum(jnp.sin(out))      # non-trivial cotangent

    def loss_fused(f1, f2):
        out = fused_corr_lookup(f1, f2, coords, levels, radius,
                                jnp.float32, 64, True)
        return jnp.sum(jnp.sin(out))

    g1r, g2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    g1f, g2f = jax.grad(loss_fused, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1f), np.asarray(g1r),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2r),
                               atol=5e-5, rtol=5e-4)


def test_fused_gradients_bf16_close_to_f32():
    """bf16 kernel grads track the f32 XLA path within bf16 tolerance."""
    f1, f2, coords = _inputs(b=1, h=8, w=8, c=16, seed=5, spread=3.0)

    def loss_ref(f1, f2):
        out = CorrPyramid(f1, f2, 2, 2, dtype=jnp.float32)(coords)
        return jnp.sum(out * 0.01)

    def loss_fused(f1, f2):
        out = fused_corr_lookup(f1, f2, coords, 2, 2,
                                jnp.bfloat16, 64, True)
        return jnp.sum(out.astype(jnp.float32) * 0.01)

    g1r, g2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    g1f, g2f = jax.grad(loss_fused, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1f), np.asarray(g1r),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2r),
                               atol=2e-2, rtol=2e-2)


def test_fused_query_padding():
    """N not divisible by block_q: padded queries must not corrupt
    outputs or gradients."""
    f1, f2, coords = _inputs(b=1, h=6, w=9, c=8, seed=7)  # N=54, block 64

    def loss(f1, f2):
        return jnp.sum(fused_corr_lookup(f1, f2, coords, 2, 2,
                                         jnp.float32, 64, True) ** 2)

    def loss_ref(f1, f2):
        return jnp.sum(CorrPyramid(f1, f2, 2, 2)(coords) ** 2)

    np.testing.assert_allclose(float(loss(f1, f2)),
                               float(loss_ref(f1, f2)), rtol=1e-5)
    g1f, g2f = jax.grad(loss, argnums=(0, 1))(f1, f2)
    g1r, g2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1f), np.asarray(g1r),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2r),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_fused_corr_under_sharded_mesh():
    """The fused path must produce the same losses as the pyramid path
    when the train step runs pjit-sharded over the 8-device CPU mesh
    (GSPMD treats the pallas call as replicated — correctness must hold
    regardless of partitioning choices)."""
    from opticalflowfromdepth_tpu.parallel.mesh import make_mesh, shard_batch
    from opticalflowfromdepth_tpu.train import raft_train as rt

    rng = np.random.default_rng(0)
    b, h, w = 8, 32, 48
    batch = {
        "image1": jnp.asarray(
            rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "image2": jnp.asarray(
            rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "flow": jnp.asarray(
            rng.normal(0, 4, (b, h, w, 2)).astype(np.float32)),
        "valid": jnp.ones((b, h, w), np.float32),
        "label": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
                          (b, 1)),
    }
    losses = {}
    mesh = make_mesh()
    with mesh:
        for impl in ("pyramid", "fused"):
            cfg = rt.RAFTTrainConfig(
                small=True, iters=2, batch_size=b, image_size=(h, w),
                mixed_precision=False, corr_impl=impl)
            state = rt.init_state(cfg, jax.random.PRNGKey(0))
            step = jax.jit(rt.make_train_step(cfg))
            seq = []
            for i in range(2):
                state, m = step(state, shard_batch(mesh, batch),
                                jax.random.PRNGKey(i))
                seq.append(float(m["total_loss"]))
            losses[impl] = seq
    np.testing.assert_allclose(losses["fused"], losses["pyramid"],
                               rtol=1e-4)
