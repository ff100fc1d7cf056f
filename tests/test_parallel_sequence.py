"""Ring streaming-softmax matching vs the dense single-device oracle.

Runs on the virtual 8-device CPU mesh (conftest). The oracle is the dense
einsum path of `models.gmflow.global_correlation_softmax` (flash disabled on
CPU), exactly the reference's matching (`gmflow/matching.py:7-36`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opticalflowfromdepth_tpu.models.gmflow import global_correlation_softmax
from opticalflowfromdepth_tpu.parallel.sequence import (
    ring_softmax_matmul, sharded_global_matching)


def _mesh(n, name="model"):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


@pytest.mark.parametrize("n", [1, 2, 8])
def test_ring_matches_dense_softmax(n):
    rng = np.random.default_rng(0)
    b, l, c, d = 2, 40, 16, 3  # l=40 not divisible by 8: exercises padding
    q = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))

    ref = jax.nn.softmax(
        jnp.einsum("blc,bmc->blm", q, k) / np.sqrt(c), axis=-1) @ v
    got = ring_softmax_matmul(q, k, v, _mesh(n))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_respects_key_mask():
    rng = np.random.default_rng(1)
    b, l, c = 1, 24, 8
    q = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, 2)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(b, l)) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)  # keep at least one key

    scores = jnp.einsum("blc,bmc->blm", q, k) / np.sqrt(c)
    scores = jnp.where(mask[:, None, :] > 0, scores, -jnp.inf)
    ref = jax.nn.softmax(scores, axis=-1) @ v
    got = ring_softmax_matmul(q, k, v, _mesh(8), kmask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sharded_global_matching_matches_model_op():
    rng = np.random.default_rng(2)
    b, h, w, c = 2, 6, 10, 32
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

    # the model op computes in bf16 (MXU policy) — check the ring against it
    # at bf16-level tolerance, and against an f32 dense oracle tightly.
    flow_model, _ = global_correlation_softmax(f0, f1)
    flow_ring, _ = sharded_global_matching(f0, f1, _mesh(8))
    np.testing.assert_allclose(np.asarray(flow_ring), np.asarray(flow_model),
                               rtol=0.05, atol=0.05)

    from opticalflowfromdepth_tpu.core.geometry import pixel_grid
    grid = jnp.moveaxis(pixel_grid(h, w), 0, -1).reshape(h * w, 2)
    corr = jnp.einsum("blc,bmc->blm", f0.reshape(b, -1, c),
                      f1.reshape(b, -1, c)) / np.sqrt(c)
    ref = (jax.nn.softmax(corr, axis=-1) @ grid).reshape(b, h, w, 2) \
        - grid.reshape(1, h, w, 2)
    np.testing.assert_allclose(np.asarray(flow_ring), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ring_is_jittable_and_grad_flows():
    rng = np.random.default_rng(3)
    b, h, w, c = 1, 4, 8, 16
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    mesh = _mesh(8)

    @jax.jit
    def loss(f0, f1):
        flow, _ = sharded_global_matching(f0, f1, mesh)
        return jnp.mean(flow ** 2)

    g0, g1 = jax.grad(loss, argnums=(0, 1))(f0, f1)
    assert np.isfinite(np.asarray(g0)).all()
    assert np.isfinite(np.asarray(g1)).all()
    assert float(jnp.abs(g0).max()) > 0


@pytest.mark.slow
def test_gmflow_forward_seq_parallel_matches_single_device():
    """The REAL GMFlow forward with the token axis sharded on a 2-sized
    model mesh axis must match the unsharded model (VERDICT r2 item 5):
    covers ring global matching, ring flow propagation, and (splits=1)
    ring full attention through the model, not standalone primitives."""
    from opticalflowfromdepth_tpu.models.gmflow import GMFlow

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (2, 32, 48, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (2, 32, 48, 3)).astype(np.float32))

    for splits in (1, 2):
        ref_model = GMFlow(num_scales=1)
        variables = ref_model.init(jax.random.PRNGKey(0), img0, img1,
                                   attn_splits_list=(splits,),
                                   corr_radius_list=(-1,),
                                   prop_radius_list=(-1,))
        ref = ref_model.apply(variables, img0, img1,
                              attn_splits_list=(splits,),
                              corr_radius_list=(-1,),
                              prop_radius_list=(-1,),
                              training=False)["flow_preds"][-1]

        sp_model = GMFlow(num_scales=1, mesh=mesh)
        with mesh:
            got = jax.jit(lambda v, a, b: sp_model.apply(
                v, a, b, attn_splits_list=(splits,),
                corr_radius_list=(-1,), prop_radius_list=(-1,),
                training=False)["flow_preds"][-1])(variables, img0, img1)
        # ring accumulation order differs from the dense softmax; through
        # the sharp random-init softmax + x8 upsampling that yields ~1e-3 px
        # noise (a wrong sharding would be off by O(1) px)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-3, rtol=1e-3,
                                   err_msg=f"splits={splits}")


@pytest.mark.slow
def test_gmflow_train_step_seq_parallel():
    """Full sharded train step with model_parallel=2 on a (4, 2) mesh:
    gradients flow through the ring (ppermute VJP) and the loss is finite."""
    from opticalflowfromdepth_tpu.train.gmflow_train import (
        GMFlowTrainConfig, init_state, make_train_step)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
    h, w = 32, 48
    cfg = GMFlowTrainConfig(image_size=(h, w), num_steps=10, batch_size=4,
                            mixed_precision=False, model_parallel=2)
    state = init_state(cfg, jax.random.PRNGKey(0), mesh)
    rng = np.random.default_rng(0)
    batch = {
        "image1": jnp.asarray(rng.uniform(0, 255, (4, h, w, 3))
                              .astype(np.float32)),
        "image2": jnp.asarray(rng.uniform(0, 255, (4, h, w, 3))
                              .astype(np.float32)),
        "flow": jnp.ones((4, h, w, 2)) * 1.5,
        "valid": jnp.ones((4, h, w)),
        "label": jax.nn.one_hot(jnp.zeros((4,), jnp.int32), 4),
    }
    with mesh:
        sharded = jax.tree.map(lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data"))), batch)
        step = jax.jit(make_train_step(cfg, mesh=mesh))
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
        jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["total_loss"]))
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params, new_state.params)
    assert max(jax.tree.leaves(delta)) > 0


@pytest.mark.slow
def test_swin_window_attention_sharded_matches_replicated(monkeypatch):
    """VERDICT r3 item 6: with a (data, model) mesh the splits=2 Swin
    window path shards the window-batch axis under shard_map (flash
    kernels in interpret mode) and matches the replicated flash path —
    including shifted layers, whose in-kernel analytic mask depends on
    window phase (preserved by B-major chunking)."""
    from opticalflowfromdepth_tpu.models.gmflow import (
        _split_window_attention)

    monkeypatch.setenv("OFD_FLASH", "interpret")
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(0)
    b, h, w, c = 8, 16, 24, 32   # 2B=8 windows batch, divisible by 8
    q = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))

    for with_shift in (False, True):
        ref = _split_window_attention(q, k, v, 2, with_shift, h, w, None)
        with mesh:
            got = jax.jit(lambda a, bb, cc: _split_window_attention(
                a, bb, cc, 2, with_shift, h, w, None, mesh=mesh))(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"with_shift={with_shift}")


def test_window_shard_axes_divisibility():
    from opticalflowfromdepth_tpu.models.gmflow import _window_shard_axes

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    # shifted: needs batch % 8
    assert _window_shard_axes(mesh, 8, 32, True) == ("data", "model")
    assert _window_shard_axes(mesh, 4, 16, True) is None
    # non-shifted: needs num_windows % 8
    assert _window_shard_axes(mesh, 4, 16, False) == (
        "data", "model")
    assert _window_shard_axes(mesh, 1, 4, False) is None


@pytest.mark.slow
def test_swin_window_attention_sharded_gradients(monkeypatch):
    """Gradients through the sharded window path (shard_map + flash
    custom-VJP backward kernels) must match the replicated path for both
    shifted and non-shifted layers."""
    from opticalflowfromdepth_tpu.models.gmflow import (
        _split_window_attention)

    monkeypatch.setenv("OFD_FLASH", "interpret")
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(1)
    b, h, w, c = 8, 16, 24, 16
    q = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))

    for with_shift in (False, True):
        def loss(args, mesh_arg):
            qq, kk, vv = args
            out = _split_window_attention(qq, kk, vv, 2, with_shift, h, w,
                                          None, mesh=mesh_arg)
            return jnp.sum(out.astype(jnp.float32) * cot)

        g_ref = jax.grad(loss)((q, k, v), None)
        with mesh:
            g_got = jax.jit(jax.grad(loss), static_argnums=1)((q, k, v),
                                                              mesh)
        for name, a, bb in zip("qkv", g_ref, g_got):
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(a), atol=1e-5, rtol=1e-5,
                err_msg=f"grad {name} with_shift={with_shift}")
