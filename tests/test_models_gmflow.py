"""GMFlow model: window utilities, matching oracles, forward shapes, train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.models.gmflow import (
    GMFlow, global_correlation_softmax, local_correlation_softmax,
    merge_splits, position_embedding_sine, split_feature,
    shift_window_attn_mask)
from opticalflowfromdepth_tpu.train.gmflow_train import (
    GMFlowTrainConfig, init_state, make_train_step)


def test_split_merge_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    for k in (1, 2, 4):
        y = merge_splits(split_feature(x, k), k)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_split_feature_window_content():
    """Window (0,0) of a k=2 split is the top-left quadrant."""
    x = jnp.arange(1 * 4 * 6 * 1, dtype=jnp.float32).reshape(1, 4, 6, 1)
    s = split_feature(x, 2)
    assert s.shape == (4, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(s[0, :, :, 0]),
                                  np.asarray(x[0, :2, :3, 0]))


def test_global_correlation_softmax_identity():
    """With feature1 == feature0 strongly self-similar, flow ~ 0."""
    rng = np.random.default_rng(1)
    f = rng.normal(size=(1, 6, 8, 32)).astype(np.float32) * 10.0
    flow, prob = global_correlation_softmax(jnp.asarray(f), jnp.asarray(f))
    assert flow.shape == (1, 6, 8, 2)
    # softmax argmax should be the pixel itself -> near-zero flow
    assert float(jnp.abs(flow).max()) < 0.15
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-5)


def test_global_correlation_softmax_shift():
    """feature1 = feature0 rolled by +2 in x => flow_x ~ +2 in the interior."""
    rng = np.random.default_rng(2)
    f0 = rng.normal(size=(1, 8, 16, 64)).astype(np.float32) * 5.0
    f1 = np.roll(f0, 2, axis=2)
    flow, _ = global_correlation_softmax(jnp.asarray(f0), jnp.asarray(f1))
    interior = np.asarray(flow)[0, :, 2:-2]
    np.testing.assert_allclose(interior[..., 0], 2.0, atol=0.2)
    np.testing.assert_allclose(interior[..., 1], 0.0, atol=0.2)


def test_local_correlation_softmax_shift():
    rng = np.random.default_rng(3)
    f0 = rng.normal(size=(1, 8, 16, 64)).astype(np.float32) * 5.0
    f1 = np.roll(f0, 1, axis=2)
    flow, _ = local_correlation_softmax(jnp.asarray(f0), jnp.asarray(f1), 2)
    interior = np.asarray(flow)[0, :, 1:-1]
    np.testing.assert_allclose(interior[..., 0], 1.0, atol=0.2)


def test_shift_window_mask_shape():
    m = shift_window_attn_mask(8, 8, 4, 4, 2, 2)
    assert m.shape == (4, 16, 16)
    # mask values are 0 or -100
    vals = np.unique(np.asarray(m))
    assert set(vals.tolist()) <= {0.0, -100.0}


def test_position_embedding_shape_and_range():
    pos = position_embedding_sine(6, 9, 64)
    assert pos.shape == (6, 9, 128)
    assert float(jnp.abs(pos).max()) <= 1.0 + 1e-6


@pytest.mark.parametrize("scales,splits,corr,prop", [
    (1, (2,), (-1,), (-1,)),
    (2, (2, 2), (-1, 4), (-1, 1)),
])
@pytest.mark.slow
def test_gmflow_forward_shapes(scales, splits, corr, prop):
    # 2-scale ("with refine") runs its final scale at 1/4 resolution, so
    # upsample_factor is 4 (`scripts/train_gmflow_with_refine.sh`).
    model = GMFlow(num_scales=scales, upsample_factor=8 // scales)
    b, h, w = 1, 64, 96
    img = jnp.zeros((b, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), img, img,
                           attn_splits_list=splits, corr_radius_list=corr,
                           prop_radius_list=prop)
    out = model.apply(variables, img, img, attn_splits_list=splits,
                      corr_radius_list=corr, prop_radius_list=prop)
    preds = out["flow_preds"]
    assert len(preds) == 2 * scales  # matching + propagation/upsample per scale
    for p in preds:
        assert p.shape == (b, h, w, 2)


@pytest.mark.slow
def test_gmflow_bidir_flow():
    model = GMFlow(num_scales=1)
    b, h, w = 1, 32, 48
    img0 = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (b, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (b, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img0, img1)
    out = model.apply(variables, img0, img1, pred_bidir_flow=True,
                      training=False)
    final = out["flow_preds"][-1]
    assert final.shape == (2 * b, h, w, 2)  # fwd + bwd stacked on batch


@pytest.mark.slow
def test_gmflow_train_step_decreases_loss():
    h, w = 32, 48
    cfg = GMFlowTrainConfig(image_size=(h, w), num_steps=50,
                            mixed_precision=False, lr=3e-4)
    state = init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "image1": jnp.asarray(rng.uniform(0, 255, (2, h, w, 3))
                              .astype(np.float32)),
        "image2": jnp.asarray(rng.uniform(0, 255, (2, h, w, 3))
                              .astype(np.float32)),
        "flow": jnp.ones((2, h, w, 2)) * 1.5,
        "valid": jnp.ones((2, h, w)),
        "label": jax.nn.one_hot(jnp.zeros((2,), jnp.int32), 4),
    }
    step = jax.jit(make_train_step(cfg))
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # optimization makes progress (strict monotonicity is not guaranteed
    # for a random-init transformer under a OneCycle ramp)
    assert min(losses[1:]) < losses[0]


@pytest.mark.slow
def test_gmflow_train_step_nan_skip():
    h, w = 32, 48
    cfg = GMFlowTrainConfig(image_size=(h, w), num_steps=50,
                            mixed_precision=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    bad = {
        "image1": jnp.full((1, h, w, 3), jnp.nan),
        "image2": jnp.zeros((1, h, w, 3)),
        "flow": jnp.zeros((1, h, w, 2)),
        "valid": jnp.ones((1, h, w)),
        "label": jax.nn.one_hot(jnp.zeros((1,), jnp.int32), 4),
    }
    step = jax.jit(make_train_step(cfg))
    new_state, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped_nan"]) == 1.0
    # params untouched, step not advanced
    leaves_old = jax.tree.leaves(state.params)
    leaves_new = jax.tree.leaves(new_state.params)
    for o, n in zip(leaves_old, leaves_new):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(n))
    assert int(new_state.step) == int(state.step)
