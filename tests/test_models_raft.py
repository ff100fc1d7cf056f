"""RAFT model: shapes, jit-compile, correlation oracle checks."""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.models.raft import RAFT, convex_upsample, coords_grid
from opticalflowfromdepth_tpu.models.classifier import Classifier
from opticalflowfromdepth_tpu.ops.correlation import CorrPyramid, on_demand_corr


def test_corr_pyramid_matches_dense_oracle():
    """Level-0 lookup at integer coords == raw dot products (corr.py:52-60)."""
    rng = np.random.default_rng(0)
    b, h, w, c = 1, 8, 8, 16
    f1 = rng.normal(size=(b, h, w, c)).astype(np.float32)
    f2 = rng.normal(size=(b, h, w, c)).astype(np.float32)
    pyr = CorrPyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2, radius=1)
    coords = coords_grid(b, h, w)
    out = np.asarray(pyr(coords))  # [B, H, W, 2*9]
    # center tap of level 0 (delta=(0,0) is index 4 of the 3x3 window)
    center = out[0, :, :, 4]
    want = np.einsum("hwc,hwc->hw", f1[0], f2[0]) / np.sqrt(c)
    np.testing.assert_allclose(center, want, rtol=1e-4)


@pytest.mark.slow
def test_on_demand_corr_matches_pyramid():
    rng = np.random.default_rng(1)
    b, h, w, c = 2, 8, 12, 8
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    coords = coords_grid(b, h, w) + jnp.asarray(
        rng.uniform(-2, 2, size=(b, h, w, 2)).astype(np.float32))
    pyr = CorrPyramid(f1, f2, num_levels=3, radius=2)
    dense = np.asarray(pyr(coords))
    ondemand = np.asarray(on_demand_corr(f1, f2, coords, num_levels=3, radius=2))
    np.testing.assert_allclose(ondemand, dense, atol=2e-4)


def test_convex_upsample_constant_flow():
    """Convex combination of a constant flow is that constant x8 in the
    interior; borders mix in zero-pad taps exactly like the reference's
    F.unfold(padding=1) (`adjusted_RAFT/core/raft.py:78`): with a uniform
    mask (softmax of zeros = 1/9 per tap) a corner block sees 4 of 9
    in-bounds taps."""
    b, h, w = 1, 4, 5
    flow = jnp.ones((b, h, w, 2)) * jnp.asarray([2.0, -1.0])
    mask = jnp.zeros((b, h, w, 9 * 64))
    up = np.asarray(convex_upsample(flow, mask))
    assert up.shape == (b, 8 * h, 8 * w, 2)
    np.testing.assert_allclose(up[:, 8:-8, 8:-8, 0], 16.0, atol=1e-5)
    np.testing.assert_allclose(up[:, 8:-8, 8:-8, 1], -8.0, atol=1e-5)
    np.testing.assert_allclose(up[:, :8, :8, 0], 16.0 * 4 / 9, atol=1e-5)
    np.testing.assert_allclose(up[:, :8, 8:-8, 1], -8.0 * 6 / 9, atol=1e-5)


@pytest.mark.parametrize("small", [True, False])
@pytest.mark.slow
def test_raft_forward_shapes(small):
    model = RAFT(small=small)
    b, h, w = 1, 64, 96
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((b, h, w, 3))
    variables = model.init(rng, img, img, iters=2, train=False)
    preds = model.apply(variables, img, img, iters=3, train=False)
    assert len(preds) == 3
    assert preds[-1].shape == (b, h, w, 2)


@pytest.mark.slow
def test_raft_test_mode_and_jit():
    model = RAFT(small=True)
    b, h, w = 1, 32, 48
    img = jnp.zeros((b, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), img, img, iters=1,
                           train=False)

    @jax.jit
    def fwd(v, i1, i2):
        return model.apply(v, i1, i2, iters=2, test_mode=True, train=False)

    low, up = fwd(variables, img, img)
    assert low.shape == (b, h // 8, w // 8, 2)
    assert up.shape == (b, h, w, 2)


def test_classifier_logits_shape():
    model = Classifier(output_dim=32, use_small=True, dropout=0.0)
    flow = jnp.zeros((2, 64, 64, 2))
    variables = model.init(jax.random.PRNGKey(0), flow, train=False)
    logits = model.apply(variables, flow, train=False)
    assert logits.shape == (2, 4)


def test_blocked_supervision_matches_full_res():
    """Training in the blocked [B, h, w, 64, 2] supervision layout must
    produce the same loss/metrics/updates as full-res supervision — the
    reductions see the same value multiset (r5 perf layout change)."""
    from opticalflowfromdepth_tpu.train import raft_train as rt

    rng = np.random.default_rng(0)
    b, h, w = 2, 32, 48
    batch = {
        "image1": jnp.asarray(
            rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "image2": jnp.asarray(
            rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "flow": jnp.asarray(
            rng.normal(0, 4, (b, h, w, 2)).astype(np.float32)),
        "valid": jnp.asarray(
            (rng.uniform(0, 1, (b, h, w)) > 0.1).astype(np.float32)),
        "label": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
                          (b, 1)),
    }
    metrics = {}
    states = {}
    for blocked in (False, True):
        cfg = rt.RAFTTrainConfig(
            small=False, iters=2, batch_size=b, image_size=(h, w),
            mixed_precision=False, corr_impl="pyramid",
            blocked_supervision=blocked)
        state = rt.init_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(rt.make_train_step(cfg))
        s2, m = step(state, batch, jax.random.PRNGKey(1))
        metrics[blocked] = m
        states[blocked] = s2
    for k in metrics[False]:
        np.testing.assert_allclose(
            float(metrics[True][k]), float(metrics[False][k]),
            rtol=2e-5, atol=1e-6, err_msg=k)
    # parameter updates identical too
    la, lb = (jax.flatten_util.ravel_pytree(states[True].params)[0],
              jax.flatten_util.ravel_pytree(states[False].params)[0])
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-6)
