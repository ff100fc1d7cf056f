"""Classifier training: learns to separate synthetic flow-field classes."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from opticalflowfromdepth_tpu.train.classifier_train import (
    ClassifierTrainConfig, init_state, make_eval_step, make_train_step)


def make_batch(rng, n, h, w):
    """Synthetic flow fields with structure per class:
    0 none (constant), 1 flip (sign-split), 2 rotate (curl), 3 shear."""
    flows, labels = [], []
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w / 2, h / 2
    for _ in range(n):
        c = int(rng.integers(0, 4))
        if c == 0:
            f = np.stack([np.full((h, w), rng.uniform(-3, 3)),
                          np.full((h, w), rng.uniform(-3, 3))], -1)
        elif c == 1:
            f = np.stack([(xs - cx) * 2.0 / w * 10, np.zeros((h, w))], -1)
        elif c == 2:
            f = np.stack([-(ys - cy) / h * 10, (xs - cx) / w * 10], -1)
        else:
            f = np.stack([(ys - cy) / h * 8, np.zeros((h, w))], -1)
        f = f + rng.normal(0, 0.1, (h, w, 2))
        flows.append(f.astype(np.float32))
        onehot = np.zeros(4, np.float32)
        onehot[c] = 1
        labels.append(onehot)
    return {"flow": jnp.asarray(np.stack(flows)),
            "label": jnp.asarray(np.stack(labels))}


@pytest.mark.slow
def test_classifier_learns_flow_classes():
    h, w = 32, 48
    cfg = ClassifierTrainConfig(image_size=(h, w), num_steps=60,
                                lr=2e-3, use_small=True,
                                mixed_precision=False, dropout=0.0)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    eval_step = make_eval_step(cfg)
    rng = np.random.default_rng(0)

    first_acc = None
    for i in range(40):
        batch = make_batch(rng, 16, h, w)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if first_acc is None:
            first_acc = float(metrics["accuracy"])

    test_batch = make_batch(np.random.default_rng(123), 32, h, w)
    res = eval_step(state.params, state.batch_stats, test_batch)
    final_acc = float(res["accuracy"])
    assert np.isfinite(final_acc)
    assert final_acc > 0.6, (first_acc, final_acc)
