"""On-device inpaint: mask semantics + plausible-fill properties."""

import numpy as np
import jax.numpy as jnp

from opticalflowfromdepth_tpu.ops.inpaint import inpaint, pullpush_fill


def test_pullpush_constant_image_exact():
    img = np.full((3, 16, 16), 77.0, np.float32)
    keep = np.ones((16, 16), np.float32)
    keep[4:9, 5:12] = 0
    out = np.asarray(pullpush_fill(jnp.asarray(img * keep), jnp.asarray(keep)))
    np.testing.assert_allclose(out, 77.0, atol=1e-3)


def test_inpaint_keeps_valid_pixels():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(3, 12, 12)).astype(np.float32)
    valid = np.ones((1, 12, 12), np.float32)
    valid[0, 3:6, 3:6] = 0
    collision = np.zeros_like(valid)
    out = np.asarray(inpaint(jnp.asarray(img * valid), jnp.asarray(valid),
                             jnp.asarray(collision)))
    keep = valid[0] > 0
    # valid pixels only quantized (floor), matching the uint8 round-trip
    np.testing.assert_allclose(out[:, keep], np.floor(img[:, keep]))
    # holes are filled with something in-range, not zeros
    assert out[:, ~keep].min() >= 0 and out[:, ~keep].max() <= 255
    assert np.all(out[:, ~keep].std(axis=-1) < img.std())


def test_inpaint_fill_is_local_average_like():
    img = np.zeros((1, 10, 10), np.float32)
    img[:, :, :5] = 100.0
    img[:, :, 5:] = 200.0
    valid = np.ones((1, 10, 10), np.float32)
    valid[0, 4:6, 4:6] = 0
    collision = np.zeros_like(valid)
    out = np.asarray(inpaint(jnp.asarray(img * valid), jnp.asarray(valid),
                             jnp.asarray(collision)))
    hole = out[0, 4:6, 4:6]
    assert hole.min() >= 90 and hole.max() <= 210
