"""Flash streaming-softmax kernel vs dense oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.ops.flash import (
    flash_softmax_matmul, flash_softmax_matmul_ref)


@pytest.mark.parametrize("b,lq,lk,c,d", [
    (1, 256, 256, 64, 2),      # matching-style payload
    (2, 128, 384, 32, 128),    # attention-style payload
    (1, 200, 300, 64, 2),      # non-multiple lengths (padding paths)
])
def test_flash_matches_dense(b, lq, lk, c, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, lq, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, lk, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, d)).astype(np.float32))
    got = np.asarray(flash_softmax_matmul(q, k, v, block_q=128, block_k=128,
                                          interpret=True))
    want = np.asarray(flash_softmax_matmul_ref(q, k, v))
    # bf16 operands inside the kernel -> ~1e-2 tolerance
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_flash_with_additive_bias():
    """Swin shifted-window masks enter as an additive [B, Lq, Lk] bias."""
    rng = np.random.default_rng(2)
    b, lq, lk, c, d = 2, 160, 288, 32, 64
    q = jnp.asarray(rng.normal(size=(b, lq, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, lk, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, d)).astype(np.float32))
    # mask-like bias: blocks of -100 (as in shift_window_attn_mask)
    bias = jnp.asarray(
        np.where(rng.uniform(size=(b, lq, lk)) < 0.3, -100.0, 0.0)
        .astype(np.float32))
    got = np.asarray(flash_softmax_matmul(q, k, v, bias=bias, block_q=128,
                                          block_k=128, interpret=True))
    want = np.asarray(flash_softmax_matmul_ref(q, k, v, bias=bias))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_flash_extreme_logits_stable():
    """Online softmax must survive large score magnitudes."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 128, 32)).astype(np.float32)) * 30
    k = jnp.asarray(rng.normal(size=(1, 256, 32)).astype(np.float32)) * 30
    v = jnp.asarray(rng.normal(size=(1, 256, 2)).astype(np.float32))
    got = np.asarray(flash_softmax_matmul(q, k, v, block_q=128, block_k=128,
                                          interpret=True))
    # with near-one-hot softmax the bf16 rounding of q/k can flip the
    # argmax; compare against an oracle with the same operand rounding
    want = np.asarray(flash_softmax_matmul_ref(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        k.astype(jnp.bfloat16).astype(jnp.float32), v))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("h,w,k", [(8, 8, 2), (12, 8, 4), (16, 24, 4)])
def test_flash_swin_inkernel_mask_matches_dense_bias(h, w, k):
    """The analytic in-kernel Swin mask == shift_window_attn_mask bias."""
    from opticalflowfromdepth_tpu.models.gmflow import (
        shift_window_attn_mask, split_feature)
    rng = np.random.default_rng(3)
    wh, ww = h // k, w // k
    sh, sw = wh // 2, ww // 2
    b = 2
    c = 32
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    y = rng.normal(size=(b, h, w, c)).astype(np.float32)
    z = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # shifted-window batch layout [b, wy, wx] as in _split_window_attention
    qs = split_feature(jnp.asarray(x), k).reshape(-1, wh * ww, c)
    ks = split_feature(jnp.asarray(y), k).reshape(-1, wh * ww, c)
    vs = split_feature(jnp.asarray(z), k).reshape(-1, wh * ww, c)
    mask = shift_window_attn_mask(h, w, wh, ww, sh, sw)
    bias = jnp.tile(mask, (b, 1, 1))
    want = np.asarray(flash_softmax_matmul_ref(qs, ks, vs, bias=bias))
    got = np.asarray(flash_softmax_matmul(
        qs, ks, vs, block_q=16, block_k=16, interpret=True,
        swin=(k, wh, ww, sh, sw)))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("use_swin", [False, True])
def test_flash_gradients_match_dense(use_swin):
    """flash_softmax_matmul must be trainable: custom VJP vs autodiff of
    the dense oracle (GMFlow training differentiates through attention,
    matching and flow propagation on TPU)."""
    from opticalflowfromdepth_tpu.models.gmflow import (
        shift_window_attn_mask)
    rng = np.random.default_rng(7)
    if use_swin:
        h = w = 8
        k_sp = 2
        wh = ww = 4
        swin = (k_sp, wh, ww, 2, 2)
        b, l = 2 * k_sp * k_sp, wh * ww
        mask = shift_window_attn_mask(h, w, wh, ww, 2, 2)
        bias_ref = jnp.tile(mask, (2, 1, 1))
    else:
        swin, bias_ref = None, None
        b, l = 2, 48
    c, d = 32, 16
    q = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_softmax_matmul(q, k, v, block_q=16, block_k=16,
                                   interpret=True, swin=swin)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(flash_softmax_matmul_ref(
            q, k, v, bias=bias_ref)))

    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # bf16 operands in both fwd kernel and bwd recompute
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               atol=5e-2, rtol=5e-2)


def test_flash_streaming_backward_large_L():
    """Gradient parity of the streaming Pallas backward (flash_bwd.py) at
    L=4096 in interpret mode — the scale where the old dense-remat VJP
    carried a [B, L, L] f32 (67 MB/batch-el); the streaming pass never
    materializes it. Oracle: dense f32 softmax; tolerance covers the
    kernels' bf16 operand rounding."""
    rng = np.random.default_rng(7)
    b, l, c, d = 1, 4096, 64, 2
    q = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(
            flash_softmax_matmul(q, k, v, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(flash_softmax_matmul_ref(q, k, v)))

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(g, r, "qkv"):
        scale = np.max(np.abs(np.asarray(ref))) + 1e-12
        diff = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
        assert diff / scale < 2e-2, f"d{name}: {diff:.2e} vs scale {scale:.2e}"


def test_flash_streaming_backward_swin_and_padding():
    """Streaming backward under the analytic Swin mask AND non-multiple
    lengths (query/key padding paths), vs the dense-bias oracle."""
    from opticalflowfromdepth_tpu.models.gmflow import shift_window_attn_mask
    rng = np.random.default_rng(8)
    h, w, k_sp = 12, 18, 3
    wh, ww = h // k_sp, w // k_sp
    swin = (k_sp, wh, ww, wh // 2, ww // 2)
    b, l = 2 * k_sp * k_sp, wh * ww  # l = 24: pads to block 128
    mask = shift_window_attn_mask(h, w, wh, ww, wh // 2, ww // 2)
    bias_ref = jnp.tile(mask, (2, 1, 1))
    c, d = 32, 16
    q = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_softmax_matmul(
            q, k, v, interpret=True, swin=swin)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(flash_softmax_matmul_ref(
            q, k, v, bias=bias_ref)))

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(g, r, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2,
                                   err_msg=f"d{name}")
