"""Streaming flash-attention backward — Pallas TPU kernels.

Completes `ops/flash.py`: the forward streams softmax(q k^T) v through
VMEM without materializing [Lq, Lk]; this module does the same for the
backward pass (the round-2 dense-rematerialized VJP held one
[B, Lq, Lk] f32 alive, closing off training at eval scale: L=7168 is
205 MB per attention per batch element).

Standard two-pass flash backward (same decomposition the reference's
hand-written CUDA backward uses for its correlation kernel,
`adjusted_RAFT/alt_cuda_corr/correlation_kernel.cu:123-256` — recompute
the local window, accumulate gradients tile by tile):

  pre:  delta_i = sum_d g_id * out_id           (O(L D), dense XLA)
  dq:   grid (b, q-tile; k sequential):  p = exp(s - lse);
        ds = p (g v^T - delta);  dq += ds k * scale
  dk/dv: grid (b, k-tile; q sequential): dv += p^T g;
        dk += ds^T q * scale

Both recompute s from q/k per tile (bf16 MXU matmuls, f32 accumulation)
and apply the same analytic Swin mask + padding masks as the forward.
HBM traffic is O(L C) per pass instead of O(L^2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _swin_allowed(swin, ib, q_idx, k_idx):
    """Token-pair mask of `shift_window_attn_mask`, computed analytically
    from indices (see `_flash_kernel` in flash.py for the derivation)."""
    num_splits, wh, ww, sh, sw = swin
    win = ib % (num_splits * num_splits)
    wy, wx = win // num_splits, win % num_splits
    last_y = (wy == num_splits - 1)
    last_x = (wx == num_splits - 1)
    yq = last_y & (q_idx // ww >= wh - sh)
    xq = last_x & (q_idx % ww >= ww - sw)
    yk = last_y & (k_idx // ww >= wh - sh)
    xk = last_x & (k_idx % ww >= ww - sw)
    return (yq == yk) & (xq == xk)


def _scores(q, k, scale, ib, iq_off, ik_off, tq, tk, lk_valid, swin):
    """Recomputed masked scores for one (q-tile, k-tile) pair."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    q_idx = iq_off + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    k_idx = ik_off + jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
    if swin is not None:
        s = jnp.where(_swin_allowed(swin, ib, q_idx, k_idx), s, s - 100.0)
    return jnp.where(k_idx < lk_valid, s, NEG_INF)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                   dq_ref, acc_sc, *, scale, lq_valid, lk_valid,
                   num_k, block_k, swin):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    g = g_ref[0].astype(jnp.bfloat16)
    tq, tk = q.shape[0], k.shape[0]
    ib, iq = pl.program_id(0), pl.program_id(1)

    s = _scores(q, k, scale, ib, iq * tq, ik * block_k, tq, tk,
                lk_valid, swin)
    q_idx = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    lse = lse_ref[0][:, :1]                        # lane-broadcast [TQ, 128]
    s_eff = jnp.where(q_idx < lq_valid, s - lse, NEG_INF)
    p = jnp.exp(s_eff)                             # [TQ, TK]

    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1])
    acc_sc[...] += jax.lax.dot_general(
        ds.astype(jnp.bfloat16), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == num_k - 1)
    def _fin():
        dq_ref[0] = (acc_sc[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_sc, dv_sc, *, scale, lq_valid,
                    lk_valid, num_q, block_q, swin):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_sc[...] = jnp.zeros_like(dk_sc)
        dv_sc[...] = jnp.zeros_like(dv_sc)

    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    g = g_ref[0].astype(jnp.bfloat16)
    tq, tk = q.shape[0], k.shape[0]
    ib, ik = pl.program_id(0), pl.program_id(1)

    s = _scores(q, k, scale, ib, iq * block_q, ik * tk, tq, tk,
                lk_valid, swin)
    q_idx = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    lse = lse_ref[0][:, :1]
    s_eff = jnp.where(q_idx < lq_valid, s - lse, NEG_INF)
    p = jnp.exp(s_eff)                             # [TQ, TK]

    dv_sc[...] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [TK, D]
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1])
    dk_sc[...] += jax.lax.dot_general(
        ds.astype(jnp.bfloat16), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [TK, C]

    @pl.when(iq == num_q - 1)
    def _fin():
        dk_ref[0] = (dk_sc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[...].astype(dv_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "swin"))
def flash_backward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   out: jnp.ndarray, lse: jnp.ndarray, g: jnp.ndarray,
                   scale: float, block_q: int, block_k: int,
                   interpret: bool = False,
                   swin: Optional[Tuple[int, int, int, int, int]] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming (dq, dk, dv) given forward residuals (out, lse)."""
    b, lq, c = q.shape
    _, lk, d = v.shape

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                                # [B, Lq]

    d_pad = max((-d) % 128, 0)
    if d_pad:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, d_pad)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, d_pad)))
    dpad = v.shape[-1]

    block_q = min(block_q, max(lq, 8))
    block_k = min(block_k, max(lk, 128))
    qp = _pad_to(q, 1, block_q)
    gp = _pad_to(g.astype(jnp.float32), 1, block_q)
    # lane-broadcast row stats to [B, L, 128] (TPU trailing-dim tiling)
    lsep = jnp.broadcast_to(_pad_to(lse, 1, block_q)[..., None],
                            (b, _pad_to(lse, 1, block_q).shape[1], 128))
    deltap = jnp.broadcast_to(_pad_to(delta, 1, block_q)[..., None],
                              (b, _pad_to(delta, 1, block_q).shape[1], 128))
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    lq_pad, lk_pad = qp.shape[1], kp.shape[1]
    num_q, num_k = lq_pad // block_q, lk_pad // block_k

    q_spec = pl.BlockSpec((1, block_q, c), lambda ib, i, j: (ib, i, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, block_q, dpad), lambda ib, i, j: (ib, i, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 128), lambda ib, i, j: (ib, i, 0),
                            memory_space=pltpu.VMEM)
    k_in = pl.BlockSpec((1, block_k, c), lambda ib, i, j: (ib, j, 0),
                        memory_space=pltpu.VMEM)
    v_in = pl.BlockSpec((1, block_k, dpad), lambda ib, i, j: (ib, j, 0),
                        memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, lq_valid=lq,
                          lk_valid=lk, num_k=num_k, block_k=block_k,
                          swin=swin),
        grid=(b, num_q, num_k),
        in_specs=[q_spec, k_in, v_in, g_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((1, block_q, c), lambda ib, i, j: (ib, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq_pad * lk_pad * (c + dpad),
            bytes_accessed=(qp.size + kp.size + vp.size + gp.size) * 2,
            transcendentals=b * lq_pad * lk_pad),
    )(qp, kp, vp, gp, lsep, deltap)

    # swap tile roles: k-tiles parallel, q sequential
    q_seq = pl.BlockSpec((1, block_q, c), lambda ib, j, i: (ib, i, 0),
                         memory_space=pltpu.VMEM)
    g_seq = pl.BlockSpec((1, block_q, dpad), lambda ib, j, i: (ib, i, 0),
                         memory_space=pltpu.VMEM)
    row_seq = pl.BlockSpec((1, block_q, 128), lambda ib, j, i: (ib, i, 0),
                           memory_space=pltpu.VMEM)
    k_par = pl.BlockSpec((1, block_k, c), lambda ib, j, i: (ib, j, 0),
                         memory_space=pltpu.VMEM)
    v_par = pl.BlockSpec((1, block_k, dpad), lambda ib, j, i: (ib, j, 0),
                         memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, lq_valid=lq,
                          lk_valid=lk, num_q=num_q, block_q=block_q,
                          swin=swin),
        grid=(b, num_k, num_q),
        in_specs=[q_seq, k_par, v_par, g_seq, row_seq, row_seq],
        out_specs=[
            pl.BlockSpec((1, block_k, c), lambda ib, j, i: (ib, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dpad), lambda ib, j, i: (ib, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, lk_pad, dpad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, c), jnp.float32),
                        pltpu.VMEM((block_k, dpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * lq_pad * lk_pad * (c + dpad),
            bytes_accessed=(qp.size + kp.size + vp.size + gp.size) * 2,
            transcendentals=b * lq_pad * lk_pad),
    )(qp, kp, vp, gp, lsep, deltap)

    return (dq[:, :lq].astype(q.dtype),
            dk[:, :lk].astype(k.dtype),
            dv[:, :lk, :d].astype(v.dtype))
