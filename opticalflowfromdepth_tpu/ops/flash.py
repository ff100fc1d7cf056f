"""Flash (streaming-softmax) attention — Pallas TPU kernel.

The reference materializes every [L, L] softmax it takes:
  * global matching `softmax(f0 @ f1^T) @ grid` (`gmflow/matching.py:7-36`),
  * flow propagation `softmax(q @ k^T) @ flow` (`transformer.py:325-374`),
  * transformer attention (`transformer.py:8-16`).
At Sintel eval shape L = 7168 that is a 51M-element tensor (205 MB f32)
written+read around the softmax — pure HBM traffic. This kernel computes
``softmax(q @ k^T * scale) @ v`` with an online (running max / running
denominator) softmax over key tiles, so the score matrix never leaves
VMEM: O(L·C) HBM traffic instead of O(L²).

Kernel structure: 3-D grid ``(batch, q-tile, k-tile)`` with the k axis
innermost and sequential; the running max / denominator / output
accumulator live in VMEM scratch that persists across the k-tile sweep
(the standard TPU flash decomposition). Keeping each program's blocks
small — (block_q, C) and (block_k, C) — instead of holding the full-length
K/V in one program's VMEM is essential: a VMEM-resident L=7168 operand
makes the Mosaic compile pathological (~160 s measured on v5e) while this
form compiles in seconds and lets Pallas double-buffer the K/V tile DMAs.

Layout: q [B, Lq, C], k [B, Lk, C], v [B, Lk, D] -> out [B, Lq, D].
bf16 operands on the MXU, f32 accumulation. Lq/Lk are padded to tile
multiples by the wrapper; key padding is masked inside the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, *rest, scale: float, lk_valid: int,
                  num_k: int, block_k: int, has_bias: bool, swin=None,
                  with_lse: bool = False):
    """One (batch, q-tile, k-tile) program; k is the sequential axis."""
    rest = list(rest)
    bias_ref = rest.pop(0) if has_bias else None
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if with_lse else None
    m_sc, l_sc, acc_sc = rest
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[0].astype(jnp.bfloat16)               # [TQ, C]
    k_tile = k_ref[0].astype(jnp.bfloat16)          # [TK, C]
    v_tile = v_ref[0].astype(jnp.bfloat16)          # [TK, D]
    tq = q.shape[0]

    s = jax.lax.dot_general(
        q, k_tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [TQ, TK]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)

    if swin is not None:
        # Swin shifted-window mask, computed analytically instead of read
        # from HBM (a materialized [B*K^2, L, L] f32 bias costs ~100 MB of
        # traffic per shifted layer at Sintel eval shape). Equivalent to
        # `shift_window_attn_mask` (three-slice region construction): only
        # the last window row/column contains a wrap discontinuity, at
        # in-window row wh-sh / col ww-sw; tokens attend iff their region
        # ids match on both axes; mismatches get the same -100 additive.
        num_splits, wh, ww, sh, sw = swin
        ib = pl.program_id(0)
        win = ib % (num_splits * num_splits)
        wy, wx = win // num_splits, win % num_splits
        iq = pl.program_id(1)
        q_idx = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
        k_idx = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        last_y = (wy == num_splits - 1)
        last_x = (wx == num_splits - 1)
        yq = last_y & (q_idx // ww >= wh - sh)
        xq = last_x & (q_idx % ww >= ww - sw)
        yk = last_y & (k_idx // ww >= wh - sh)
        xk = last_x & (k_idx % ww >= ww - sw)
        allowed = (yq == yk) & (xq == xk)
        s = jnp.where(allowed, s, s - 100.0)

    # mask out key padding
    key_idx = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (tq, block_k), 1)
    s = jnp.where(key_idx < lk_valid, s, NEG_INF)

    m_prev = m_sc[...]
    l_prev = l_sc[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)       # [TQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                  # rescale old state
    p = jnp.exp(s - m_new)                           # [TQ, TK]
    m_sc[...] = m_new
    l_sc[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_sc[...] = acc_sc[...] * alpha + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [TQ, D]

    @pl.when(ik == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_sc[...] / jnp.maximum(l_sc[...], 1e-30)
                    ).astype(o_ref.dtype)
        if with_lse:
            # log-sum-exp per query row, consumed by the streaming backward.
            # Lane-broadcast [TQ, 128] store: TPU block specs require the
            # trailing dim to be 128-divisible, so the row vector rides in
            # every lane and the wrapper slices lane 0.
            lse_val = m_sc[...] + jnp.log(jnp.maximum(l_sc[...], 1e-30))
            lse_ref[0] = jnp.broadcast_to(lse_val, lse_ref[0].shape)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_block(length: int) -> int:
    """Largest <=1024 multiple of 128 dividing `length` (no padding waste;
    measured on v5e: 896 blocks on L=1792 windows run 3x faster than 512
    blocks padding to 2048), else 512."""
    for m in (1024, 896, 768, 640, 512, 384, 256, 128):
        if length % m == 0:
            return m
    return 512


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "swin",
                                             "with_lse"))
def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: Optional[float] = None,
                   bias: Optional[jnp.ndarray] = None,
                   block_q: Optional[int] = None,
                   block_k: Optional[int] = None,
                   interpret: bool = False,
                   swin: Optional[Tuple[int, int, int, int, int]] = None,
                   with_lse: bool = False):
    b, lq, c = q.shape
    _, lk, d = v.shape
    if scale is None:
        scale = 1.0 / (c ** 0.5)
    if block_q is None:
        block_q = _pick_block(lq)
    if block_k is None:
        block_k = _pick_block(lk)

    # lane-align the tiny D of matching/propagation payloads
    d_pad = max((-d) % 128, 0)
    if d_pad:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, d_pad)))

    block_q = min(block_q, max(lq, 8))
    block_k = min(block_k, max(lk, 128))
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    lq_pad, lk_pad = qp.shape[1], kp.shape[1]
    num_k = lk_pad // block_k

    in_specs = [
        pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, v.shape[-1]),
                     lambda ib, iq, ik: (ib, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qp, kp, vp]
    if bias is not None:
        bp = _pad_to(_pad_to(bias.astype(jnp.float32), 2, block_k),
                     1, block_q)
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k),
                         lambda ib, iq, ik: (ib, iq, ik),
                         memory_space=pltpu.VMEM))
        operands.append(bp)

    kernel = functools.partial(_flash_kernel, scale=float(scale),
                               lk_valid=lk, num_k=num_k, block_k=block_k,
                               has_bias=bias is not None, swin=swin,
                               with_lse=with_lse)
    out_specs = [pl.BlockSpec((1, block_q, v.shape[-1]),
                              lambda ib, iq, ik: (ib, iq, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, v.shape[-1]),
                                      jnp.float32)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, block_q, 128),
                                      lambda ib, iq, ik: (ib, iq, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, lq_pad, 128),
                                              jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(b, lq_pad // block_q, num_k),
        in_specs=in_specs,
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shape if with_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),            # running max
            pltpu.VMEM((block_q, 1), jnp.float32),            # denominator
            pltpu.VMEM((block_q, v.shape[-1]), jnp.float32),  # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lq_pad * lk_pad * (c + v.shape[-1]),
            bytes_accessed=(qp.size + kp.size + vp.size) * 2,
            transcendentals=b * lq_pad * lk_pad,
        ),
    )(*operands)
    if with_lse:
        out, lse = res
        return out[:, :lq, :d], lse[:, :lq, 0]
    return res[:, :lq, :d]


def _swin_mask_dense(l: int, swin: Tuple[int, int, int, int, int],
                     batch: int) -> jnp.ndarray:
    """Dense [B, L, L] equivalent of the kernel's analytic Swin mask
    (backward pass / oracle). Batch must be ordered [b, wy, wx]."""
    num_splits, wh, ww, sh, sw = swin
    kk = num_splits * num_splits
    t = jnp.arange(l)
    r, c = t // ww, t % ww
    wy = jnp.arange(kk) // num_splits
    wx = jnp.arange(kk) % num_splits
    yreg = (wy[:, None] == num_splits - 1) & (r[None, :] >= wh - sh)
    xreg = (wx[:, None] == num_splits - 1) & (c[None, :] >= ww - sw)
    same = ((yreg[:, :, None] == yreg[:, None, :])
            & (xreg[:, :, None] == xreg[:, None, :]))
    mask = jnp.where(same, 0.0, -100.0).astype(jnp.float32)
    return jnp.tile(mask, (batch // kk, 1, 1))


def _flash_vjp_fwd(q, k, v, bias, scale, block_q, block_k, interpret, swin):
    out, lse = _flash_forward(q, k, v, scale=scale, bias=bias,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret, swin=swin, with_lse=True)
    return out, (q, k, v, bias, out, lse)


def _flash_vjp_bwd(scale, block_q, block_k, interpret, swin, res, g):
    """Backward pass. Default: streaming Pallas kernels (`flash_bwd.py`) —
    no [B, Lq, Lk] ever materializes, so training at eval scale (L=7168)
    is open. The dense rematerialization below remains as the oracle for
    gradient-parity tests and as the fallback for the (unused in-model)
    explicit-bias path. Bias gradients are zero by construction (masks
    are constants here)."""
    q, k, v, bias, out, lse = res
    if bias is None:
        from .flash_bwd import flash_backward
        bq = block_q if block_q is not None else _pick_block(q.shape[1])
        bk = block_k if block_k is not None else _pick_block(k.shape[1])
        dq, dk, dv = flash_backward(q, k, v, out, lse, g,
                                    scale=float(scale), block_q=bq,
                                    block_k=bk, interpret=interpret,
                                    swin=swin)
        return dq, dk, dv, None
    qf = q.astype(jnp.bfloat16)
    kf = k.astype(jnp.bfloat16)
    s = jnp.einsum("blc,bmc->blm", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if swin is not None:
        s = s + _swin_mask_dense(k.shape[1], swin, q.shape[0])
    p = jax.nn.softmax(s, axis=-1)                       # [B, Lq, Lk]
    g = g.astype(jnp.float32)
    dv = jnp.einsum("blm,bld->bmd", p, g,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dp = jnp.einsum("bld,bmd->blm", g, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("blm,bmc->blc", ds.astype(jnp.bfloat16), kf,
                     preferred_element_type=jnp.float32)
          * scale).astype(q.dtype)
    dk = (jnp.einsum("blm,blc->bmc", ds.astype(jnp.bfloat16), qf,
                     preferred_element_type=jnp.float32)
          * scale).astype(k.dtype)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_vjp(q, k, v, bias, scale, block_q, block_k, interpret, swin):
    return _flash_forward(q, k, v, scale=scale, bias=bias, block_q=block_q,
                          block_k=block_k, interpret=interpret, swin=swin)


_flash_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_softmax_matmul(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: Optional[float] = None,
                         bias: Optional[jnp.ndarray] = None,
                         block_q: Optional[int] = None,
                         block_k: Optional[int] = None,
                         interpret: bool = False,
                         swin: Optional[Tuple[int, int, int, int, int]]
                         = None) -> jnp.ndarray:
    """softmax(q @ k^T * scale + bias) @ v without materializing [Lq, Lk].

    q: [B, Lq, C]; k: [B, Lk, C]; v: [B, Lk, D]; optional additive bias
    [B, Lq, Lk] (e.g. arbitrary attention masks — broadcast to B before the
    call; treated as a constant under differentiation). For Swin shifted
    windows pass ``swin=(num_splits, wh, ww, sh, sw)`` instead: the -100
    additive mask of `shift_window_attn_mask` is then generated inside the
    kernel from token indices (batch must be ordered [b, wy, wx] as
    produced by ``split_feature``), costing no HBM traffic.

    Differentiable: the forward is the streaming Pallas kernel; the
    backward recomputes the softmax densely (`_flash_vjp_bwd`).
    Returns [B, Lq, D] f32.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    return _flash_vjp(q, k, v, bias, float(scale), block_q, block_k,
                      interpret, swin)


def flash_softmax_matmul_ref(q, k, v, scale=None, bias=None):
    """Dense XLA oracle for tests."""
    c = q.shape[-1]
    if scale is None:
        scale = 1.0 / (c ** 0.5)
    s = jnp.einsum("blc,bmc->blm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("blm,bmd->bld", p, v.astype(jnp.float32))
