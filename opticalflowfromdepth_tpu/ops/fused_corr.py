"""Fused Pallas correlation lookup with a hand-written backward (N2++).

The RAFT correlation chain was the single largest cost in the round-4
training step (device trace, 368x496 bs4 bf16 12 iters): the XLA
indicator-matmul lookup spends ~20 ms/step in batched-tiny-matmul
einsums ([B, N, 9, hl] @ [B, N, hl, wl] per level — thousands of 9x46
MXU ops), ~12 ms rebuilding volume-sized d_corr tensors in the backward,
~10 ms stacking the per-iteration indicator matrices as scan residuals,
and carries bf16 [B, N, hl, wl] volume-gradient accumulators through the
backward scan (the CUDA analog is the alt_cuda_corr kernel pair,
`adjusted_RAFT/alt_cuda_corr/correlation_kernel.cu:19-256`).

This kernel computes, per pyramid level,

    out[b, q, kx, ky] = (1/sqrt(C)) * sum_c f1[b, q, c] *
                        bilinear(f2_l, coords_l[b, q] + (kx, ky) - r)[c]

entirely in VMEM: one MXU matmul forms the [Nb, Ml] correlation tile
(never written to HBM), and the (2r+1)^2 bilinear window lookup is 9+9
dense masked reductions (iota-comparison indicator weights — out-of-range
taps match nothing and contribute exactly 0, the zero-padding semantics
of `bilinear_sampler`). The custom VJP accumulates gradients DIRECTLY
into [B, N, C] / [B, Ml, C] feature-map cotangents: d_corr lives only as
a per-tile VMEM intermediate, so the HBM cost per GRU iteration drops
from volume-sized (~86 MB/level-set) to feature-sized (~12 MB).

Window channel order is x-major (k = kx*(2r+1) + ky) matching the
reference's meshgrid quirk (`core/corr.py:37-43`,
`ops/correlation.py:_window_delta`). Gradients w.r.t. coords are zero by
contract — RAFT detaches coords before every lookup (`raft.py:123`).

Oracle: `ops.correlation.CorrPyramid` (tests/test_fused_corr.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def _level_shapes(h: int, w: int, num_levels: int):
    shapes = []
    for _ in range(num_levels):
        shapes.append((h, w))
        h, w = h // 2, w // 2
    return shapes


def _avg_pool2x2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 VALID average pool over H, W of [B, H, W, C] (f32)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return s / 4.0


def _masks_t(cx, cy, hl: int, wp: int, k: int, r: int):
    """Folded 2-tap bilinear indicator masks, query-in-lanes orientation.

    cx, cy: [Nb] level-space centers. Returns (mx [K, WP, Nb],
    my [K, hl, Nb]) f32 — mx[kx, x, q] is the bilinear weight of column x
    for window tap kx of query q (zero outside the level; the padded
    columns x >= wl carry weights too, but they multiply zero-padded
    correlation values in the forward and their f2-cotangent rows are
    sliced off outside, so they never contribute)."""
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[None, None, :]                        # [1, 1, Nb]
    fy = (cy - y0)[None, None, :]
    # integer iota + integer comparisons (Mosaic's tpu.iota is int-only);
    # x0/y0 are exact small integers in f32, so the int32 cast is safe
    ks = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0) - r
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (1, hl, 1), 1)
    bx = x0.astype(jnp.int32)[None, None, :] + ks        # [K, 1, Nb]
    by = y0.astype(jnp.int32)[None, None, :] + ks
    mx = (1.0 - fx) * (xi == bx) + fx * (xi == bx + 1)
    my = (1.0 - fy) * (yi == by) + fy * (yi == by + 1)
    return mx, my


def _fwd_kernel(f1_ref, f2_ref, c_ref, out_ref, *,
                hl: int, wp: int, k: int, r: int, scale: float):
    f1 = f1_ref[0]                                       # [Nb, C]
    f2 = f2_ref[0]                                       # [hl*WP, C]
    # query-in-lanes correlation tile; reshape splits the MAJOR dim in
    # sublane-aligned groups of WP (a layout-preserving shape cast)
    corr = jax.lax.dot_general(
        f2, f1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [hl*WP, Nb]
    nb = corr.shape[-1]
    corr3 = corr.reshape(hl, wp, nb)
    cl = c_ref[0]                                        # [Nb, 2]
    mx, my = _masks_t(cl[:, 0], cl[:, 1], hl, wp, k, r)

    # stage 1: contract y — t1[ky][x, q] = sum_y my[ky, y, q] corr3[y, x, q]
    t1 = [jnp.sum(my[ky][:, None, :] * corr3, axis=0) for ky in range(k)]
    # stage 2: contract x — out[kx*K + ky, q] (x-major flattening,
    # `_window_delta`'s meshgrid quirk)
    rows = []
    for kx in range(k):
        for ky in range(k):
            rows.append(jnp.sum(mx[kx] * t1[ky], axis=0, keepdims=True))
    out = jnp.concatenate(rows, axis=0)                  # [K*K, Nb]
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(g_ref, f1_ref, f2_ref, c_ref,
                df1_ref, df2_ref, *,
                hl: int, wp: int, k: int, r: int, scale: float):
    qt = pl.program_id(1)
    g = g_ref[0].astype(jnp.float32)                     # [K*K, Nb]
    f1 = f1_ref[0]                                       # [Nb, C]
    f2 = f2_ref[0]                                       # [hl*WP, C]
    nb = g.shape[-1]
    cl = c_ref[0]                                        # [Nb, 2]
    mx, my = _masks_t(cl[:, 0], cl[:, 1], hl, wp, k, r)

    # transpose of stage 2 then stage 1 (see _fwd_kernel)
    d_corr3 = jnp.zeros((hl, wp, nb), jnp.float32)
    for ky in range(k):
        d_t1 = jnp.zeros((wp, nb), jnp.float32)
        for kx in range(k):
            d_t1 = d_t1 + g[kx * k + ky][None, :] * mx[kx]
        d_corr3 = d_corr3 + my[ky][:, None, :] * d_t1[None]
    d_corr = d_corr3.reshape(hl * wp, nb) * scale        # [hl*WP, Nb]

    df1_ref[0] = jax.lax.dot_general(
        d_corr, f2.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Nb, C]

    @pl.when(qt == 0)
    def _():
        df2_ref[0] = jnp.zeros_like(df2_ref[0])
    df2_ref[0] += jax.lax.dot_general(
        d_corr, f1.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [hl*WP, C]


def _pad_queries(x: jnp.ndarray, npad: int) -> jnp.ndarray:
    n = x.shape[1]
    if n == npad:
        return x
    return jnp.pad(x, ((0, 0), (0, npad - n)) + ((0, 0),) * (x.ndim - 2))


def _pad_f2(f2l: jnp.ndarray, wp: int) -> jnp.ndarray:
    """[B, hl, wl, C] -> [B, hl*WP, C] with zero columns wl..WP-1."""
    b, hl, wl, c = f2l.shape
    if wp != wl:
        f2l = jnp.pad(f2l, ((0, 0), (0, 0), (0, wp - wl), (0, 0)))
    return f2l.reshape(b, hl * wp, c)


def _level_forward(f1, f2l, cl, radius: int, block_q: int,
                   interpret: bool):
    """One level: f1 [B, N, C], f2l [B, hl, wl, C], cl [B, N, 2]
    (level-space centers) -> [B, N, (2r+1)^2]."""
    b, n, c = f1.shape
    _, hl, wl, _ = f2l.shape
    k = 2 * radius + 1
    if hl == 0 or wl == 0:
        # empty level (tiny inputs pooled away, matching CorrPyramid's
        # 0-sized level semantics): every tap misses -> zeros
        return jnp.zeros((b, n, k * k), f1.dtype)
    wp = _ceil(wl, 8) * 8
    npad = _ceil(n, block_q) * block_q
    f1p = _pad_queries(f1, npad)
    clp = _pad_queries(cl, npad)
    grid = (b, npad // block_q)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hl=hl, wp=wp, k=k, r=radius,
                          scale=1.0 / (c ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, hl * wp, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, 2), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, k * k, block_q), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, k * k, npad), f1.dtype),
        interpret=interpret,
    )(f1p, _pad_f2(f2l, wp), clp)
    return out.transpose(0, 2, 1)[:, :n]


def _level_backward(g, f1, f2l, cl, radius: int, block_q: int,
                    interpret: bool):
    """One level backward: returns (d_f1 [B, N, C] f32,
    d_f2l [B, hl, wl, C] f32)."""
    b, n, c = f1.shape
    _, hl, wl, _ = f2l.shape
    k = 2 * radius + 1
    if hl == 0 or wl == 0:
        return (jnp.zeros((b, n, c), jnp.float32),
                jnp.zeros((b, hl, wl, c), jnp.float32))
    wp = _ceil(wl, 8) * 8
    npad = _ceil(n, block_q) * block_q
    gp = _pad_queries(g, npad)            # padded rows: g == 0 -> no-op
    f1p = _pad_queries(f1, npad)
    clp = _pad_queries(cl, npad)
    grid = (b, npad // block_q)
    df1, df2 = pl.pallas_call(
        functools.partial(_bwd_kernel, hl=hl, wp=wp, k=k, r=radius,
                          scale=1.0 / (c ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k * k, block_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, hl * wp, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, 2), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            # revisited across j (the fast grid dim): accumulates in VMEM
            pl.BlockSpec((1, hl * wp, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, hl * wp, c), jnp.float32),
        ],
        interpret=interpret,
    )(gp.transpose(0, 2, 1), f1p, _pad_f2(f2l, wp), clp)
    return (df1[:, :n],
            df2.reshape(b, hl, wp, c)[:, :, :wl])


def _pool_chain(f2: jnp.ndarray, num_levels: int):
    """f2 [B, H, W, C] -> list of levels (compute dtype), pooled in f32
    exactly like `ops.correlation.CorrPyramid` (torch avg_pool2d)."""
    levels = [f2]
    cur = f2
    for _ in range(num_levels - 1):
        cur = _avg_pool2x2_nhwc(cur.astype(jnp.float32)).astype(f2.dtype)
        levels.append(cur)
    return levels


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_corr_lookup(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                      coords: jnp.ndarray, num_levels: int = 4,
                      radius: int = 4, dtype=jnp.float32,
                      block_q: int = 256, interpret: bool = False):
    """Drop-in CorrPyramid equivalent: fmap1/fmap2 [B, H, W, C] (f32),
    coords [B, H, W, 2] -> [B, H, W, num_levels*(2r+1)^2] in ``dtype``.

    Gradients flow to fmap1/fmap2 only (coords cotangent is zero — RAFT
    detaches coords before every lookup, `raft.py:123`)."""
    out, _ = _fused_fwd(fmap1, fmap2, coords, num_levels, radius, dtype,
                        block_q, interpret)
    return out


def _fused_fwd(fmap1, fmap2, coords, num_levels, radius, dtype, block_q,
               interpret):
    b, h, w, c = fmap1.shape
    n = h * w
    f1 = fmap1.astype(dtype).reshape(b, n, c)
    levels = _pool_chain(fmap2.astype(dtype), num_levels)
    cflat = coords.reshape(b, n, 2)
    outs = []
    for i, f2l in enumerate(levels):
        s = 2.0 ** i
        outs.append(_level_forward(f1, f2l, cflat / s,
                                   radius, block_q, interpret))
    out = jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)
    return out, (fmap1, fmap2, coords)


def _fused_bwd(num_levels, radius, dtype, block_q, interpret, res, g):
    fmap1, fmap2, coords = res
    b, h, w, c = fmap1.shape
    n = h * w
    k2 = (2 * radius + 1) ** 2
    f1 = fmap1.astype(dtype).reshape(b, n, c)
    levels = _pool_chain(fmap2.astype(dtype), num_levels)
    cflat = coords.reshape(b, n, 2)
    g = g.reshape(b, n, num_levels * k2)

    d_f1 = jnp.zeros((b, n, c), jnp.float32)
    d_levels = []
    for i, f2l in enumerate(levels):
        s = 2.0 ** i
        gi = g[..., i * k2:(i + 1) * k2]
        df1_i, df2_i = _level_backward(gi, f1, f2l, cflat / s,
                                       radius, block_q, interpret)
        d_f1 = d_f1 + df1_i
        d_levels.append(df2_i)

    # transpose of the pooling chain: every pooled output pixel spreads
    # its cotangent /4 to its 2x2 source window (VALID pooling: odd last
    # rows/cols receive nothing)
    d_f2 = d_levels[-1]
    for i in range(num_levels - 2, -1, -1):
        hl, wl = d_levels[i].shape[1:3]
        up = jnp.zeros((b, hl, wl, c), jnp.float32)
        src = d_f2 / 4.0
        hh, ww = src.shape[1] * 2, src.shape[2] * 2
        up = up.at[:, :hh, :ww].set(
            jnp.repeat(jnp.repeat(src, 2, axis=1), 2, axis=2))
        d_f2 = d_levels[i] + up
    d_coords = jnp.zeros_like(coords)
    return (d_f1.reshape(b, h, w, c).astype(fmap1.dtype),
            d_f2.astype(fmap2.dtype), d_coords)


fused_corr_lookup.defvjp(_fused_fwd, _fused_bwd)


def fused_corr_lookup_ref(fmap1, fmap2, coords, num_levels=4, radius=4,
                          dtype=jnp.float32):
    """XLA oracle (the round-4 production path)."""
    from .correlation import CorrPyramid
    return CorrPyramid(fmap1, fmap2, num_levels, radius, dtype)(coords)
