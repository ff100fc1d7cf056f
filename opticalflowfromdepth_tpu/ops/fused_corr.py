"""Fused Pallas correlation lookup with a hand-written backward (N2++).

The RAFT correlation chain was the single largest cost in the round-4
training step (device trace, 368x496 bs4 bf16 12 iters): the XLA
indicator-matmul lookup spends ~20 ms/step in batched-tiny-matmul
einsums ([B, N, 9, hl] @ [B, N, hl, wl] per level — thousands of 9x46
MXU ops), ~12 ms rebuilding volume-sized d_corr tensors in the backward,
~10 ms stacking per-iteration indicator matrices as scan residuals, and
carries bf16 [B, N, hl, wl] volume-gradient accumulators through the
backward scan (the CUDA analog is the alt_cuda_corr kernel pair,
`adjusted_RAFT/alt_cuda_corr/correlation_kernel.cu:19-256`).

Design (r5, iterated against Mosaic on a v5e):

  * All ``num_levels`` pyramid levels are packed into ONE row-concatenated
    tensor ``f2cat [B, R, C]`` (per level: x-major rows, y padded to the
    sublane tile — `corr_levels_cat`). One kernel launch per lookup and
    one per backward, and ONE MXU matmul forms every level's correlation
    tile at once: ``corr [R, Nb] = f2cat @ f1_tile^T`` lives only in VMEM.
  * Queries ride the LANE dimension. The per-level reshape
    ``[wl*HP, Nb] -> [wl, HP, Nb]`` splits the major dim in groups of the
    sublane tile — a layout-preserving shape cast (Mosaic rejects
    lane-splitting reshapes and 1-D implicit-dim vectors; masks are built
    strictly rank-2 with integer iota).
  * The bilinear (2r+1)^2 window lookup is 9+9 dense masked reductions
    (indicator weights; out-of-range taps match nothing and contribute
    exactly 0 — the zero-padding semantics of `bilinear_sampler`). A
    bf16-stage variant measured slower (cast traffic), so stage math is
    f32.
  * The custom VJP accumulates gradients DIRECTLY into [B, N, C] /
    [B, R, C] feature cotangents: d_corr exists only as a VMEM tile. The
    cat construction (pool chain + pad + transpose) sits OUTSIDE the VJP
    boundary, so under `lax.scan` it is built once per step and its
    auto-derived VJP (unpool/unpad) also runs once — the scan's constant
    cotangent is the feature-sized d_f2cat, not volume-sized d_corr.

Window channel order is x-major (k = kx*(2r+1) + ky) matching the
reference's meshgrid quirk (`core/corr.py:37-43`,
`ops/correlation.py:_window_delta`). Gradients w.r.t. coords are zero by
contract — RAFT detaches coords before every lookup (`raft.py:123`).

Measured (368x496 bs4 bf16 12 iters, v5e): the per-level kernels took the
train step 167 -> 123.6 ms (23.9 -> 32.4 f/s); this merged/hoisted form
is the follow-up. Oracle: `ops.correlation.CorrPyramid`
(tests/test_fused_corr.py).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def _avg_pool2x2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 VALID average pool over H, W of [B, H, W, C] (f32)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return s / 4.0


def cat_meta(h: int, w: int, num_levels: int
             ) -> List[Tuple[int, int, int, int]]:
    """Static per-level metadata [(hl, wl, hp, row_offset)] for the
    row-concatenated level tensor. Levels pooled to emptiness keep
    hl/wl = 0 and contribute zero lookups (CorrPyramid's 0-sized level
    semantics)."""
    meta = []
    off = 0
    hl, wl = h, w
    for _ in range(num_levels):
        hp = _ceil(max(hl, 1), 8) * 8 if hl > 0 and wl > 0 else 0
        meta.append((hl, wl, hp, off))
        off += wl * hp
        hl, wl = hl // 2, wl // 2
    return meta


def corr_levels_cat(fmap2: jnp.ndarray, num_levels: int,
                    dtype) -> jnp.ndarray:
    """[B, H, W, C] feature map -> [B, R, C] row-concatenated pyramid:
    per level, x-major rows with y padded to the sublane tile (zeros).
    Pooling runs in f32 exactly like `CorrPyramid` (torch avg_pool2d),
    storage in ``dtype``. Differentiable XLA ops only — its auto VJP
    (unpool + unpad) runs outside the Pallas custom_vjp."""
    b, h, w, c = fmap2.shape
    meta = cat_meta(h, w, num_levels)
    cur = fmap2.astype(dtype)
    rows = []
    for (hl, wl, hp, _off) in meta:
        if hl > 0 and wl > 0:
            f2t = cur.transpose(0, 2, 1, 3)          # [B, wl, hl, C]
            if hp != hl:
                f2t = jnp.pad(f2t, ((0, 0), (0, 0), (0, hp - hl), (0, 0)))
            rows.append(f2t.reshape(b, wl * hp, c))
            cur = _avg_pool2x2_nhwc(cur.astype(jnp.float32)).astype(dtype)
    return jnp.concatenate(rows, axis=1) if rows else \
        jnp.zeros((b, 0, c), dtype)


def _masks_t(cl, scale_inv: float, hp: int, wl: int, k: int, r: int):
    """Folded 2-tap bilinear indicator masks, query-in-lanes orientation.

    cl: [Nb, 2] LEVEL-0 centers; scale_inv = 1/2**level. Returns two
    lists of K rank-2 masks: mx[kx] [wl, Nb], my[ky] [hp, Nb] f32 —
    mx[kx][x, q] is the bilinear weight of column x for window tap kx of
    query q (zero outside the level). Strictly rank-2 with queries in
    lanes: 1-D implicit-dim vectors and rank-3 mask tensors trip Mosaic
    layout inference (probed r5). Padded rows y >= hl carry weights too,
    but they multiply zero-padded correlation values in the forward and
    their f2-cotangent rows are sliced off outside, so they never
    contribute."""
    nb = cl.shape[0]
    cx = jnp.transpose(cl[:, 0:1]) * scale_inv           # [1, Nb]
    cy = jnp.transpose(cl[:, 1:2]) * scale_inv
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    # integer iota + integer comparisons (Mosaic's tpu.iota is int-only);
    # x0/y0 are exact small integers in f32, so the int32 cast is safe
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xi = jax.lax.broadcasted_iota(jnp.int32, (wl, nb), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (hp, nb), 0)
    mx = [(1.0 - fx) * (xi == x0i + (kx - r)) +
          fx * (xi == x0i + (kx - r) + 1) for kx in range(k)]
    my = [(1.0 - fy) * (yi == y0i + (ky - r)) +
          fy * (yi == y0i + (ky - r) + 1) for ky in range(k)]
    return mx, my


def _fwd_kernel(f1_ref, f2_ref, c_ref, out_ref, *,
                meta, k: int, r: int, scale: float):
    f1 = f1_ref[0]                                       # [Nb, C]
    f2 = f2_ref[0]                                       # [R, C]
    # one MXU matmul for ALL levels' query-in-lanes correlation tiles
    corr = jax.lax.dot_general(
        f2, f1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [R, Nb]
    nb = corr.shape[-1]
    cl = c_ref[0]                                        # [Nb, 2]

    rows = []
    for li, (hl, wl, hp, off) in enumerate(meta):
        if hl == 0 or wl == 0:
            rows.append(jnp.zeros((k * k, nb), jnp.float32))
            continue
        # per-level tile: static row slice + sublane-aligned major split
        corr3 = corr[off:off + wl * hp].reshape(wl, hp, nb)
        mx, my = _masks_t(cl, 1.0 / (2.0 ** li), hp, wl, k, r)
        # stage 1 contracts y (sublane dim), stage 2 contracts x;
        # out[kx*K + ky] is the x-major flattening (`_window_delta`)
        t1 = [jnp.sum(my[ky][None, :, :] * corr3, axis=1)
              for ky in range(k)]                        # [wl, Nb] each
        for kx in range(k):
            for ky in range(k):
                rows.append(jnp.sum(mx[kx] * t1[ky], axis=0,
                                    keepdims=True))
    out = jnp.concatenate(rows, axis=0)                  # [L*K*K, Nb]
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(g_ref, f1_ref, f2_ref, c_ref, df1_ref, df2_ref, *,
                meta, k: int, r: int, scale: float):
    qt = pl.program_id(1)
    g = g_ref[0].astype(jnp.float32)                     # [L*K*K, Nb]
    f1 = f1_ref[0]                                       # [Nb, C]
    f2 = f2_ref[0]                                       # [R, C]
    nb = g.shape[-1]
    cl = c_ref[0]                                        # [Nb, 2]

    segs = []
    for li, (hl, wl, hp, off) in enumerate(meta):
        if hl == 0 or wl == 0:
            continue
        mx, my = _masks_t(cl, 1.0 / (2.0 ** li), hp, wl, k, r)
        g0 = li * k * k
        # transpose of the forward's two stages
        d_corr3 = jnp.zeros((wl, hp, nb), jnp.float32)
        for ky in range(k):
            d_t1 = jnp.zeros((wl, nb), jnp.float32)
            for kx in range(k):
                d_t1 = d_t1 + g[g0 + kx * k + ky][None, :] * mx[kx]
            d_corr3 = d_corr3 + my[ky][None, :, :] * d_t1[:, None, :]
        segs.append(d_corr3.reshape(wl * hp, nb))
    d_corr = jnp.concatenate(segs, axis=0)               # [R, Nb]

    df1_ref[0] = jax.lax.dot_general(
        d_corr, f2.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [Nb, C]

    @pl.when(qt == 0)
    def _():
        df2_ref[0] = jnp.zeros_like(df2_ref[0])
    df2_ref[0] += jax.lax.dot_general(
        d_corr, f1.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [R, C]


def _pad_queries(x: jnp.ndarray, npad: int) -> jnp.ndarray:
    n = x.shape[1]
    if n == npad:
        return x
    return jnp.pad(x, ((0, 0), (0, npad - n)) + ((0, 0),) * (x.ndim - 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_corr_lookup_cat(f1: jnp.ndarray, f2cat: jnp.ndarray,
                          coords: jnp.ndarray, h2: int, w2: int,
                          num_levels: int = 4, radius: int = 4,
                          block_q: int = 256, interpret: bool = False):
    """Window lookups from the packed pyramid: f1 [B, N, C] (compute
    dtype), f2cat [B, R, C] (`corr_levels_cat` of a [B, h2, w2, C]
    feature map), coords [B, N, 2] level-0 centers ->
    [B, N, num_levels*(2r+1)^2] in f1.dtype.

    Build f2cat ONCE outside a scan: this function's custom VJP returns
    feature-sized (d_f1, d_f2cat) per call, so the scan accumulates small
    constant-cotangents and the cat's own VJP runs once per step.
    Gradients w.r.t. coords are zero (RAFT detaches them, `raft.py:123`).

    VMEM bound: the kernel holds ~[R, block_q] f32 correlation (+ its
    gradient and an [R, C] f32 d_f2cat block in the backward) in VMEM;
    at training resolutions far beyond ~500x700 (1/8-res R ~ 6-8k rows)
    reduce ``block_q`` or fall back to ``corr_impl='pyramid'`` — Mosaic
    fails loudly at compile time, never silently.
    """
    out, _ = _cat_fwd(f1, f2cat, coords, h2, w2, num_levels, radius,
                      block_q, interpret)
    return out


def _cat_fwd(f1, f2cat, coords, h2, w2, num_levels, radius, block_q,
             interpret):
    b, n, c = f1.shape
    meta = tuple(cat_meta(h2, w2, num_levels))
    k = 2 * radius + 1
    if f2cat.shape[1] == 0:              # every level pooled away
        out = jnp.zeros((b, n, num_levels * k * k), f1.dtype)
        return out, (f1, f2cat, coords)
    npad = _ceil(n, block_q) * block_q
    f1p = _pad_queries(f1, npad)
    clp = _pad_queries(coords, npad)
    grid = (b, npad // block_q)
    nch = num_levels * k * k
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, meta=meta, k=k, r=radius,
                          scale=1.0 / (c ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, f2cat.shape[1], c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, 2), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, nch, block_q), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, nch, npad), f1.dtype),
        interpret=interpret,
    )(f1p, f2cat, clp)
    return out.transpose(0, 2, 1)[:, :n], (f1, f2cat, coords)


def _cat_bwd(h2, w2, num_levels, radius, block_q, interpret, res, g):
    f1, f2cat, coords = res
    b, n, c = f1.shape
    r_rows = f2cat.shape[1]
    if r_rows == 0:
        return (jnp.zeros_like(f1), jnp.zeros_like(f2cat),
                jnp.zeros_like(coords))
    meta = tuple(cat_meta(h2, w2, num_levels))
    k = 2 * radius + 1
    npad = _ceil(n, block_q) * block_q
    nch = num_levels * k * k
    gp = _pad_queries(g.reshape(b, n, nch), npad)  # padded g rows are 0
    f1p = _pad_queries(f1, npad)
    clp = _pad_queries(coords, npad)
    grid = (b, npad // block_q)
    df1, df2 = pl.pallas_call(
        functools.partial(_bwd_kernel, meta=meta, k=k, r=radius,
                          scale=1.0 / (c ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nch, block_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, r_rows, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, 2), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            # revisited across j (the fast grid dim): accumulates in VMEM
            pl.BlockSpec((1, r_rows, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, r_rows, c), jnp.float32),
        ],
        interpret=interpret,
    )(gp.transpose(0, 2, 1), f1p, f2cat, clp)
    d_coords = jnp.zeros_like(coords)
    return (df1[:, :n].astype(f1.dtype), df2.astype(f2cat.dtype),
            d_coords)


fused_corr_lookup_cat.defvjp(_cat_fwd, _cat_bwd)


def fused_corr_lookup(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                      coords: jnp.ndarray, num_levels: int = 4,
                      radius: int = 4, dtype=jnp.float32,
                      block_q: int = 256, interpret: bool = False):
    """Drop-in CorrPyramid equivalent: fmap1/fmap2 [B, H, W, C] (f32),
    coords [B, H, W, 2] -> [B, H, W, num_levels*(2r+1)^2] in ``dtype``.

    Convenience wrapper building the packed pyramid per call; inside a
    scan prefer `corr_levels_cat` once + `fused_corr_lookup_cat`."""
    b, h, w, c = fmap1.shape
    n = h * w
    f1 = fmap1.astype(dtype).reshape(b, n, c)
    f2cat = corr_levels_cat(fmap2, num_levels, dtype)
    out = fused_corr_lookup_cat(f1, f2cat, coords.reshape(b, n, 2),
                                h, w, num_levels, radius, block_q,
                                interpret)
    return out.reshape(b, h, w, -1)


def fused_corr_lookup_ref(fmap1, fmap2, coords, num_levels=4, radius=4,
                          dtype=jnp.float32):
    """XLA oracle (the round-4 production path)."""
    from .correlation import CorrPyramid
    return CorrPyramid(fmap1, fmap2, num_levels, radius, dtype)(coords)
