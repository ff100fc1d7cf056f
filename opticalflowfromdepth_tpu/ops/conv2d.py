"""Fused 3x3 stride-1 conv — Pallas TPU kernel (tap-accumulating matmuls).

The encoder backbones are stacks of 3x3 convs at 64-128 channels
(`adjusted_gmflow/gmflow/backbone.py:6-117`, `adjusted_RAFT/core/
extractor.py:118-192`). XLA's native conv lowering sustains only
~20 TF/s bf16 on these shapes on v5e (measured: 0.84 ms for the
2x224x512x64->64 map, vs ~0.09 ms at MXU peak) — the narrow channel
count defeats its tiling. This kernel instead computes the conv as nine
accumulating [rows*W, C] x [C, CO] matmuls over a VMEM-resident halo
tile: each program DMAs a (tile_h+2, W+2, C) input band from HBM once,
slides the 3x3 window by value slicing in VMEM, and accumulates into an
f32 register tile — one HBM read of x, one write of y, weights pinned in
VMEM across the grid.

Forward-only Pallas; the backward is expressed in XLA (transposed conv
for dx, nine tap einsums for dw — large-L contractions that XLA maps to
the MXU well) via `jax.custom_vjp`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, o_ref, xs, sem, *, tile_h: int, w_out: int,
                    c_in: int):
    """Per program: DMA a haloed row band once, then accumulate the nine
    tap matmuls [th*W, C] x [C, CO] from the VMEM-resident band."""
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[ib, pl.ds(ih * tile_h, tile_h + 2)], xs, sem)
    copy.start()
    copy.wait()

    x = xs[...]                                     # [th+2, Wp, C]
    acc = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.dot_general(
                x[dy:dy + tile_h, dx:dx + w_out, :c_in],
                w_ref[dy * 3 + dx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [th, W, CO]
            acc = part if acc is None else acc + part
    o_ref[0] = acc.astype(o_ref.dtype)


def _conv3x3_s1_pallas(x: jnp.ndarray, w: jnp.ndarray, tile_h: int = 16,
                       interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C]; w: [3, 3, C, CO]; SAME padding, stride 1."""
    b, h, wd, c = x.shape
    co = w.shape[-1]
    pad_h = (-h) % tile_h
    # Mosaic constrains HBM DMA slices to full (8, 128) tiles: pad the
    # haloed width to a sublane multiple and the channels to a full lane —
    # the physical TPU layout of a C<128 array is lane-padded anyway, so
    # the DMA moves the same bytes either way.
    pad_w = (-(wd + 2)) % 8
    pad_c = (-c) % 128 if c < 128 else 0
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, pad_c)))
    hp = h + pad_h
    wp = wd + 2 + pad_w

    w_rows = w.reshape(9, c, co)

    kernel = functools.partial(_conv3x3_kernel, tile_h=tile_h, w_out=wd,
                               c_in=c)
    y = pl.pallas_call(
        kernel,
        grid=(b, hp // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),         # weights pinned
        ],
        out_specs=pl.BlockSpec((1, tile_h, wd, co),
                               lambda ib, ih: (ib, ih, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, c + pad_c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wd * c * co * 9,
            bytes_accessed=(xp.size + w.size) * x.dtype.itemsize
            + b * hp * wd * co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w_rows)
    return y[:, :h]


def _conv3x3_s1_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _use_pallas(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    # Opt-in only: on the bench chip (v5e) XLA's native conv reaches
    # ~30 TF/s on the backbone shapes while this kernel sustains ~24 —
    # Mosaic relayouts the dx-shifted sublane slices through the VPU,
    # which costs more than the saved HBM traffic. Kept as the starting
    # point for hardware where the balance differs.
    import os
    if os.environ.get("OFD_PALLAS_CONV3X3", "0") != "1":
        return False
    kh, kw, c, co = w.shape
    if (kh, kw) != (3, 3) or jax.default_backend() != "tpu":
        return False
    # the halo tile (tile_h+2, W+2, C) plus acc must fit VMEM comfortably
    vmem = (18 * (x.shape[2] + 2) * c * x.dtype.itemsize      # input band
            + 16 * x.shape[2] * co * 4                        # f32 acc
            + 9 * c * co * x.dtype.itemsize)                  # weights
    return x.shape[1] >= 16 and vmem < 8 * 1024 * 1024


@jax.custom_vjp
def conv3x3_s1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC/HWIO. Pallas on TPU, XLA elsewhere."""
    if _use_pallas(x, w):
        return _conv3x3_s1_pallas(x, w)
    return _conv3x3_s1_xla(x, w)


def _fwd(x, w):
    return conv3x3_s1(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    # dx: correlate g with the spatially flipped, channel-transposed kernel
    w_rot = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, w_rot, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dw[ky,kx,ci,co] = sum_{b,y,x} xpad[b,y+ky,x+kx,ci] * g[b,y,x,co]
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for ky in range(3):
        row = []
        for kx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, ky, kx, 0), (b, h, wd, c))
            row.append(jnp.einsum("bhwc,bhwd->cd", xs, g,
                                  preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)
    return dx, dw


conv3x3_s1.defvjp(_fwd, _bwd)
