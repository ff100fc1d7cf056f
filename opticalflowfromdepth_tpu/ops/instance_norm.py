"""Fused InstanceNorm2d — Pallas TPU kernel.

The encoders normalize over (H, W) per sample/channel after nearly every
conv (`adjusted_gmflow/gmflow/backbone.py:6-36`, `adjusted_RAFT/core/
extractor.py:6-56` with norm_fn='instance').

Measured cost anatomy at the GMFlow backbone's 2x224x512x64 maps on v5e
(profile_backbone.py): a bare 3x3/64ch conv is 0.20 ms (42% MXU) and the
IN reduce+normalize alone is 0.06 ms — but a conv-IN-conv-IN res block is
1.55 ms, not ~0.6. The gap is LAYOUT PING-PONG, not arithmetic: XLA
space-to-batches the W axis of the small-batch convs (HLO shows
[224,2,8,67,64] halo tensors), and every (H, W) reduction forces a copy
back to a flat layout — 4-5 full-map copies per block. Neither this
Pallas kernel (which imposes its own flat [B,HW,C] layout, 0.22 ms
standalone) nor an MXU-einsum stats variant nor an explicit model-level
W-chunking with halo+masked-exact stats (measured 1.73 ms — the manual
chunk/unchunk copies cost as much as XLA's) beats the default, so the
XLA path stays and the Pallas kernel remains opt-in.

This kernel makes exactly two HBM reads and one write: a stats sweep
accumulating per-channel sum / sum-of-squares into VMEM scratch, then a
normalize sweep fusing the optional ReLU into the write. Layout: x is
viewed as [B, H*W, C] with channels in lanes (backbone C <= 128); the grid
is (B, 2, HW-tiles) with the last two axes sequential ("arbitrary") so the
f32 scratch accumulators persist across the phase sweep.

Training path: a `jax.custom_vjp` whose backward uses the closed form
  dx = rstd * (g - mean(g) - y * mean(g * y))   (affine=False)
with the ReLU gate applied to g first when fused — itself evaluated by XLA
(two fused passes; backward is not the eval-latency path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _in_kernel(x_ref, o_ref, mean_ref, rstd_ref, sum_sc, sq_sc,
               *, eps: float, n_valid: int, block: int, num_t: int,
               relu: bool):
    ph = pl.program_id(1)
    it = pl.program_id(2)

    @pl.when((ph == 0) & (it == 0))
    def _init():
        sum_sc[...] = jnp.zeros_like(sum_sc)
        sq_sc[...] = jnp.zeros_like(sq_sc)

    x = x_ref[0].astype(jnp.float32)                      # [T, C]
    # zero out the HW padding rows so they don't pollute the stats
    row = it * block + jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 0)
    x = jnp.where(row < n_valid, x, 0.0)

    @pl.when(ph == 0)
    def _stats():
        sum_sc[...] += jnp.sum(x, axis=0, keepdims=True)
        sq_sc[...] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(ph == 1)
    def _normalize():
        inv_n = 1.0 / n_valid
        mean = sum_sc[...] * inv_n                         # [1, C]
        var = jnp.maximum(sq_sc[...] * inv_n - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        y = (x - mean) * rstd
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0] = y.astype(o_ref.dtype)

        @pl.when(it == num_t - 1)
        def _save_stats():
            mean_ref[0] = mean
            rstd_ref[0] = rstd


def _instance_norm_fwd_pallas(x: jnp.ndarray, eps: float, relu: bool,
                              block: int = 8192, interpret: bool = False
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    b, h, w, c = x.shape
    n = h * w
    xr = x.reshape(b, n, c)
    block = min(block, max(256, 1 << (n - 1).bit_length()))
    pad = (-n) % block
    if pad:
        xr = jnp.pad(xr, ((0, 0), (0, pad), (0, 0)))
    num_t = xr.shape[1] // block

    kernel = functools.partial(_in_kernel, eps=float(eps), n_valid=n,
                               block=block, num_t=num_t, relu=relu)
    y, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b, 2, num_t),
        in_specs=[pl.BlockSpec((1, block, c), lambda ib, ph, it: (ib, it, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            # park the output on tile 0 during the stats phase so Pallas
            # never writes back an untouched buffer (ph is 0 or 1)
            pl.BlockSpec((1, block, c), lambda ib, ph, it: (ib, it * ph, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda ib, ph, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda ib, ph, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),   # per-channel sum
            pltpu.VMEM((1, c), jnp.float32),   # per-channel sum of squares
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * c,
            bytes_accessed=3 * xr.size * x.dtype.itemsize,
            transcendentals=b * c,
        ),
    )(xr)
    y = y[:, :n].reshape(b, h, w, c)
    return y, mean.reshape(b, 1, 1, c), rstd.reshape(b, 1, 1, c)


def _instance_norm_xla(x: jnp.ndarray, eps: float, relu: bool):
    """Dense XLA path (CPU tests / non-TPU backends) + stats."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jax.lax.square(xf), axis=(1, 2), keepdims=True)
        - jax.lax.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x - mean.astype(x.dtype)) * rstd.astype(x.dtype))
    if relu:
        y = jnp.maximum(y, 0.0)
    return y, mean, rstd


def _use_pallas_in(x) -> bool:
    # Measured on the bench chip: XLA's fused reduce+normalize sustains
    # higher effective bandwidth than this kernel (0.08 ms vs 0.29 ms on
    # the 2x224x512x64 backbone map) AND inlines into neighboring
    # elementwise fusions, so the Pallas path is opt-in only.
    import os
    return (os.environ.get("OFD_PALLAS_INSTANCE_NORM", "0") == "1"
            and jax.default_backend() == "tpu" and x.shape[-1] <= 256)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  relu: bool = False) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) over (H, W), optionally fused with ReLU.

    x: [B, H, W, C]. Stats in f32, normalize in x.dtype (bf16 rounding of
    the normalized value is within the network's own precision).
    """
    if _use_pallas_in(x):
        return _instance_norm_fwd_pallas(x, eps, relu)[0]
    return _instance_norm_xla(x, eps, relu)[0]


def _in_fwd(x, eps, relu):
    if _use_pallas_in(x):
        y, mean, rstd = _instance_norm_fwd_pallas(x, eps, relu)
    else:
        y, mean, rstd = _instance_norm_xla(x, eps, relu)
    return y, (x, mean, rstd, y if relu else None)


def _in_bwd(eps, relu, res, g):
    x, mean, rstd, y_relu = res
    n = x.shape[1] * x.shape[2]
    g = g.astype(jnp.float32)
    if relu:
        g = jnp.where(y_relu > 0, g, 0.0)
    yhat = (x.astype(jnp.float32) - mean) * rstd     # pre-relu normalized
    g_mean = jnp.mean(g, axis=(1, 2), keepdims=True)
    gy_mean = jnp.mean(g * yhat, axis=(1, 2), keepdims=True)
    dx = rstd * (g - g_mean - yhat * gy_mean)
    return (dx.astype(x.dtype),)


instance_norm.defvjp(_in_fwd, _in_bwd)
