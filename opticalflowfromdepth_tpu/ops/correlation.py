"""RAFT correlation volumes: dense pyramid + on-demand lookup (N2).

Two interchangeable implementations mirroring the reference:

  * :class:`CorrPyramid` — the default all-pairs volume
    (`adjusted_RAFT/core/corr.py:12-60`): one [B, H1*W1, H2, W2] matmul on the
    MXU, average-pooled into ``num_levels`` levels, then bilinear window
    lookups per GRU iteration.

  * :func:`on_demand_corr` — the memory-efficient path replacing the
    alt_cuda_corr CUDA kernel (`adjusted_RAFT/alt_cuda_corr/
    correlation_kernel.cu`, `core/corr.py:63-91`). The CUDA kernel computes
    dots at integer neighbors and bilinearly *scatters* into the output
    window; by linearity this equals ``dot(f1, bilinear_sample(f2_level,
    coords + delta))``, which is what we compute — batched dots on the MXU,
    no H^2W^2 volume, differentiable through XLA (no hand-written backward
    needed; XLA derives the fused VJP).

Scaling note (SURVEY.md §2.6): for very large images the query axis (H1*W1)
can be sharded across the mesh — both forms are batched matmuls over that
axis, so a `shard_map` over queries composes directly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _avg_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool over the trailing two dims of [..., H, W]."""
    s = lax.reduce_window(x, 0.0, lax.add,
                          (1,) * (x.ndim - 2) + (2, 2),
                          (1,) * (x.ndim - 2) + (2, 2), "VALID")
    return s / 4.0


def _window_delta(radius: int) -> jnp.ndarray:
    """[(2r+1)^2, 2] window offsets in (x, y) order, **x-major** flattening.

    Matches `corr.py:37-43` exactly, including its coordinate quirk: the
    reference builds ``delta = stack(meshgrid(dy, dx), -1)`` — last dim
    (dy, dx) — and adds it to (x, y) centroids, so the value called "dy"
    offsets x and varies along the *major* window axis. The sampled offset
    set is the same symmetric square either way, but the channel order of
    the (2r+1)^2 lookups is x-major; ported reference checkpoints (whose
    convc1 1x1 weights are trained against that order) depend on it.
    """
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    xo, yo = jnp.meshgrid(d, d, indexing="ij")  # xo varies along axis 0
    return jnp.stack([xo.reshape(-1), yo.reshape(-1)], axis=-1)


def _bilinear_lookup_flat(corr: jnp.ndarray, coords: jnp.ndarray,
                          h: int, w: int) -> jnp.ndarray:
    """Sample corr [B, N, h*w] at coords [B, N, K, 2] (x, y pixels).

    Zero padding outside; returns [B, N, K].
    """
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    acc = jnp.zeros(x.shape, corr.dtype)
    for ox, oy, wt in ((0, 0, (1 - dx) * (1 - dy)), (1, 0, dx * (1 - dy)),
                       (0, 1, (1 - dx) * dy), (1, 1, dx * dy)):
        xi = x0 + ox
        yi = y0 + oy
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yc * w + xc  # [B, N, K]
        vals = jnp.take_along_axis(corr, idx.reshape(*idx.shape[:2], -1),
                                   axis=-1).reshape(idx.shape)
        acc = acc + vals * (wt * inb).astype(corr.dtype)
    return acc


def _separable_window_lookup(corr: jnp.ndarray, coords: jnp.ndarray,
                             radius: int) -> jnp.ndarray:
    """Gather-free bilinear window lookup (TPU-fast path).

    corr: [B, N, hl, wl] one pyramid level; coords: [B, N, 2] (x, y) in
    level pixels. Returns [B, N, (2r+1)^2] with the reference's x-major
    window order (`_window_delta`).

    Instead of gathering (2r+1)^2 x 4 taps per query (XLA lowers
    take_along_axis to serial dynamic-slices on TPU — measured 185 ms per
    lookup at 368x496 bs4, the entire RAFT step cost), the bilinear window
    is two small batched matmuls against *indicator matrices* built from
    iota comparisons, with the bilinear weights folded in:

        out[q, ax, ay] = X[q, ax, :] @ corr[q] @ Y[q, ay, :]^T
        Y[q, ay, y] = (1-fy) [y == y0+d_ay] + fy [y == y0+d_ay+1]

    Out-of-range taps match no iota value and contribute exactly 0 — the
    zero-padding semantics of `bilinear_sampler` for free.
    """
    b, n, hl, wl = corr.shape
    r = radius
    k = 2 * r + 1
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)

    def indicator(center, fr, size):
        # [B, N, K, size]: folded two-tap bilinear indicator rows
        base = center[..., None] + d                      # [B, N, K]
        i = jnp.arange(size, dtype=jnp.float32)
        lo = (i == base[..., None]).astype(jnp.float32)
        hi = (i == base[..., None] + 1.0).astype(jnp.float32)
        return ((1.0 - fr)[..., None, None] * lo
                + fr[..., None, None] * hi).astype(corr.dtype)

    cx, cy = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    ymat = indicator(y0, cy - y0, hl)                     # [B, N, K, hl]
    xmat = indicator(x0, cx - x0, wl)                     # [B, N, K, wl]

    tmp = jnp.einsum("bnkh,bnhw->bnkw", ymat, corr,
                     preferred_element_type=jnp.float32)  # contract y
    # x-major flattening: out[.., ax, ay] matches the reference's window
    # quirk (delta "dy" applied to x varies along the major axis)
    out = jnp.einsum("bnxw,bnkw->bnxk", xmat, tmp.astype(corr.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(corr.dtype).reshape(b, n, k * k)


class CorrPyramid:
    """All-pairs correlation pyramid (dense path, `corr.py:12-60`).

    ``dtype`` is the storage/lookup compute dtype: float32 by default
    (bit-matched to the torch oracle in the parity tests); the
    mixed-precision training path passes bfloat16 — the volume (the
    dominant HBM tensor, ~170 MB at 368x496 bs4) halves and the lookup
    einsums run native-bf16 on the MXU with f32 accumulation. The
    reference's AMP consumes the lookup output in fp16 anyway
    (`raft.py:99` autocast around the update block).
    """

    def __init__(self, fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4, radius: int = 4,
                 dtype=jnp.float32):
        # fmap1, fmap2: [B, H, W, C] float32
        self.num_levels = num_levels
        self.radius = radius
        self.dtype = dtype
        b, h, w, c = fmap1.shape
        self.shape = (b, h, w)
        f1 = fmap1.astype(dtype).reshape(b, h * w, c)
        f2 = fmap2.astype(dtype).reshape(b, h * w, c)
        corr = jnp.einsum("bnc,bmc->bnm", f1, f2,
                          preferred_element_type=jnp.float32)
        corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
        corr = corr.reshape(b, h * w, h, w).astype(dtype)
        self.levels: List[jnp.ndarray] = [corr]
        for _ in range(num_levels - 1):
            corr = _avg_pool2x2(corr.astype(jnp.float32)).astype(dtype)
            self.levels.append(corr)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords: [B, H, W, 2] target positions; returns
        [B, H, W, num_levels*(2r+1)^2] lookup features (self.dtype)."""
        b, h, w, _ = coords.shape
        n = h * w
        out = []
        for i, corr in enumerate(self.levels):
            centroid = coords.reshape(b, n, 2) / (2.0 ** i)
            out.append(_separable_window_lookup(corr, centroid, self.radius))
        return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)


def on_demand_corr(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                   coords: jnp.ndarray, num_levels: int = 4,
                   radius: int = 4, dtype=jnp.float32) -> jnp.ndarray:
    """Memory-efficient correlation lookup (alternate path, N2).

    Args:
      fmap1, fmap2: [B, H, W, C] float32 feature maps (1/8 res).
      coords: [B, H, W, 2] current correspondence estimate (x, y pixels).

    Returns: [B, H, W, num_levels*(2r+1)^2] — same contract as CorrPyramid,
    computed without materializing the H^2W^2 volume. Equivalent to the CUDA
    kernel's bilinear scatter by linearity of the dot product. ``dtype``
    as in :class:`CorrPyramid` (bfloat16 under mixed precision).
    """
    b, h, w, c = fmap1.shape
    n = h * w
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    delta = _window_delta(radius)  # [K, 2]
    k = delta.shape[0]
    fmap1 = fmap1.astype(dtype)
    fmap2 = fmap2.astype(dtype)
    f1 = fmap1.reshape(b, n, c)

    out = []
    f2 = fmap2
    for i in range(num_levels):
        hl, wl = f2.shape[1], f2.shape[2]
        coords_lvl = coords.reshape(b, n, 1, 2) / (2.0 ** i) + delta[None, None]
        # bilinear-gather f2 windows: [B, N, K, C]
        x = coords_lvl[..., 0]
        y = coords_lvl[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0
        f2_flat = f2.reshape(b, hl * wl, c)
        win = jnp.zeros((b, n, k, c), fmap2.dtype)
        for ox, oy, wt in ((0, 0, (1 - dx) * (1 - dy)), (1, 0, dx * (1 - dy)),
                           (0, 1, (1 - dx) * dy), (1, 1, dx * dy)):
            xi = x0 + ox
            yi = y0 + oy
            inb = (xi >= 0) & (xi <= wl - 1) & (yi >= 0) & (yi <= hl - 1)
            xc = jnp.clip(xi, 0, wl - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, hl - 1).astype(jnp.int32)
            idx = (yc * wl + xc).reshape(b, n * k)
            vals = jnp.take_along_axis(
                f2_flat, idx[..., None], axis=1).reshape(b, n, k, c)
            win = win + vals * (wt * inb)[..., None].astype(fmap2.dtype)
        corr = (jnp.einsum("bnc,bnkc->bnk", f1, win,
                           preferred_element_type=jnp.float32)
                * scale).astype(dtype)
        out.append(corr)
        f2 = _avg_pool2x2(jnp.moveaxis(f2.astype(jnp.float32), -1, 1))
        f2 = jnp.moveaxis(f2, 1, -1).astype(dtype)
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)
