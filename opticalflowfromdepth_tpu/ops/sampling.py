"""Bilinear sampling (grid_sample equivalents) and flow warping.

TPU-native gather-based re-implementation of the reference's samplers:
  * RAFT `core/utils/utils.py:57-71`  (bilinear_sampler, align_corners=True,
    zero padding)
  * GMFlow `gmflow/geometry.py:41-72` (bilinear_sample / flow_warp)

Semantics match torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True): out-of-range corner taps
contribute zero, so samples fade to 0 outside the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.geometry import pixel_grid


def bilinear_gather(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """Sample img [C, H, W] at continuous pixel coords x, y (same shape S).

    Returns [C, *S]. Out-of-bounds taps contribute zero (zero padding).
    """
    c, h, w = img.shape
    s = x.shape
    x = x.reshape(-1)
    y = y.reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    out = jnp.zeros((c, x.shape[0]), img.dtype)
    img_flat = img.reshape(c, h * w)
    for ox, oy, wgt in (
        (0, 0, (1 - dx) * (1 - dy)),
        (1, 0, dx * (1 - dy)),
        (0, 1, (1 - dx) * dy),
        (1, 1, dx * dy),
    ):
        xi = x0 + ox
        yi = y0 + oy
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c
        vals = img_flat[:, idx]  # [C, N]
        out = out + vals * (wgt * inb)[None, :].astype(img.dtype)
    return out.reshape((c,) + s)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """torch-style grid_sample for one image.

    img: [C, H, W]; grid: [..., 2] normalized coords in [-1, 1], (x, y) order.
    Returns [C, ...]. padding_mode='zeros'.
    """
    _, h, w = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) / 2.0 * (w - 1)
        y = (gy + 1.0) / 2.0 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) / 2.0
        y = ((gy + 1.0) * h - 1.0) / 2.0
    return bilinear_gather(img, x, y)


def _resize_weights_1d(n_in: int, n_out: int) -> jnp.ndarray:
    """[n_out, n_in] bilinear interpolation matrix, align_corners=True.

    Row i holds the two-tap weights for source coordinate
    i*(n_in-1)/(n_out-1) — exactly torch's
    F.interpolate(mode='bilinear', align_corners=True) sampling grid.
    """
    if n_in == 1 or n_out == 1:
        w = jnp.zeros((n_out, n_in), jnp.float32)
        return w.at[:, 0].set(1.0)
    src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(src), 0, n_in - 2).astype(jnp.int32)
    frac = src - lo.astype(jnp.float32)
    w = jnp.zeros((n_out, n_in), jnp.float32)
    rows = jnp.arange(n_out)
    w = w.at[rows, lo].set(1.0 - frac)
    w = w.at[rows, lo + 1].add(frac)
    return w


def resize_bilinear_align_corners(x: jnp.ndarray, new_h: int, new_w: int
                                  ) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] with align_corners=True semantics.

    Matches torch F.interpolate(..., mode='bilinear', align_corners=True)
    (the reference's intermediate flow upsampling, `gmflow/gmflow.py:70-71,
    122` and RAFT `core/utils/utils.py:80-83`), which jax.image.resize
    ('linear' = half-pixel centers) does not. Implemented as two separable
    interpolation matmuls — exact, static-shaped, and MXU-friendly.
    """
    b, h, w, c = x.shape
    out = x.astype(jnp.float32)
    if new_h != h:
        wh = _resize_weights_1d(h, new_h)
        out = jnp.einsum("oh,bhwc->bowc", wh, out,
                         precision=jax.lax.Precision.HIGHEST)
    if new_w != w:
        ww = _resize_weights_1d(w, new_w)
        out = jnp.einsum("ow,bhwc->bhoc", ww, out,
                         precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def flow_warp(feature: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``feature`` [B, C, H, W] by ``flow`` [B, 2, H, W].

    Samples feature at (grid + flow); reference `gmflow/geometry.py:65-72`.
    """
    b, c, h, w = feature.shape
    grid = pixel_grid(h, w)[None] + flow  # [B, 2, H, W]
    x = grid[:, 0]
    y = grid[:, 1]
    return jax.vmap(bilinear_gather)(feature, x, y)
