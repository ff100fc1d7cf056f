"""Z-buffer forward-warp splatting — the TPU-native equivalent of fw_cuda (N1).

Reference semantics (`/root/reference/alt_cuda/fw.py:19-59`,
`/root/reference/alt_cuda/fw_cuda_kernel.cu:10-49`):

  * target coords: ``(y, x) = trunc(clamp(p0 + flow, 0, size-1))``;
  * each source pixel scatters ``obj[:, j, i]`` to its target; the writer with
    the **smallest depth** wins; among equal depths the **first pixel in
    raster order** wins (the CUDA kernel raster-scans serially with a strict
    ``<`` depth test against a z-buffer initialized to 1000);
  * ``valid[y, x] = 1`` iff any source pixel targets (y, x);
  * ``collision[y, x] = 1`` iff (y, x) is targeted but no writer passed the
    depth test (i.e. min writer depth >= 1000) — all-zero for depths < 1000.

TPU-native design: the serial raster scan does not map to TPU. Instead we
express "min-depth writer wins with raster-order tie-break" as ONE
lexicographic 3-key sort (target index, order-preserving depth bits, source
index) followed by a unique-index scatter of each run's head — O(N log N),
fully parallel, deterministic by construction (SURVEY.md §5.2), and
vmap/jit-friendly. No atomics, no races, no data-dependent shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.geometry import pixel_grid

ZBUF_INIT = 1000.0  # `fw_cuda.cpp:58` — dlut init value


def _float_to_sortable_int(x: jnp.ndarray) -> jnp.ndarray:
    """Map float32 -> int32 preserving order (handles negatives/zeros)."""
    bits = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(bits < 0, jnp.int32(-2147483648) - bits - 1, bits)


def forward_warp(obj: jnp.ndarray, flow: jnp.ndarray, depth: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward-warp ``obj`` along ``flow`` with a nearest-depth z-buffer.

    Args:
      obj:   [C, H, W] channels to splat.
      flow:  [2, H, W] flow in pixels; channel 0 = x, channel 1 = y.
      depth: [1, H, W] source depth (smaller = closer = wins).

    Returns:
      (output [C, H, W], valid [1, H, W], collision [1, H, W]) — float32,
      masks binary, exactly the reference contract.
    """
    c, h, w = obj.shape
    n = h * w

    p0 = pixel_grid(h, w)  # [2, H, W], (x, y)
    p1 = p0 + flow
    # clamp then truncate toward zero (values are >= 0 after clamp, so
    # floor == trunc), matching `fw.py:37-42`.
    tx = jnp.clip(p1[0], 0, w - 1).astype(jnp.int32).reshape(n)
    ty = jnp.clip(p1[1], 0, h - 1).astype(jnp.int32).reshape(n)
    tgt = ty * w + tx  # [N] flattened target index

    depth_key = _float_to_sortable_int(depth.reshape(n))
    src = jnp.arange(n, dtype=jnp.int32)

    # One lexicographic sort keyed by (target, depth, raster order): the head
    # of each equal-target run is exactly the CUDA kernel's winning writer.
    s_tgt, _, s_src = lax.sort((tgt, depth_key, src), num_keys=3)
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), s_tgt[1:] != s_tgt[:-1]])

    # Scatter run heads; non-heads are routed out of bounds and dropped, so
    # all written indices are unique (no scatter races by construction).
    scatter_idx = jnp.where(is_head, s_tgt, n)
    winner = jnp.full((n,), -1, jnp.int32).at[scatter_idx].set(
        s_src, mode="drop")

    hit = winner >= 0
    gather_src = jnp.maximum(winner, 0)
    win_depth = depth.reshape(n)[gather_src]
    write_ok = hit & (win_depth < ZBUF_INIT)

    obj_flat = obj.reshape(c, n)
    out = jnp.where(write_ok[None, :], obj_flat[:, gather_src], 0.0)

    valid = hit.astype(jnp.float32).reshape(1, h, w)
    collision = (hit & ~(win_depth < ZBUF_INIT)).astype(jnp.float32)
    return (out.reshape(c, h, w).astype(jnp.float32),
            valid, collision.reshape(1, h, w))


forward_warp_batch = jax.vmap(forward_warp, in_axes=(0, 0, 0))


def forward_warp_flip(obj: jnp.ndarray, depth: jnp.ndarray,
                      horizontal: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``forward_warp(obj, flip_flow, depth)`` without the sort.

    When the warping flow is the mirror field from
    ``core.special_flow.flip_flow``, the integer target map is exactly the
    mirror permutation: ``p1 = p0 + (mirror - p0)`` is exact in f32
    (integer grid coords < 2^23), in-range (clamp inactive) and bijective,
    so every target has exactly one writer and the z-buffer degenerates —
    ``valid`` is all-ones and the depth test reduces to the per-pixel
    ``depth < ZBUF_INIT`` check. Equality with the generic warp is pinned
    by `tests/test_forward_warp.py::test_flip_fast_path_exact`.

    This replaces a 196k-element 3-key sort (~4.6 ms on v5e at 384x512)
    with a reversal — the synthesis engine's hottest call (3 of the 6
    warps per geometric augmentation warp along the special flow).
    """
    ax = 2 if horizontal else 1
    f_obj = jnp.flip(obj, axis=ax)
    f_depth = jnp.flip(depth, axis=ax)
    write_ok = f_depth < ZBUF_INIT
    out = jnp.where(write_ok, f_obj, 0.0)
    valid = jnp.ones_like(depth, jnp.float32)
    collision = (~write_ok).astype(jnp.float32)
    return out.astype(jnp.float32), valid, collision


def concat_flow(flow_ab: jnp.ndarray, back_flow_ab: jnp.ndarray,
                flow_bc: jnp.ndarray, depth_b: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose flow A->B with flow B->C: warp flowBC back into frame A.

    ``concat = (forward_warp(flowBC, by=back_flowAB, depth_B) + flowAB) * valid``

    Reference: `preprocess.py:301-313` (ConcatFlow.forward).
    """
    warped, valid, _ = forward_warp(flow_bc, back_flow_ab, depth_b)
    return (warped + flow_ab) * valid, valid


def back_flow(flow_ab: jnp.ndarray, depth_a: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward flow: forward-warp of (-flowAB) by flowAB itself.

    Reference: `preprocess.py:315-326` (BackFlow.forward).
    """
    warped, valid, _ = forward_warp(flow_ab, flow_ab, depth_a)
    return (warped * -1.0) * valid, valid
