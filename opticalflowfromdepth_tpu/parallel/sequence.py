"""Sequence-parallel global matching: ring streaming-softmax over the mesh.

The reference has no sequence parallelism (SURVEY.md §2.6/§5.7) — its global
matching (`adjusted_gmflow/gmflow/matching.py:7-36`) materializes the
[B, HW, HW] correlation volume on one GPU, capping image size. The TPU-native
scale path shards the HW token axis across a mesh axis and streams the
softmax(Q·Kᵀ)·V contraction around the ring with `ppermute` (ring attention
over ICI): each device holds L/n queries and L/n targets, the full volume
never exists anywhere, and per-step compute overlaps the neighbor exchange.

With V = the pixel-coordinate grid this computes GMFlow's expected
correspondence exactly; with V = arbitrary values it is a general
ring-attention primitive.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.geometry import pixel_grid


def _ring_softmax_matmul_local(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, kmask: jnp.ndarray,
                               axis_name: str) -> jnp.ndarray:
    """Per-shard body (runs under shard_map).

    q: [B, Lq, C] local queries; k: [B, Lk, C], v: [B, Lk, D],
    kmask: [B, Lk] local targets (1 = real, 0 = padding).
    Returns softmax(q @ k_global^T / sqrt(C)) @ v_global — [B, Lq, D].
    """
    n = lax.psum(1, axis_name)
    b, lq, c = q.shape
    d = v.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_cur, v_cur, m_cur, mask_cur, s, acc, m = carry
        scores = jnp.einsum("blc,bmc->blm", q, k_cur,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask_cur[:, None, :] > 0, scores, -1e30)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        corr = jnp.exp(m - m_new)
        s = s * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("blm,bmd->bld", p, v_cur,
                                      preferred_element_type=jnp.float32)
        # rotate the K/V shard to the next device (ICI neighbor exchange)
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        mask_nxt = lax.ppermute(mask_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_cur, mask_nxt, s, acc, m_new), None

    # fresh zeros are "unvarying" under shard_map's vma tracking; mark them
    # as device-varying so the scan carry types line up.
    varying = lambda x: lax.pcast(x, (axis_name,), to="varying")  # noqa: E731
    m0 = varying(jnp.full((b, lq, 1), -1e30, jnp.float32))
    s0 = varying(jnp.zeros((b, lq, 1), jnp.float32))
    acc0 = varying(jnp.zeros((b, lq, d), jnp.float32))
    carry0 = (k.astype(q.dtype), v.astype(jnp.float32), m0,
              kmask.astype(jnp.float32), s0, acc0, m0)
    (k_f, v_f, _, mask_f, s, acc, _), _ = lax.scan(
        step, carry0, None, length=n)
    del k_f, v_f, mask_f
    return acc / jnp.maximum(s, 1e-30)


def ring_softmax_matmul(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        mesh: Mesh, axis: str = "model",
                        kmask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """softmax(q @ k^T / sqrt(C)) @ v with the token axis sharded on `axis`.

    q: [B, L, C], k: [B, L, C], v: [B, L, D] global arrays. L is padded to a
    multiple of the axis size internally. Returns [B, L, D] float32.
    """
    n = mesh.shape[axis]
    b, l, c = q.shape
    pad = (-l) % n
    if kmask is None:
        kmask = jnp.ones((b, l), jnp.float32)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        kmask = jnp.pad(kmask, ((0, 0), (0, pad)))

    body = functools.partial(_ring_softmax_matmul_local, axis_name=axis)
    spec = P(None, axis, None)
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis)),
        out_specs=spec)(q, k, v, kmask)
    return out[:, :l]


def sharded_global_matching(feature0: jnp.ndarray, feature1: jnp.ndarray,
                            mesh: Mesh, axis: str = "model"
                            ) -> Tuple[jnp.ndarray, None]:
    """Sequence-parallel `global_correlation_softmax` (drop-in contract).

    feature0/1: [B, H, W, C]; returns (flow [B, H, W, 2], None). Matches
    `models.gmflow.global_correlation_softmax` numerically while sharding the
    HW token axis over the mesh — use for images whose [L, L] volume would
    not fit one chip, or to ride ICI bandwidth at large batch.
    """
    b, h, w, c = feature0.shape
    l = h * w
    f0 = feature0.reshape(b, l, c)
    f1 = feature1.reshape(b, l, c)
    grid = jnp.moveaxis(pixel_grid(h, w), 0, -1).reshape(l, 2)
    gv = jnp.broadcast_to(grid[None], (b, l, 2))
    correspondence = ring_softmax_matmul(f0, f1, gv, mesh, axis=axis)
    flow = correspondence.reshape(b, h, w, 2) - grid.reshape(1, h, w, 2)
    return flow, None


def matching_shardings(mesh: Mesh, axis: str = "model"
                       ) -> Tuple[NamedSharding, NamedSharding]:
    """(feature, flow) shardings placing the H axis on the sequence axis —
    how callers should lay out inputs so the ring starts collective-free."""
    return (NamedSharding(mesh, P(None, axis, None, None)),
            NamedSharding(mesh, P(None, axis, None, None)))
