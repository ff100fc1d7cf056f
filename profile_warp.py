"""Micro-benchmark of synthesis primitives + candidate forward-warp
reformulations on the real TPU. Development tool."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_ofd_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from opticalflowfromdepth_tpu.ops.forward_warp import (
    forward_warp, _float_to_sortable_int)
from opticalflowfromdepth_tpu.ops.inpaint import inpaint
from opticalflowfromdepth_tpu.core.geometry import pixel_grid

H, W = 384, 512
B = 15  # the vmap width of the hot augment programs


def chain_ms(fn, args, n0=2, n1=10, reps=2):
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
        return time.perf_counter() - t0
    run(1); run(n0)
    best = None
    for _ in range(reps):
        ts, tl = run(n0), run(n1)
        ms = (tl - ts) / (n1 - n0) * 1e3
        if ms > 0:
            best = ms if best is None else min(best, ms)
    return best if best is not None else run(n1) / n1 * 1e3


# --- candidate: two-pass int32 scatter-min (sort-free) ----------------------

def forward_warp_scatter(obj, flow, depth):
    c, h, w = obj.shape
    n = h * w
    p0 = pixel_grid(h, w)
    p1 = p0 + flow
    tx = jnp.clip(p1[0], 0, w - 1).astype(jnp.int32).reshape(n)
    ty = jnp.clip(p1[1], 0, h - 1).astype(jnp.int32).reshape(n)
    tgt = ty * w + tx

    depth_key = _float_to_sortable_int(depth.reshape(n))
    src = jnp.arange(n, dtype=jnp.int32)
    BIG = jnp.int32(2147483647)

    dmin = jnp.full((n,), BIG, jnp.int32).at[tgt].min(depth_key)
    hit = dmin < BIG
    is_win = depth_key == dmin[tgt]
    win_idx = jnp.where(is_win, tgt, n)
    winner = jnp.full((n,), BIG, jnp.int32).at[win_idx].min(src, mode="drop")

    gather_src = jnp.where(hit, winner, 0)
    win_depth = depth.reshape(n)[gather_src]
    write_ok = hit & (win_depth < 1000.0)
    out = jnp.where(write_ok[None, :], obj.reshape(c, n)[:, gather_src], 0.0)
    valid = hit.astype(jnp.float32).reshape(1, h, w)
    collision = (hit & ~(win_depth < 1000.0)).astype(jnp.float32)
    return out.reshape(c, h, w), valid, collision.reshape(1, h, w)


# --- candidate: 2-key stable sort (drop explicit raster key) -----------------

def forward_warp_sort2(obj, flow, depth):
    c, h, w = obj.shape
    n = h * w
    p0 = pixel_grid(h, w)
    p1 = p0 + flow
    tx = jnp.clip(p1[0], 0, w - 1).astype(jnp.int32).reshape(n)
    ty = jnp.clip(p1[1], 0, h - 1).astype(jnp.int32).reshape(n)
    tgt = ty * w + tx
    depth_key = _float_to_sortable_int(depth.reshape(n))
    src = jnp.arange(n, dtype=jnp.int32)
    s_tgt, _, s_src = lax.sort((tgt, depth_key, src), num_keys=2,
                               is_stable=True)
    is_head = jnp.concatenate([jnp.ones((1,), bool), s_tgt[1:] != s_tgt[:-1]])
    scatter_idx = jnp.where(is_head, s_tgt, n)
    winner = jnp.full((n,), -1, jnp.int32).at[scatter_idx].set(
        s_src, mode="drop")
    hit = winner >= 0
    gather_src = jnp.maximum(winner, 0)
    win_depth = depth.reshape(n)[gather_src]
    write_ok = hit & (win_depth < 1000.0)
    out = jnp.where(write_ok[None, :], obj.reshape(c, n)[:, gather_src], 0.0)
    valid = hit.astype(jnp.float32).reshape(1, h, w)
    collision = (hit & ~(win_depth < 1000.0)).astype(jnp.float32)
    return out.reshape(c, h, w), valid, collision.reshape(1, h, w)


def main():
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.uniform(0, 255, (B, 4, H, W)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 12, (B, 2, H, W)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 100, (B, 1, H, W)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 255, (B, 3, H, W)).astype(np.float32))
    valid = (jnp.asarray(rng.uniform(0, 1, (B, 1, H, W))) > 0.2
             ).astype(jnp.float32)
    coll = jnp.zeros((B, 1, H, W), jnp.float32)

    variants = [
        ("warp sort3 (current)", jax.jit(jax.vmap(forward_warp))),
        ("warp sort2-stable", jax.jit(jax.vmap(forward_warp_sort2))),
        ("warp scatter-min", jax.jit(jax.vmap(forward_warp_scatter))),
    ]
    ref = None
    for name, fn in variants:
        out = jax.tree.map(np.asarray, fn(obj, flow, depth))
        if ref is None:
            ref = out
        else:
            for a, b in zip(ref, out):
                np.testing.assert_array_equal(a, b)
        ms = chain_ms(fn, (obj, flow, depth))
        print(f"{name:24s} {ms:8.2f} ms  (vmap {B})", flush=True)

    fn_inp = jax.jit(jax.vmap(inpaint))
    ms = chain_ms(fn_inp, (img, valid, coll))
    print(f"{'inpaint pull-push':24s} {ms:8.2f} ms  (vmap {B})", flush=True)


if __name__ == "__main__":
    main()
