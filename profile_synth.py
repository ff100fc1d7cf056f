"""Stage breakdown of per-image synthesis on the real TPU.

Times (fenced, chain-differenced like bench.py): the group program, each
distinct augment-type program (vmapped over its schedule occurrences), and
the pack/f16 programs. Development tool, not part of the test suite.
"""
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

from opticalflowfromdepth_tpu.synth import pipeline as P

H, W = 384, 512


def chain_ms(enqueue, fence, n0=2, n1=8, reps=2):
    def run(n):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = enqueue(i)
        float(fence(r))
        return time.perf_counter() - t0
    run(1); run(n0)
    best = None
    for _ in range(reps):
        ts, tl = run(n0), run(n1)
        ms = (tl - ts) / (n1 - n0) * 1e3
        if ms > 0:
            best = ms if best is None else min(best, ms)
    return best if best is not None else run(n1) / n1 * 1e3


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (3, H, W)).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = jnp.asarray((120 + 80 * np.sin(xx / 37) * np.cos(yy / 53) +
                         rng.uniform(0, 30, (H, W))
                         ).astype(np.float32)[None])

    key = jax.random.PRNGKey(0)

    # --- group program ------------------------------------------------------
    ms = chain_ms(
        lambda i: P._jit_group(jax.random.fold_in(key, i), img, depth, False),
        lambda pairs: jnp.sum(pairs[0].flow_ab))
    print(f"{'group (5 pairs)':22s} {ms:8.2f} ms", flush=True)
    total = ms

    pairs = P._jit_group(key, img, depth, False)
    stacked = P.Pair(*(jnp.stack([getattr(p, f) for p in pairs])
                       for f in P.Pair._fields))

    # --- one augment program per type, vmapped over its occurrences --------
    for t in sorted(set(P.AUGMENT_SCHEDULE)):
        occ = P.AUGMENT_SCHEDULE.count(t)
        n_in = 5 * occ
        rep = P.Pair(*(jnp.repeat(x, occ, axis=0) for x in stacked))
        keys = jnp.stack([jax.random.fold_in(key, j) for j in range(n_in)])
        fn = P._jit_augment(t)
        ms = chain_ms(lambda i, fn=fn, keys=keys, rep=rep: fn(keys, rep),
                      lambda out: jnp.sum(out.set1[0][2]))
        print(f"type {t} x{occ} (vmap {n_in:2d})   {ms:8.2f} ms", flush=True)
        total += ms

    # --- packing ------------------------------------------------------------
    out = P.synthesize_sample_packed(key, img, depth)
    jax.block_until_ready(out)
    print(f"{'TOTAL (group+aug)':22s} {total:8.2f} ms -> "
          f"{1000.0 / total:.3f} img/s upper bound", flush=True)


if __name__ == "__main__":
    main()
