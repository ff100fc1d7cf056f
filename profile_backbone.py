"""Per-layer latency breakdown of the GMFlow backbone on the real TPU.

Times progressively-deeper prefixes of CNNEncoder at Sintel eval shape
(2x448x1024 concat batch, bf16) with fenced chain differencing.
Development tool, not part of the test suite.
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
from flax import linen as nn

from opticalflowfromdepth_tpu.models import gmflow as G
from opticalflowfromdepth_tpu.models.layers import Conv, InstanceNorm

H, W = 448, 1024
DTYPE = jnp.bfloat16


def chain_ms(fn, args, n0=3, n1=23, reps=3):
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        float(r)
        return time.perf_counter() - t0
    run(1); run(n0)
    best = None
    for _ in range(reps):
        ts, tl = run(n0), run(n1)
        ms = (tl - ts) / (n1 - n0) * 1e3
        if ms > 0:
            best = ms if best is None else min(best, ms)
    return best


class Prefix(nn.Module):
    """First `depth` units of CNNEncoder (0=stem, 1..6=res blocks, 7=+1x1)."""
    depth: int = 7

    @nn.compact
    def __call__(self, x):
        dims = (64, 96, 128)
        x = Conv(dims[0], (7, 7), 2, use_bias=False, dtype=DTYPE)(x)
        x = nn.relu(InstanceNorm()(x))
        blocks = [(dims[0], 1), (dims[0], 1), (dims[1], 2), (dims[1], 1),
                  (dims[2], 2), (dims[2], 1)]
        for i, (d, s) in enumerate(blocks):
            if i + 1 > self.depth:
                return x
            x = G._ResBlock(d, s, dtype=DTYPE)(x)
        if self.depth >= 7:
            x = Conv(128, (1, 1), dtype=DTYPE)(x)
        return x


def main():
    rng = np.random.default_rng(0)
    xin = jnp.asarray(
        rng.uniform(-1, 1, (2, H // 1, W // 1, 3)).astype(np.float32)
    ).astype(DTYPE)

    prev = 0.0
    for depth, label in [(0, "stem 7x7/2 +IN+relu"),
                         (1, "res1a 64 @224x512"),
                         (2, "res1b 64"),
                         (3, "res2a 96/2 @112x256"),
                         (4, "res2b 96"),
                         (5, "res3a 128/2 @56x128"),
                         (6, "res3b 128"),
                         (7, "1x1 -> 128")]:
        mod = Prefix(depth=depth)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), xin)
        fn = jax.jit(lambda vv, a, m=mod: jnp.sum(
            m.apply(vv, a).astype(jnp.float32)))
        ms = chain_ms(fn, (v, xin))
        print(f"{label:24s} cum {ms:7.3f} ms   delta {ms - prev:7.3f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
