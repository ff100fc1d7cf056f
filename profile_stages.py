"""Stage-by-stage GMFlow latency breakdown on the real TPU.

Uses the same enqueue-chain differencing as bench.py (see its docstring) to
time: backbone only, backbone+transformer, backbone+transformer+matching,
full model. Not part of the test suite — a development tool.
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

H, W = 448, 1024
DTYPE = jnp.bfloat16


def chain_ms(fn, args, n0=3, n1=23, reps=3):
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        float(r)  # host fetch = real fence (block_until_ready lies on axon)
        return time.perf_counter() - t0
    run(1); run(n0)
    best = None
    for _ in range(reps):
        ts, tl = run(n0), run(n1)
        ms = (tl - ts) / (n1 - n0) * 1e3
        if ms > 0:
            best = ms if best is None else min(best, ms)
    return best


def main():
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    model = G.GMFlow(num_scales=1, dtype=DTYPE)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)

    @jax.jit
    def full(v, a, b):
        out = model.apply(v, a, b, attn_splits_list=(2,),
                          corr_radius_list=(-1,), prop_radius_list=(-1,),
                          training=False)
        return jnp.sum(out["flow_preds"][-1])

    # --- stage models sharing the same params ------------------------------
    class BackboneOnly(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            a, b = G.normalize_img(a, b)
            concat = jnp.concatenate([a, b], axis=0).astype(DTYPE)
            feats = G.CNNEncoder(128, num_output_scales=1, dtype=DTYPE,
                                 name="backbone")(concat)
            return feats[0]

    class UpToTransformer(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            a, b = G.normalize_img(a, b)
            concat = jnp.concatenate([a, b], axis=0).astype(DTYPE)
            feat = G.CNNEncoder(128, num_output_scales=1, dtype=DTYPE,
                                name="backbone")(concat)[0]
            f0, f1 = jnp.split(feat.astype(jnp.float32), 2, axis=0)
            f0, f1 = G.feature_add_position(f0, f1, 2, 128)
            f0, f1 = G.FeatureTransformer(6, 128, 4, dtype=DTYPE,
                                          name="transformer")(
                f0.astype(DTYPE), f1.astype(DTYPE), attn_num_splits=2)
            return jnp.sum(f0.astype(jnp.float32))

    class UpToMatching(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            a, b = G.normalize_img(a, b)
            concat = jnp.concatenate([a, b], axis=0).astype(DTYPE)
            feat = G.CNNEncoder(128, num_output_scales=1, dtype=DTYPE,
                                name="backbone")(concat)[0]
            f0, f1 = jnp.split(feat.astype(jnp.float32), 2, axis=0)
            f0, f1 = G.feature_add_position(f0, f1, 2, 128)
            f0, f1 = G.FeatureTransformer(6, 128, 4, dtype=DTYPE,
                                          name="transformer")(
                f0.astype(DTYPE), f1.astype(DTYPE), attn_num_splits=2)
            flow = G.global_correlation_softmax(
                f0.astype(jnp.float32), f1.astype(jnp.float32))[0]
            return jnp.sum(flow)

    for name, mod in [("backbone", BackboneOnly()),
                      ("+transformer", UpToTransformer()),
                      ("+matching", UpToMatching())]:
        fn = jax.jit(lambda v, a, b, m=mod: jnp.sum(
            jnp.asarray(m.apply(v, a, b), jnp.float32)))
        ms = chain_ms(fn, (variables, img0, img1))
        print(f"{name:15s} {ms:7.3f} ms", flush=True)

    ms = chain_ms(full, (variables, img0, img1))
    print(f"{'full':15s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
