"""RAFT training-step latency anatomy on the real TPU (VERDICT r3 item 3).

Uses bench.py's enqueue-chain differencing. The per-GRU-iteration cost is
isolated by differencing whole programs over ``iters`` (step(12) vs
step(4) -> 8 marginal iterations), which charges each iteration with its
true share of forward + remat-recompute + backward. Fixed costs
(encoders, pyramid build, loss, optimizer) come out as the intercept and
are cross-checked by timing the pieces standalone. Not part of the test
suite — a development tool.
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

from opticalflowfromdepth_tpu.models.raft import RAFT, convex_upsample
from opticalflowfromdepth_tpu.ops.correlation import CorrPyramid
from opticalflowfromdepth_tpu.train import raft_train as rt

B, H, W = 4, 368, 496
H8, W8 = H // 8, W // 8


def chain_ms(fn, n0=2, n1=8, reps=2):
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        float(r)
        return time.perf_counter() - t0
    run(1); run(n0)
    best = None
    tl = None
    for _ in range(reps):
        ts, tl = run(n0), run(n1)
        ms = (tl - ts) / (n1 - n0) * 1e3
        if ms > 0:
            best = ms if best is None else min(best, ms)
    if best is None:  # clock noise: honest upper bound instead of None
        best = tl / n1 * 1e3
    return best


def fake_batch(rng):
    return {
        "image1": jnp.asarray(
            rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "image2": jnp.asarray(
            rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        "flow": jnp.asarray(rng.normal(0, 10, (B, H, W, 2)).astype(np.float32)),
        "valid": jnp.ones((B, H, W), jnp.float32),
        "label": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (B, 1)),
    }


def time_train_step(iters: int, batch) -> float:
    cfg = rt.RAFTTrainConfig(batch_size=B, image_size=(H, W),
                             mixed_precision=True, iters=iters)
    state = rt.init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(rt.make_train_step(cfg), donate_argnums=0)
    key = jax.random.PRNGKey(1)
    holder = {"s": state}

    def one():
        s, m = step(holder["s"], batch, key)
        holder["s"] = s
        return m["total_loss"]
    return chain_ms(one)


def time_fwd(iters: int, variables, model, img1, img2) -> float:
    @jax.jit
    def fwd(v, a, b):
        outs = model.apply(v, a, b, iters=iters, train=False)
        return jnp.sum(outs[-1])
    return chain_ms(lambda: fwd(variables, img1, img2))


def main():
    rng = np.random.default_rng(0)
    batch = fake_batch(rng)
    img1, img2 = batch["image1"], batch["image2"]

    model = RAFT(small=False, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img1, img2)
    jax.block_until_ready(variables)

    results = {}
    for iters in (4, 12):
        results[f"fwd_{iters}"] = time_fwd(iters, variables, model,
                                           img1, img2)
        print(f"fwd iters={iters}: {results[f'fwd_{iters}']:.2f} ms",
              flush=True)
    for iters in (4, 12):
        results[f"step_{iters}"] = time_train_step(iters, batch)
        print(f"train step iters={iters}: {results[f'step_{iters}']:.2f} ms",
              flush=True)

    per_iter_fwd = (results["fwd_12"] - results["fwd_4"]) / 8
    per_iter_step = (results["step_12"] - results["step_4"]) / 8
    print(f"\nper-iteration fwd:   {per_iter_fwd:.2f} ms")
    print(f"per-iteration train: {per_iter_step:.2f} ms")
    print(f"fixed fwd (enc+pyr+dispatch):   "
          f"{results['fwd_12'] - 12 * per_iter_fwd:.2f} ms")
    print(f"fixed train (enc+pyr+loss+opt): "
          f"{results['step_12'] - 12 * per_iter_step:.2f} ms")

    # standalone pieces -------------------------------------------------
    fmap = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 256)).astype(np.float32))
    fmap2 = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 256)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(0, 40, (B, H8, W8, 2)).astype(np.float32))

    @jax.jit
    def pyr_build(f1, f2):
        p = CorrPyramid(f1, f2)
        return jnp.sum(p.levels[-1])

    @jax.jit
    def pyr_lookup(f1, f2, c):
        p = CorrPyramid(f1, f2)
        return jnp.sum(p(c))
    build = chain_ms(lambda: pyr_build(fmap, fmap2))
    print(f"pyramid build: {build:.2f} ms")
    look = chain_ms(lambda: pyr_lookup(fmap, fmap2, coords))
    print(f"one lookup (incl build diff): {look - build:.2f} ms")

    # update block alone (bf16), one iteration
    from opticalflowfromdepth_tpu.models.raft import BasicUpdateBlock
    ub = BasicUpdateBlock(4 * 81, hidden_dim=128, dtype=jnp.bfloat16)
    net = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 128)).astype(np.float32))
    corr = jnp.asarray(
        rng.normal(0, 1, (B, H8, W8, 324)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 2, (B, H8, W8, 2)).astype(np.float32))
    ubv = ub.init(jax.random.PRNGKey(0), net, inp, corr, flow)

    @jax.jit
    def ub_fwd(v, net, inp, corr, flow):
        n2, m, d = ub.apply(v, net, inp, corr, flow)
        return jnp.sum(d.astype(jnp.float32)) + jnp.sum(m.astype(jnp.float32))
    print(f"update block (1 iter fwd): "
          f"{chain_ms(lambda: ub_fwd(ubv, net, inp, corr, flow)):.2f} ms")

    @jax.jit
    def ups(mask, flow):
        return jnp.sum(convex_upsample(flow, mask))
    mask = jnp.asarray(
        rng.normal(0, 1, (B, H8, W8, 576)).astype(np.float32))
    print(f"convex upsample (1 iter): "
          f"{chain_ms(lambda: ups(mask, flow)):.2f} ms")


if __name__ == "__main__":
    main()
