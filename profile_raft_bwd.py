"""RAFT backward anatomy: where do the ~10.6 ms/iteration of backward go?

Differencing experiments on the real chip (dev tool, not in the suite):

  1. train step (iters 4 vs 12) with the REAL corr chain   -> per-iter total
  2. train step with corr stubbed to zeros                 -> per-iter sans corr
     (difference = the corr chain's true in-situ cost: lookup fwd + transpose
     einsums bwd + cross-iteration d_corr accumulation + volume matmul bwd)
  3. standalone grad of ONE pyramid lookup wrt (f1, f2)
  4. standalone grad of 12 chained lookups (accumulation pattern)
     CAVEAT on 3/4: the loss is a plain sum, so the lookup cotangent is
     ALL-ONES and XLA constant-folds most of the backward — these
     standalone numbers UNDERSTATE the real in-situ backward (use the
     corr-stubbed differencing in 1/2 instead; kept as a recorded trap)
  5. standalone grad of the update block
  6. standalone grad of convex upsample

Run: python profile_raft_bwd.py   (on the tunneled chip; compiles are
server-side and variable — lines print as they land).
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

from opticalflowfromdepth_tpu.models import raft as raft_mod
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
    slopes = []
    tl = None
    for _ in range(reps):
        ts, tl = run(n0), run(n1)
        ms = (tl - ts) / (n1 - n0) * 1e3
        if ms > 0:
            slopes.append(ms)
    return float(np.median(slopes)) if slopes else tl / n1 * 1e3


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


class ZeroPyramid:
    """Stub: same output contract as CorrPyramid, no volume, no lookup.
    Keeps a cheap dependency on f1/coords so XLA cannot DCE the carry."""

    def __init__(self, fmap1, fmap2, num_levels=4, radius=4,
                 dtype=jnp.float32):
        self.dtype = dtype
        self.planes = num_levels * (2 * radius + 1) ** 2
        self.bias = (jnp.mean(fmap1) + jnp.mean(fmap2)).astype(dtype) * 1e-6

    def __call__(self, coords):
        b, h, w, _ = coords.shape
        return (jnp.zeros((b, h, w, self.planes), self.dtype)
                + self.bias + jnp.mean(coords).astype(self.dtype) * 1e-6)


def main():
    rng = np.random.default_rng(0)
    batch = fake_batch(rng)

    res = {}
    for iters in (4, 12):
        res[f"step_{iters}"] = time_train_step(iters, batch)
        print(f"train step iters={iters}: {res[f'step_{iters}']:.1f} ms",
              flush=True)
    per_iter = (res["step_12"] - res["step_4"]) / 8
    print(f"per-iteration (real corr): {per_iter:.2f} ms", flush=True)

    # corr chain stubbed out ------------------------------------------------
    real = raft_mod.CorrPyramid
    raft_mod.CorrPyramid = ZeroPyramid
    try:
        for iters in (4, 12):
            res[f"zstep_{iters}"] = time_train_step(iters, batch)
            print(f"train step (corr=0) iters={iters}: "
                  f"{res[f'zstep_{iters}']:.1f} ms", flush=True)
    finally:
        raft_mod.CorrPyramid = real
    zper = (res["zstep_12"] - res["zstep_4"]) / 8
    print(f"per-iteration (corr=0):   {zper:.2f} ms", flush=True)
    print(f"=> corr chain in-situ per-iteration: {per_iter - zper:.2f} ms",
          flush=True)

    # standalone grads ------------------------------------------------------
    f1 = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 256)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 256)).astype(np.float32))
    coords = [jnp.asarray(rng.uniform(0, 40, (B, H8, W8, 2))
                          .astype(np.float32)) for _ in range(12)]

    @jax.jit
    def lookup1_grad(f1, f2, c):
        def f(f1, f2):
            p = CorrPyramid(f1, f2, dtype=jnp.bfloat16)
            return jnp.sum(p(c).astype(jnp.float32))
        g1, g2 = jax.grad(f, argnums=(0, 1))(f1, f2)
        return jnp.sum(g1) + jnp.sum(g2)
    print(f"grad of 1 lookup (incl pyr build bwd): "
          f"{chain_ms(lambda: lookup1_grad(f1, f2, coords[0])):.2f} ms",
          flush=True)

    @jax.jit
    def lookup12_grad(f1, f2, *cs):
        def f(f1, f2):
            p = CorrPyramid(f1, f2, dtype=jnp.bfloat16)
            return sum(jnp.sum(p(c).astype(jnp.float32)) for c in cs)
        g1, g2 = jax.grad(f, argnums=(0, 1))(f1, f2)
        return jnp.sum(g1) + jnp.sum(g2)
    t12 = chain_ms(lambda: lookup12_grad(f1, f2, *coords))
    print(f"grad of 12 lookups: {t12:.2f} ms", flush=True)

    @jax.jit
    def lookup12_fwd(f1, f2, *cs):
        p = CorrPyramid(f1, f2, dtype=jnp.bfloat16)
        return sum(jnp.sum(p(c).astype(jnp.float32)) for c in cs)
    tf12 = chain_ms(lambda: lookup12_fwd(f1, f2, *coords))
    print(f"fwd of 12 lookups:  {tf12:.2f} ms", flush=True)

    # update block fwd+bwd
    ub = raft_mod.BasicUpdateBlock(4 * 81, hidden_dim=128,
                                   dtype=jnp.bfloat16)
    net = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 128)).astype(np.float32))
    corr = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 324)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 2, (B, H8, W8, 2)).astype(np.float32))
    ubv = ub.init(jax.random.PRNGKey(0), net, inp, corr, flow)

    @jax.jit
    def ub_grad(v, net, inp, corr, flow):
        def f(v, net, inp, corr):
            n2, m, d = ub.apply(v, net, inp, corr, flow)
            return (jnp.sum(d.astype(jnp.float32)) +
                    jnp.sum(m.astype(jnp.float32)) +
                    jnp.sum(n2.astype(jnp.float32)))
        g = jax.grad(f, argnums=(0, 1, 2, 3))(v, net, inp, corr)
        return sum(jnp.sum(jax.flatten_util.ravel_pytree(x)[0]) for x in g)
    print(f"update block fwd+bwd (1 iter): "
          f"{chain_ms(lambda: ub_grad(ubv, net, inp, corr, flow)):.2f} ms",
          flush=True)

    # convex upsample fwd+bwd
    mask = jnp.asarray(rng.normal(0, 1, (B, H8, W8, 576)).astype(np.float32))

    @jax.jit
    def ups_grad(mask, flow):
        def f(mask, flow):
            return jnp.sum(raft_mod.convex_upsample(
                flow, mask, dtype=jnp.bfloat16).astype(jnp.float32))
        g1, g2 = jax.grad(f, argnums=(0, 1))(mask, flow)
        return jnp.sum(g1) + jnp.sum(g2)
    print(f"convex upsample fwd+bwd (1 iter): "
          f"{chain_ms(lambda: ups_grad(mask, flow)):.2f} ms", flush=True)


if __name__ == "__main__":
    import jax.flatten_util  # noqa: F401  (used in ub_grad)
    main()
