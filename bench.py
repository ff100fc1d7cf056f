"""Headline benchmark: GMFlow inference latency at Sintel resolution.

Mirrors the reference's `count_time` harness (`adjusted_gmflow/evaluate.py:
300-352,414-416`): warmup + timed runs of the forward pass at Sintel
436x1024 (padded to 448x1024, the eval shape), batch 1. Reference
baselines (`adjusted_gmflow/README.md:52`): 57 ms on V100, 26 ms on A100.
vs_baseline reports the A100 speedup factor (26 / ours).

Methodology: executions are CHAINED through a data dependency and the
chain is fenced by fetching one scalar — on remote/tunneled devices
`block_until_ready` can return before execution completes, which makes
naive per-call timing report dispatch latency instead of device latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
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

BASELINE_A100_MS = 26.0


def main() -> None:
    from opticalflowfromdepth_tpu.models.gmflow import GMFlow

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        h, w, chain_len, reps = 448, 1024, 10, 3
    else:  # CPU smoke mode: tiny shape, still one honest JSON line
        h, w, chain_len, reps = 64, 128, 2, 1

    model = GMFlow(num_scales=1,
                   dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)

    @jax.jit
    def fwd_chain(variables, img0, img1, carry):
        out = model.apply(variables, img0 + carry * 0.0, img1,
                          attn_splits_list=(2,), corr_radius_list=(-1,),
                          prop_radius_list=(-1,), training=False)
        return jnp.sum(out["flow_preds"][-1])

    # warmup (compile + cache)
    float(fwd_chain(variables, img0, img1, jnp.float32(0.0)))

    best_ms = None
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(chain_len):
            carry = fwd_chain(variables, img0, img1, carry)
        float(carry)  # 4-byte fetch fences the whole chain
        ms = (time.perf_counter() - t0) / chain_len * 1000.0
        best_ms = ms if best_ms is None else min(best_ms, ms)

    print(json.dumps({
        "metric": f"gmflow_infer_latency_{h}x{w}_bs1",
        "value": round(best_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_A100_MS / best_ms, 3) if on_tpu
        else 0.0,
    }))


if __name__ == "__main__":
    main()
