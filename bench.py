"""Headline benchmark: GMFlow inference latency at Sintel resolution.

Mirrors the reference's `count_time` harness (`adjusted_gmflow/evaluate.py:
300-352,414-416`): 5 warmup + N timed runs of the forward pass at Sintel
436x1024 (padded to 448x1024, the reference's padding_factor=16 eval shape),
batch 1. Reference baselines (`adjusted_gmflow/README.md:52`): 57 ms on
V100, 26 ms on A100. vs_baseline reports the A100 speedup factor
(26 / ours; > 1 means faster than the reference on its best hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_A100_MS = 26.0


def main() -> None:
    from opticalflowfromdepth_tpu.models.gmflow import GMFlow

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        h, w, runs = 448, 1024, 50
    else:  # CPU smoke mode: tiny shape, still one honest JSON line
        h, w, runs = 64, 128, 3

    model = GMFlow(num_scales=1,
                   dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    img0 = jnp.zeros((1, h, w, 3), jnp.float32)
    img1 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)

    @jax.jit
    def fwd(variables, img0, img1):
        out = model.apply(variables, img0, img1,
                          attn_splits_list=(2,), corr_radius_list=(-1,),
                          prop_radius_list=(-1,), training=False)
        return out["flow_preds"][-1]

    for _ in range(5):  # warmup (compile + cache)
        jax.block_until_ready(fwd(variables, img0, img1))

    t0 = time.perf_counter()
    for _ in range(runs):
        out = fwd(variables, img0, img1)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / runs * 1000.0

    print(json.dumps({
        "metric": f"gmflow_infer_latency_{h}x{w}_bs1",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_A100_MS / ms, 3) if on_tpu else 0.0,
    }))


if __name__ == "__main__":
    main()
