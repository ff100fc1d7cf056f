"""StepTimer + profiler trace smoke (SURVEY.md §5.1)."""

import glob
import os

import jax.numpy as jnp

from opticalflowfromdepth_tpu.utils.profiling import StepTimer, annotate, trace


def test_step_timer_stats():
    t = StepTimer(frames_per_step=8, warmup=1)
    t.start()
    for i in range(6):
        t.tick(jnp.ones(()) * i)
    s = t.summary()
    assert s["steps_timed"] == 5
    assert s["frames_per_s"] == 8 * s["steps_per_s"]
    assert s["p50_ms"] <= s["p90_ms"]


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("matmul"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            x.block_until_ready()
    assert glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
