"""Headline benchmarks — one JSON line per metric, printed as measured.

Metrics (priority order; later ones are skipped if the time budget runs
out, so the headline always lands even on a cold compile cache):

  1. gmflow_infer_latency_448x1024_bs1 [ms] — mirrors the reference's
     `count_time` harness (`adjusted_gmflow/evaluate.py:300-352,414-416`).
     Baseline 26 ms on A100 (`adjusted_gmflow/README.md:52`);
     vs_baseline = 26 / ours.
  2. gmflow_train_fps_368x560_bs4 [frames/s/chip] — the mixed-recipe
     training step (`README.md:119-130`, batch 16 over 4x V100 = 4/chip).
     No wall-clock is recorded in the reference tree, so vs_baseline uses
     an estimated 13 frames/s per V100 (57 ms bs1 fwd at 448x1024 scaled to
     368x560 and a ~3x fwd+bwd+opt factor) — estimate, not a measurement.
  3. raft_train_fps_368x496_bs4 [frames/s/chip] — RAFT mixed recipe step
     (`README.md:109-115`). No reference wall-clock exists;
     vs_baseline = 0.0 (unrecorded).
  4. synth_device_throughput_384x512 [img/s] — chip-side rate of the full
     per-image synthesis program (fenced).
  5. synth_throughput_384x512 [img/s] — end-to-end incl. host transfer +
     all 61 npz writes (`preprocess.py:329-480`). The reference records no
     frames/s; vs_baseline uses an estimated 0.2 img/s for fw_cuda+cv2+f32
     npz (61 compressed float32 npz ~380 MB/image dominates) — estimate.
     Runs last: the device->host fetch rides the axon tunnel (20-25 MB/s,
     minutes-long stalls under contention).

Timing methodology (device metrics): the reference times `model(...)`
between `torch.cuda.synchronize()` calls. On a tunneled TPU each dispatch
is an RPC, so per-call wall timing is meaningless; instead we exploit
in-order device execution — enqueue N programs back-to-back, fetch one
scalar from the LAST output (a real fence), and difference two chain
lengths: (t[N1] - t[N0]) / (N1 - N0) cancels every N-independent overhead.
A bare enqueue-loop timing verifies dispatch stays <10% of the slope.

Budget: BENCH_BUDGET_S (default 500 s — sized so that with a ~600 s
external deadline, even a metric started at the budget's edge finishes
after its cold compile). Each metric is wrapped so a failure or timeout
of a later metric never loses an earlier line; exit code is 0 as long as
the headline printed.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_ofd_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "500"))
T_START = time.time()

BASELINE_INFER_A100_MS = 26.0
BASELINE_TRAIN_V100_FPS_EST = 13.0   # estimate, see module docstring
BASELINE_SYNTH_IMGS_EST = 0.2        # estimate, see module docstring


def emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit,
                      "vs_baseline": round(vs_baseline, 3)}), flush=True)


def budget_left() -> float:
    return BUDGET_S - (time.time() - T_START)


def chain_slope_ms(fn, n0: int, n1: int, reps: int) -> float:
    """Difference-of-chains device latency: fn() enqueues one program and
    returns a scalar future; float() on it fences the in-order queue."""
    def run_chain(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        float(r)
        return time.perf_counter() - t0

    run_chain(1)       # compile + warm
    run_chain(n0)
    best = None
    t_long = None
    for _ in range(reps):
        t_short = run_chain(n0)
        t_long = run_chain(n1)
        ms = (t_long - t_short) / (n1 - n0) * 1000.0
        if ms > 0:
            best = ms if best is None else min(best, ms)
    if best is None:   # clock noise (CPU smoke shapes): honest upper bound
        best = t_long / n1 * 1000.0

    # dispatch sanity check (`bench.py` round-2 review): bare enqueue loop
    t0 = time.perf_counter()
    for _ in range(n1):
        fn()
    dispatch_ms = (time.perf_counter() - t0) / n1 * 1000.0
    jax.block_until_ready(fn())
    if dispatch_ms > 0.1 * best:
        print(f"WARNING: per-call dispatch {dispatch_ms:.3f} ms > 10% of "
              f"measured {best:.3f} ms; value is dispatch-contaminated",
              file=sys.stderr)
    return best


# ---------------------------------------------------------------------------
# metric 1: GMFlow inference latency
# ---------------------------------------------------------------------------

def bench_infer(on_tpu: bool) -> None:
    from opticalflowfromdepth_tpu.models.gmflow import GMFlow

    if on_tpu:
        h, w, n0, n1, reps = 448, 1024, 2, 12, 2
    else:
        h, w, n0, n1, reps = 64, 128, 1, 3, 1

    model = GMFlow(num_scales=1,
                   dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)

    @jax.jit
    def fwd(variables, img0, img1):
        out = model.apply(variables, img0, img1,
                          attn_splits_list=(2,), corr_radius_list=(-1,),
                          prop_radius_list=(-1,), training=False)
        return jnp.sum(out["flow_preds"][-1])

    ms = chain_slope_ms(lambda: fwd(variables, img0, img1), n0, n1, reps)
    emit(f"gmflow_infer_latency_{h}x{w}_bs1", ms, "ms",
         BASELINE_INFER_A100_MS / ms if on_tpu else 0.0)


# ---------------------------------------------------------------------------
# metrics 2/4: train-step throughput
# ---------------------------------------------------------------------------

def _fake_batch(rng, b: int, h: int, w: int):
    return {
        "image1": jnp.asarray(
            rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "image2": jnp.asarray(
            rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "flow": jnp.asarray(rng.normal(0, 10, (b, h, w, 2)).astype(np.float32)),
        "valid": jnp.ones((b, h, w), jnp.float32),
        "label": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (b, 1)),
    }


def _train_fps(make_state, make_step, batch, b: int, on_tpu: bool) -> float:
    state = make_state()
    step = jax.jit(make_step(), donate_argnums=0)
    key = jax.random.PRNGKey(0)

    holder = {"state": state}

    def one():
        new_state, metrics = step(holder["state"], batch, key)
        holder["state"] = new_state
        return metrics["total_loss"]

    n0, n1, reps = (2, 8, 2) if on_tpu else (1, 2, 1)
    ms = chain_slope_ms(one, n0, n1, reps)
    return b / (ms / 1000.0)


def bench_gmflow_train(on_tpu: bool) -> None:
    from opticalflowfromdepth_tpu.train import gmflow_train as gt

    b, (h, w) = (4, (368, 560)) if on_tpu else (1, (64, 96))
    cfg = gt.GMFlowTrainConfig(batch_size=b, image_size=(h, w),
                               mixed_precision=on_tpu)
    rng = np.random.default_rng(1)
    fps = _train_fps(
        lambda: gt.init_state(cfg, jax.random.PRNGKey(1)),
        lambda: gt.make_train_step(cfg),
        _fake_batch(rng, b, h, w), b, on_tpu)
    emit(f"gmflow_train_fps_{h}x{w}_bs{b}", fps, "frames/s/chip",
         fps / BASELINE_TRAIN_V100_FPS_EST if on_tpu else 0.0)


def bench_raft_train(on_tpu: bool) -> None:
    from opticalflowfromdepth_tpu.train import raft_train as rt

    b, (h, w) = (4, (368, 496)) if on_tpu else (1, (64, 96))
    cfg = rt.RAFTTrainConfig(batch_size=b, image_size=(h, w),
                             mixed_precision=on_tpu, iters=12)
    rng = np.random.default_rng(2)
    fps = _train_fps(
        lambda: rt.init_state(cfg, jax.random.PRNGKey(2)),
        lambda: rt.make_train_step(cfg),
        _fake_batch(rng, b, h, w), b, on_tpu)
    emit(f"raft_train_fps_{h}x{w}_bs{b}", fps, "frames/s/chip", 0.0)


# ---------------------------------------------------------------------------
# metric 3: synthesis throughput (device synth + host npz writes)
# ---------------------------------------------------------------------------

def _synth_sample(rng, h: int, w: int, i: int):
    img = rng.uniform(0, 255, (3, h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = (120 + 80 * np.sin(xx / 37 + i) * np.cos(yy / 53) +
             rng.uniform(0, 30, (h, w))).astype(np.float32)[None]
    return jnp.asarray(img), jnp.asarray(depth)


def bench_synth_device(on_tpu: bool) -> None:
    """Rate at which the chip produces the packed per-image tensors
    (chain-fenced device time, the TPU-native synthesis number)."""
    from opticalflowfromdepth_tpu.synth.pipeline import synthesize_sample_packed

    h, w = (384, 512) if on_tpu else (96, 128)
    rng = np.random.default_rng(3)

    img, dep = _synth_sample(rng, h, w, 0)   # compile all staged programs
    out = synthesize_sample_packed(jax.random.PRNGKey(0), img, dep)
    jax.block_until_ready(out)

    n_dev = 8 if on_tpu else 1
    inputs = [_synth_sample(rng, h, w, 100 + i) for i in range(n_dev)]
    t0 = time.time()
    last = None
    for i, (im, dp) in enumerate(inputs):
        last = synthesize_sample_packed(
            jax.random.fold_in(jax.random.PRNGKey(1), i), im, dp)
    float(jnp.sum(last["pairs_flt_f16"][0, 2]))  # fence
    dev_rate = n_dev / (time.time() - t0)
    emit(f"synth_device_throughput_{h}x{w}", dev_rate, "img/s",
         dev_rate / BASELINE_SYNTH_IMGS_EST if on_tpu else 0.0)


def bench_synth_e2e(on_tpu: bool) -> None:
    """End-to-end synthesis incl. host transfer + 61 npz writes, pipelined
    exactly like synth/cli.py. NOTE: on this axon-tunneled chip the
    device->host link runs ~20-25 MB/s with multi-minute stalls under
    contention (~280 MB/image packed payload), so this number is
    tunnel-bound — which is why it runs LAST and on a single image; a
    PCIe/DMA-attached deployment moves the bottleneck to npz compression
    (see synth_device_throughput for the chip-side rate)."""
    from opticalflowfromdepth_tpu.synth.pipeline import synthesize_sample_packed
    from opticalflowfromdepth_tpu.synth.writer import AsyncShardWriter

    h, w = (384, 512) if on_tpu else (96, 128)
    rng = np.random.default_rng(3)

    img, dep = _synth_sample(rng, h, w, 0)   # warm (cached from device pass)
    out = synthesize_sample_packed(jax.random.PRNGKey(0), img, dep)
    jax.block_until_ready(out)

    with tempfile.TemporaryDirectory() as tmp:
        n = 1
        writer = AsyncShardWriter(tmp, workers=4)
        t0 = time.time()
        for i in range(n):
            img, dep = _synth_sample(rng, h, w, i + 1)
            out = synthesize_sample_packed(jax.random.fold_in(
                jax.random.PRNGKey(0), i), img, dep)
            writer.submit(f"s{i}", jax.tree.map(np.asarray, out))
        writer.drain()
        dt = time.time() - t0
    imgs = n / dt
    emit(f"synth_throughput_{h}x{w}", imgs, "img/s",
         imgs / BASELINE_SYNTH_IMGS_EST if on_tpu else 0.0)


def main() -> None:
    on_tpu = jax.devices()[0].platform == "tpu"
    # min_left is sized to each metric's COLD-cache cost (compile + run),
    # so that any metric we start finishes inside a ~600 s driver deadline
    # even from an empty compile cache; warm-cache runs (~4 min total)
    # never hit the thresholds. The synth metrics are the most
    # compile-heavy (one staged program per augment type) and the e2e one
    # additionally rides the axon device->host tunnel, which can stall for
    # minutes under contention — so they go last and need the most slack
    # (round-3 lesson: a 3-image e2e fetch blew a 600 s deadline).
    durations = {}

    def e2e_min_left() -> float:
        # if synth_device just ran warm, its programs are compiled and
        # cached — e2e's marginal cost is one fetch + 61 npz writes.
        return 90.0 if durations.get("synth_device", 1e9) < 60.0 else 240.0

    plan = [
        ("infer", bench_infer, lambda: 0.0),  # headline: always run
        ("gmflow_train", bench_gmflow_train, lambda: 60.0),
        ("raft_train", bench_raft_train, lambda: 60.0),
        ("synth_device", bench_synth_device, lambda: 240.0),
        ("synth_e2e", bench_synth_e2e, e2e_min_left),
    ]
    printed = 0
    for name, fn, min_left in plan:
        if printed and budget_left() < min_left():
            print(f"SKIP {name}: {budget_left():.0f}s budget left "
                  f"(needs {min_left():.0f})", file=sys.stderr)
            continue
        try:
            t0 = time.time()
            fn(on_tpu)
            printed += 1
            durations[name] = time.time() - t0
            print(f"[bench +{time.time() - T_START:.0f}s] {name} done "
                  f"({durations[name]:.0f}s)", file=sys.stderr)
        except Exception as e:  # later metrics must not kill earlier lines
            if printed == 0:
                raise
            print(f"ERROR in {name}: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
