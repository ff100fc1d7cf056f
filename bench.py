"""Headline benchmarks — one JSON line per metric, printed as measured.

Metrics (priority order):

  1. gmflow_infer_latency_448x1024_bs1 [ms] — mirrors the reference's
     `count_time` harness (`adjusted_gmflow/evaluate.py:300-352,414-416`).
     Baseline 26 ms on A100 (`adjusted_gmflow/README.md:52`);
     vs_baseline = 26 / ours. Weights are closed over as jit constants —
     the deployed-inference configuration; measured: passing the params
     pytree as a jit argument multiplies the XLA compile time ~10x for
     this graph (258-1200 s vs 71 s cold) with identical steady-state
     latency.
  2. gmflow_train_fps_368x560_bs4 [frames/s/chip] — the mixed-recipe
     training step (`README.md:119-130`, batch 16 over 4x V100 = 4/chip).
     No wall-clock is recorded in the reference tree, so vs_baseline uses
     an estimated 13 frames/s per V100 (57 ms bs1 fwd at 448x1024 scaled to
     368x560 and a ~3x fwd+bwd+opt factor) — estimate, not a measurement.
  3. raft_train_fps_368x496_bs4 [frames/s/chip] — RAFT mixed recipe step
     (`README.md:109-115`, batch 8, 1 GPU, AMP). No reference wall-clock
     exists; vs_baseline uses an estimated 8 frames/s on V100: RAFT-12
     forward ~= 2x GMFlow's measured 57 ms at 436x1024 (12 sequential
     corr-lookup+GRU iterations), scaled by area to 368x496 (x0.41) and
     x3 for fwd+bwd+opt => ~8 f/s — estimate, not a measurement.
  4. synth_device_throughput_384x512 [img/s] — chip-side rate of the full
     per-image synthesis program (fenced). vs_baseline divides by the
     MEASURED reference rate below.
  5. synth_throughput_384x512 [img/s] — steady-state end-to-end rate over
     4 images with device synthesis, device->host fetch, and the 61 npz
     writes per image pipelined (fetch thread + AsyncShardWriter), the
     production configuration of synth/cli.py. On this axon-tunneled chip
     the device->host link (~280 MB/image packed) is the bottleneck; a
     PCIe/DMA-attached deployment moves it to npz compression (see
     synth_device_throughput for the chip-side rate).

Synthesis baseline — MEASURED, not estimated (round 4; see
`opticalflowfromdepth_tpu/tools/measure_reference_synth.py`): the
reference's own `PreprocessPlusAugment.forward` run on this host at
384x512 takes 107.9 s/image end to end (torch-CPU), of which 61.5 s is
its 61 serial float32 np.savez_compressed calls (365 MB/image) and 4.1 s
its CPU cv2.inpaint round-trips — both CPU-side in the reference's own
GPU deployment too. Even crediting a GPU with ALL tensor math for free,
the reference cannot exceed 1/(61.5+4.1) = 0.0152 img/s per process;
that GPU-optimistic bound is the vs_baseline denominator (the honest
torch-CPU rate is 0.0093 img/s).

Timing methodology (device metrics): the reference times `model(...)`
between `torch.cuda.synchronize()` calls. On a tunneled TPU each dispatch
is an RPC, so per-call wall timing is meaningless; instead we exploit
in-order device execution — enqueue N programs back-to-back, fetch one
scalar from the LAST output (a real fence), and difference two chain
lengths: (t[N1] - t[N0]) / (N1 - N0) cancels every N-independent overhead.
A bare enqueue-loop timing verifies dispatch stays <10% of the slope.

Cold-cache survival (round-4 redesign): every metric's models/states are
built and its programs compiled by a PREPARE step; all five prepares run
CONCURRENTLY in daemon threads from t=0. Compilation for this tunneled
chip happens on the remote server (local load average ~0 while waiting),
so the compiles overlap to ~max instead of summing — measured cold:
infer 71 s (const-closure), train steps ~30 s each, synthesis programs
~100 s fired in parallel. Measures then run serially in priority order,
each line printed the moment it is measured, so a deadline kill never
loses an earlier metric. Headline metrics are waited for past the soft
budget (small grace window inside the external deadline); the
tunnel-bound e2e metric only runs with its full 240 s floor remaining.

Train metrics carry an ``mfu`` field: model-FLOPs-utilization computed
from the compiled step's XLA cost analysis (flops / step-time / 197 TFLOP/s
v5e bf16 peak) — a measured utilization, independent of the estimated
V100 vs_baseline denominators. CAVEAT: XLA counts zero FLOPs for Pallas
custom-calls, so the RAFT value UNDERCOUNTS once the fused correlation
kernel is in the step (its ~530 GFLOP/step of in-kernel matmuls are
invisible); the analytic RAFT utilization is ~11% (see PROGRESS.md).
GMFlow's step has no Pallas and its mfu is accurate.

Budget: BENCH_BUDGET_S (default 500 s — sized so that with a ~600 s
external deadline, even the tunnel-bound e2e metric can finish). Exit
code is 0 as long as at least one metric line printed (one metric's
failure never blocks another's; zero lines -> nonzero exit).
"""

from __future__ import annotations

import json
import os
import queue
import sys
import tempfile
import threading
import time
import traceback

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
BASELINE_TRAIN_V100_FPS_EST = 13.0    # estimate, see module docstring
BASELINE_RAFT_V100_FPS_EST = 8.0      # estimate, see module docstring
# measured on this host via tools/measure_reference_synth.py (see above)
BASELINE_SYNTH_REF_GPU_OPTIMISTIC = 0.0152   # img/s, measured bound
BASELINE_SYNTH_REF_CPU = 0.0093              # img/s, measured


PEAK_BF16_FLOPS_V5E = 197e12   # TPU v5e per-chip bf16 peak (197 TFLOP/s)


def emit(metric: str, value: float, unit: str, vs_baseline: float,
         **extra) -> None:
    line = {"metric": metric, "value": round(value, 3), "unit": unit,
            "vs_baseline": round(vs_baseline, 3)}
    line.update({k: round(v, 4) for k, v in extra.items()})
    print(json.dumps(line), flush=True)


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T_START:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def budget_left() -> float:
    return BUDGET_S - (time.time() - T_START)


def chain_slope_ms(fn, n0: int, n1: int, reps: int) -> float:
    """Difference-of-chains device latency: fn() enqueues one program and
    returns a scalar future; float() on it fences the in-order queue.
    Assumes fn's program is already compiled (prepare ran a warmup)."""
    def run_chain(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        float(r)
        return time.perf_counter() - t0

    run_chain(n0)
    slopes = []
    t_long = None
    for _ in range(reps):
        t_short = run_chain(n0)
        t_long = run_chain(n1)
        ms = (t_long - t_short) / (n1 - n0) * 1000.0
        if ms > 0:
            slopes.append(ms)
    if slopes:
        # median, not min: tunnel noise inflating a SHORT chain shrinks
        # that rep's slope, so min-of-reps systematically reports the
        # luckiest (fastest) estimate — observed as a 93 vs 109 f/s
        # train-step spread across runs
        best = float(np.median(slopes))
    else:              # clock noise (CPU smoke shapes): honest upper bound
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

def prepare_infer(on_tpu: bool):
    from opticalflowfromdepth_tpu.models.gmflow import GMFlow

    if on_tpu:
        h, w = 448, 1024
    else:
        h, w = 64, 128

    model = GMFlow(num_scales=1,
                   dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)
    jax.block_until_ready(variables)

    # Weights as jit CONSTANTS (deployed-inference config; ~10x faster
    # compile than params-as-arguments for this graph, same latency).
    @jax.jit
    def fwd(img0, img1):
        out = model.apply(variables, img0, img1,
                          attn_splits_list=(2,), corr_radius_list=(-1,),
                          prop_radius_list=(-1,), training=False)
        return jnp.sum(out["flow_preds"][-1])

    float(fwd(img0, img1))  # compile + warm
    return {"fwd": fwd, "img0": img0, "img1": img1, "h": h, "w": w}


def measure_infer(ctx, on_tpu: bool) -> None:
    n0, n1, reps = (2, 12, 2) if on_tpu else (1, 3, 1)
    fwd, img0, img1 = ctx["fwd"], ctx["img0"], ctx["img1"]
    ms = chain_slope_ms(lambda: fwd(img0, img1), n0, n1, reps)
    emit(f"gmflow_infer_latency_{ctx['h']}x{ctx['w']}_bs1", ms, "ms",
         BASELINE_INFER_A100_MS / ms if on_tpu else 0.0)


# ---------------------------------------------------------------------------
# metrics 2/3: train-step throughput
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


def _prepare_train(make_state, make_step, batch):
    state = make_state()
    step = jax.jit(make_step(), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    holder = {"state": state}

    def one():
        new_state, metrics = step(holder["state"], batch, key)
        holder["state"] = new_state
        return metrics["total_loss"]

    float(one())  # compile + warm

    # step FLOPs from XLA's own cost model of the compiled executable
    # (VERDICT r4 #4: report measured MFU, not estimates). The jit call
    # above populated the persistent compilation cache, so this AOT
    # lower().compile() costs no extra server compile. NOTE: lower() on
    # the CURRENT holder state — donation invalidated the original.
    flops = 0.0
    try:
        ca = step.lower(holder["state"], batch, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        log(f"cost_analysis unavailable ({e!r}); mfu will be 0")
    return one, flops


def _measure_train(one, b: int, on_tpu: bool):
    n0, n1, reps = (2, 8, 3) if on_tpu else (1, 2, 1)
    ms = chain_slope_ms(one, n0, n1, reps)
    return b / (ms / 1000.0), ms


def _mfu(flops: float, ms: float, on_tpu: bool) -> float:
    """Model FLOPs utilization: XLA-counted step FLOPs / step time /
    v5e bf16 peak. 0.0 when FLOPs are unavailable or off-chip."""
    if not on_tpu or flops <= 0 or ms <= 0:
        return 0.0
    return flops / (ms / 1000.0) / PEAK_BF16_FLOPS_V5E


def prepare_gmflow_train(on_tpu: bool):
    from opticalflowfromdepth_tpu.train import gmflow_train as gt

    b, (h, w) = (4, (368, 560)) if on_tpu else (1, (64, 96))
    cfg = gt.GMFlowTrainConfig(batch_size=b, image_size=(h, w),
                               mixed_precision=on_tpu)
    rng = np.random.default_rng(1)
    one, flops = _prepare_train(
        lambda: gt.init_state(cfg, jax.random.PRNGKey(1)),
        lambda: gt.make_train_step(cfg),
        _fake_batch(rng, b, h, w))
    return {"one": one, "b": b, "h": h, "w": w, "flops": flops}


def measure_gmflow_train(ctx, on_tpu: bool) -> None:
    fps, ms = _measure_train(ctx["one"], ctx["b"], on_tpu)
    emit(f"gmflow_train_fps_{ctx['h']}x{ctx['w']}_bs{ctx['b']}", fps,
         "frames/s/chip",
         fps / BASELINE_TRAIN_V100_FPS_EST if on_tpu else 0.0,
         mfu=_mfu(ctx["flops"], ms, on_tpu))


def prepare_raft_train(on_tpu: bool):
    from opticalflowfromdepth_tpu.train import raft_train as rt

    b, (h, w) = (4, (368, 496)) if on_tpu else (1, (64, 96))
    cfg = rt.RAFTTrainConfig(batch_size=b, image_size=(h, w),
                             mixed_precision=on_tpu, iters=12)
    rng = np.random.default_rng(2)
    one, flops = _prepare_train(
        lambda: rt.init_state(cfg, jax.random.PRNGKey(2)),
        lambda: rt.make_train_step(cfg),
        _fake_batch(rng, b, h, w))
    return {"one": one, "b": b, "h": h, "w": w, "flops": flops}


def measure_raft_train(ctx, on_tpu: bool) -> None:
    fps, ms = _measure_train(ctx["one"], ctx["b"], on_tpu)
    emit(f"raft_train_fps_{ctx['h']}x{ctx['w']}_bs{ctx['b']}", fps,
         "frames/s/chip",
         fps / BASELINE_RAFT_V100_FPS_EST if on_tpu else 0.0,
         mfu=_mfu(ctx["flops"], ms, on_tpu))


# ---------------------------------------------------------------------------
# metrics 4/5: synthesis throughput (device + end-to-end)
# ---------------------------------------------------------------------------

def _synth_sample(rng, h: int, w: int, i: int):
    img = rng.uniform(0, 255, (3, h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = (120 + 80 * np.sin(xx / 37 + i) * np.cos(yy / 53) +
             rng.uniform(0, 30, (h, w))).astype(np.float32)[None]
    return jnp.asarray(img), jnp.asarray(depth)


def prepare_synth(on_tpu: bool):
    """Compile the staged synthesis programs; their warmups are fired on
    sub-threads so the 8 independent programs compile concurrently."""
    from opticalflowfromdepth_tpu.synth import pipeline as sp

    h, w = (384, 512) if on_tpu else (96, 128)
    rng = np.random.default_rng(3)
    img, dep = _synth_sample(rng, h, w, 0)

    # one dummy Pair batch per augment type, shapes as used by the staged
    # programs inside synthesize_sample_packed (g-major repeat of 5 pairs)
    def warm_augment(t, n_rep):
        zi = jnp.zeros((n_rep, 3, h, w), jnp.float32)
        zd = jnp.ones((n_rep, 1, h, w), jnp.float32)
        zf = jnp.zeros((n_rep, 2, h, w), jnp.float32)
        pair = sp.Pair(zi, zd, zi, zd, zf, zf)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(n_rep)])
        jax.block_until_ready(sp._jit_augment(t)(keys, pair))

    threads = []
    counts = {t: sum(1 for x in sp.AUGMENT_SCHEDULE if x == t) * 5
              for t in set(sp.AUGMENT_SCHEDULE)}
    for t, n_rep in counts.items():
        th = threading.Thread(target=warm_augment, args=(t, n_rep),
                              daemon=True)
        th.start()
        threads.append(th)
    # group program on this thread (the packed/group-f16 programs need its
    # outputs' shapes anyway, and a full pass warms them too)
    out = sp.synthesize_sample_packed(jax.random.PRNGKey(0), img, dep)
    jax.block_until_ready(out)
    for th in threads:
        th.join()
    return {"h": h, "w": w, "rng": rng,
            "synthesize": sp.synthesize_sample_packed}


def measure_synth_device(ctx, on_tpu: bool) -> None:
    """Rate at which the chip produces the packed per-image tensors
    (chain-fenced device time, the TPU-native synthesis number)."""
    h, w, rng = ctx["h"], ctx["w"], ctx["rng"]
    synthesize = ctx["synthesize"]
    n_dev = 8 if on_tpu else 1
    inputs = [_synth_sample(rng, h, w, 100 + i) for i in range(n_dev)]
    t0 = time.time()
    last = None
    for i, (im, dp) in enumerate(inputs):
        last = synthesize(jax.random.fold_in(jax.random.PRNGKey(1), i),
                          im, dp)
    float(jnp.sum(last["pairs_flt_f16"][0, 2]))  # fence
    dev_rate = n_dev / (time.time() - t0)
    emit(f"synth_device_throughput_{h}x{w}", dev_rate, "img/s",
         dev_rate / BASELINE_SYNTH_REF_GPU_OPTIMISTIC if on_tpu else 0.0)


def measure_synth_e2e(ctx, on_tpu: bool) -> None:
    """Steady-state end-to-end synthesis over n images: device synthesis,
    device->host fetch (background thread), and the 61 npz writes per
    image (AsyncShardWriter pool) all overlapped — the synth/cli.py
    production pipeline. On this axon-tunneled chip the fetch dominates
    (see module docstring)."""
    from opticalflowfromdepth_tpu.synth.writer import AsyncShardWriter

    h, w, rng = ctx["h"], ctx["w"], ctx["rng"]
    synthesize = ctx["synthesize"]
    n = 4 if on_tpu else 1

    fetch_q: "queue.Queue" = queue.Queue(maxsize=2)
    fetch_err = []

    def fetcher(writer):
        while True:
            item = fetch_q.get()
            if item is None:
                return
            if fetch_err:        # keep draining so the producer never
                continue         # deadlocks on the bounded queue
            stem, out = item
            try:
                writer.submit(stem, jax.tree.map(np.asarray, out))
            except Exception as e:
                fetch_err.append(e)

    with tempfile.TemporaryDirectory() as tmp:
        writer = AsyncShardWriter(tmp, workers=3)
        fth = threading.Thread(target=fetcher, args=(writer,), daemon=True)
        fth.start()
        t0 = time.time()
        for i in range(n):
            img, dep = _synth_sample(rng, h, w, 200 + i)
            out = synthesize(jax.random.fold_in(jax.random.PRNGKey(2), i),
                             img, dep)
            fetch_q.put((f"s{i}", out))
        fetch_q.put(None)
        fth.join()
        if fetch_err:
            raise fetch_err[0]
        writer.drain()
        dt = time.time() - t0
    imgs = n / dt
    emit(f"synth_throughput_{h}x{w}", imgs, "img/s",
         imgs / BASELINE_SYNTH_REF_GPU_OPTIMISTIC if on_tpu else 0.0)


# ---------------------------------------------------------------------------
# driver: concurrent prepares, priority-ordered measures
# ---------------------------------------------------------------------------

METRICS = [
    # (name, prepare, measure, min_budget_for_measure_s)
    ("infer", prepare_infer, measure_infer, 0.0),       # headline: always
    ("gmflow_train", prepare_gmflow_train, measure_gmflow_train, 30.0),
    ("raft_train", prepare_raft_train, measure_raft_train, 30.0),
    ("synth_device", prepare_synth, measure_synth_device, 60.0),
    # e2e keeps a hard 240 s floor regardless of cache warmth: its fetch
    # rides the axon tunnel, which can stall for minutes under contention
    # (round-3 lesson; ADVICE r3).
    ("synth_e2e", None, measure_synth_e2e, 240.0),      # shares synth prep
]


class Prep:
    def __init__(self, name, fn, on_tpu):
        self.name = name
        self.done = threading.Event()
        self.ctx = None
        self.error = None

        def run():
            try:
                t0 = time.time()
                self.ctx = fn(on_tpu)
                log(f"prepare {name} done ({time.time() - t0:.0f}s)")
            except Exception:
                self.error = traceback.format_exc(limit=4)
                log(f"prepare {name} FAILED:\n{self.error}")
            finally:
                self.done.set()

        self.thread = threading.Thread(target=run, daemon=True, name=name)
        self.thread.start()

    def wait(self, timeout):
        self.done.wait(timeout=max(0.0, timeout))
        return self.ctx if self.done.is_set() and self.error is None else None


def main() -> None:
    on_tpu = jax.devices()[0].platform == "tpu"

    preps = {}
    for name, prep_fn, _, _ in METRICS:
        if prep_fn is not None:
            preps[name] = Prep(name, prep_fn, on_tpu)
    preps["synth_e2e"] = preps["synth_device"]

    state = {"printed": 0}
    done = set()   # measured, failed, or given-up metrics

    def try_measure(name, measure_fn) -> None:
        # one metric's failure must never kill another's chance (the
        # headline may still be compiling); total failure is raised at
        # the end of main instead
        try:
            t0 = time.time()
            measure_fn(preps[name].ctx, on_tpu)
            state["printed"] += 1
            log(f"{name} measured ({time.time() - t0:.0f}s)")
        except Exception as e:
            log(f"ERROR in {name}: {e!r}")
        done.add(name)

    others = [m for m in METRICS if m[0] != "synth_e2e"]
    name_e2e, _, fn_e2e, e2e_floor = next(
        m for m in METRICS if m[0] == "synth_e2e")

    # Phase 0 — let the concurrent compiles finish before timing anything:
    # a late prepare's warmup EXECUTION shares the in-order device queue
    # and contaminates another metric's measurement (observed: synth
    # device rate halved when measured beside a compiling train prepare).
    # Escape at the budget edge so a hung compile can't block the rest.
    while budget_left() > 120.0:
        if all(preps[m[0]].done.is_set() for m in others):
            break
        time.sleep(2.0)

    # Phase 1 — the headline metrics, in priority order, as their prepares
    # land.  These are quick to MEASURE (~10-30 s each) once compiled, so
    # we keep waiting for slow prepares even past the soft budget (up to a
    # small grace window inside the external deadline): on a
    # slow-server-compile day the right artifact is 4 headline lines, not
    # one tunnel-bound e2e line (round-4 lesson — an earlier phase order
    # reserved the e2e floor first and starved everything else).
    while budget_left() > -60.0:
        remaining = [m for m in others if m[0] not in done]
        if not remaining:
            break
        progress = False
        for name, _, measure_fn, min_left in remaining:
            p = preps[name]
            if p.error is not None:
                done.add(name)   # logged by the prepare thread
            elif p.done.is_set():
                if state["printed"] and budget_left() < min_left:
                    log(f"SKIP {name}: {budget_left():.0f}s budget left "
                        f"(needs {min_left:.0f})")
                    done.add(name)
                else:
                    try_measure(name, measure_fn)
                progress = True
        if not progress:
            time.sleep(2.0)
    for name, _, _, _ in others:
        if name not in done and preps[name].error is None:
            log(f"LOST {name}: prepare never finished")

    # Phase 2 — the tunnel-bound e2e metric (shares the synth prepare),
    # only with its full floor left: its device->host fetch can stall for
    # minutes and must never eat the headline's deadline (ADVICE r3).
    p = preps[name_e2e]
    # last-resort clause: with zero lines printed an e2e line beats an
    # empty artifact, budget or not
    if (budget_left() >= e2e_floor or state["printed"] == 0) and \
            p.wait(timeout=max(budget_left() - e2e_floor + 30.0,
                               30.0 if state["printed"] == 0 else 0.0)
                   ) is not None:
        try_measure(name_e2e, fn_e2e)
    elif p.error is None:
        log(f"SKIP {name_e2e}: {budget_left():.0f}s budget left "
            f"(needs {e2e_floor:.0f}) or prepare pending")

    if state["printed"] == 0:
        raise RuntimeError(
            "no metric produced a line; prepare errors above" if any(
                q.error for q in preps.values()) else
            "no metric produced a line")


if __name__ == "__main__":
    main()
