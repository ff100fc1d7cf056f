"""End-to-end convergence smoke: synth -> shards -> loader -> train -> eval.

Exercises every layer of the framework with no external datasets
(SURVEY.md §7 first-milestone slice): synthesize a handful of samples from
procedural depth, write real npz shards, stream them through the
AugmentedShards reader + Loader, train RAFT-small a few hundred steps,
and check that EPE on held-out synthesized pairs drops materially.

    python -m opticalflowfromdepth_tpu.tools.convergence_smoke \
        --steps 300 --images 8

Exit code 0 iff final EPE < epe_ratio * initial EPE.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from typing import List, Tuple

import numpy as np


def procedural_sample(rng: np.random.Generator, h: int, w: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """A textured image + smooth depth (no external data needed).

    The image mixes random low-frequency sinusoid gratings with blob noise
    so the matcher has texture to correlate; depth is a smooth surface with
    a few depth discontinuities (fronto-parallel blobs), the structure the
    virtual-stereo synthesis turns into parallax.
    """
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((3, h, w), np.float32)
    for ch in range(3):
        acc = np.zeros((h, w), np.float32)
        for _ in range(6):
            fx, fy = rng.uniform(0.02, 0.3, 2)
            ph = rng.uniform(0, 2 * np.pi)
            acc += rng.uniform(10, 40) * np.sin(fx * xx + fy * yy + ph)
        img[ch] = 128 + acc
    img += rng.uniform(-10, 10, (3, h, w))

    depth = 150 + 60 * np.sin(xx / rng.uniform(40, 90)) \
        * np.cos(yy / rng.uniform(40, 90))
    for _ in range(3):  # foreground blobs = parallax discontinuities
        cy, cx = rng.uniform(0.2, 0.8, 2) * (h, w)
        r = rng.uniform(0.1, 0.25) * min(h, w)
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
        depth = np.where(blob, rng.uniform(40, 80), depth)
    return np.clip(img, 0, 255), depth[None].astype(np.float32)


def synthesize_shards(out_dir: str, n_images: int, h: int, w: int,
                      seed: int = 0) -> int:
    import jax
    import jax.numpy as jnp

    from ..synth.pipeline import synthesize_sample_packed
    from ..synth.writer import AsyncShardWriter

    rng = np.random.default_rng(seed)
    writer = AsyncShardWriter(out_dir, workers=4)
    for i in range(n_images):
        img, dep = procedural_sample(rng, h, w)
        out = synthesize_sample_packed(
            jax.random.fold_in(jax.random.PRNGKey(seed), i),
            jnp.asarray(img), jnp.asarray(dep))
        writer.submit(f"smoke{i}", jax.tree.map(np.asarray, out))
    return writer.drain()


def heldout_pairs(n: int, h: int, w: int, seed: int = 99
                  ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Unaugmented (img0, img1, flow01) pairs straight off the synthesis
    group — never seen by training (different seed)."""
    import jax
    import jax.numpy as jnp

    from ..synth.pipeline import synthesize_group

    rng = np.random.default_rng(seed)
    pairs = []
    grp = jax.jit(lambda k, i, d: synthesize_group(k, i, d, False))
    for i in range(n):
        img, dep = procedural_sample(rng, h, w)
        p0 = grp(jax.random.fold_in(jax.random.PRNGKey(seed), i),
                 jnp.asarray(img), jnp.asarray(dep))[0]
        pairs.append((np.moveaxis(np.asarray(p0.img_a), 0, -1),
                      np.moveaxis(np.asarray(p0.img_b), 0, -1),
                      np.moveaxis(np.asarray(p0.flow_ab), 0, -1)))
    return pairs


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=("raft", "gmflow"), default="raft")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--crop_h", type=int, default=96)
    ap.add_argument("--crop_w", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--epe_ratio", type=float, default=0.7,
                    help="final EPE must be < ratio * initial EPE")
    ap.add_argument("--shard_dir", default=None,
                    help="reuse/keep shards here (default: temp dir)")
    ap.add_argument("--with_classifier", action="store_true",
                    help="drive the paper's signature recipe end to end "
                         "(`adjusted_RAFT/train.py:155-168,196-203`, "
                         "README.md:109-115): train the aux classifier on "
                         "the synthesized flows, freeze it, then train the "
                         "flow model WITH the annealed classifier CE")
    ap.add_argument("--classifier_steps", type=int, default=200)
    ap.add_argument("--basic", action="store_true",
                    help="RAFT-basic instead of RAFT-small (the mixed "
                         "recipe's model, `README.md:109-115`)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_ofd_bench"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..data.datasets import AugmentedShards
    from ..data.loader import Loader

    tmp = None
    shard_dir = args.shard_dir
    if shard_dir is None:
        tmp = tempfile.TemporaryDirectory()
        shard_dir = tmp.name

    t0 = time.time()
    os.makedirs(shard_dir, exist_ok=True)
    if not os.listdir(shard_dir):
        n = synthesize_shards(shard_dir, args.images, args.height,
                              args.width)
        print(f"synthesized {args.images} images -> {n} shard files "
              f"in {time.time() - t0:.1f}s", flush=True)

    ds = AugmentedShards(shard_dir, crop_size=(args.crop_h, args.crop_w),
                         seed=0)
    loader = Loader(ds, batch_size=args.batch_size, num_workers=4,
                    process_index=0, process_count=1, seed=0)

    mixed = jax.default_backend() == "tpu"
    model_dtype = jnp.bfloat16 if mixed else jnp.float32

    # ---- phase 1 (--with_classifier): train + freeze the aux classifier
    # on the synthesized ground-truth flows, the capability the reference
    # only ships weights for (`README.md:113-114`, SURVEY M3) -------------
    classifier_params = None
    classifier_model = None
    cls_metrics = {}
    if args.with_classifier:
        from ..train import classifier_train as ct

        ccfg = ct.ClassifierTrainConfig(
            batch_size=args.batch_size * 2, num_steps=args.classifier_steps,
            image_size=(args.crop_h, args.crop_w), mixed_precision=mixed)
        cstate = ct.init_state(ccfg, jax.random.PRNGKey(11))
        cstep = jax.jit(ct.make_train_step(ccfg), donate_argnums=0)
        ceval = ct.make_eval_step(ccfg)
        cloader = Loader(AugmentedShards(shard_dir,
                                         crop_size=(args.crop_h, args.crop_w),
                                         seed=7),
                         batch_size=ccfg.batch_size, num_workers=4,
                         process_index=0, process_count=1, seed=7)
        cit = iter(cloader)
        eval_batches = [{k: jnp.asarray(b[k]) for k in ("flow", "label")}
                        for b in (next(cit) for _ in range(4))]

        def cls_acc(s):
            return float(np.mean([float(ceval(s.params, s.batch_stats,
                                              b)["accuracy"])
                                  for b in eval_batches]))

        acc0 = cls_acc(cstate)
        t1 = time.time()
        for i in range(args.classifier_steps):
            b = next(cit)
            cb = {k: jnp.asarray(b[k]) for k in ("flow", "label")}
            cstate, m = cstep(cstate, cb, jax.random.PRNGKey(1000 + i))
            if (i + 1) % 50 == 0:
                print(f"classifier step {i + 1}: "
                      f"loss {float(m['loss']):.3f} "
                      f"acc {float(m['accuracy']):.3f}", flush=True)
        acc1 = cls_acc(cstate)
        print(f"classifier held-batch accuracy {acc0:.3f} -> {acc1:.3f} "
              f"({time.time() - t1:.1f}s; chance = 0.25)", flush=True)
        cls_metrics = {"classifier_acc_initial": round(acc0, 3),
                       "classifier_acc_final": round(acc1, 3)}
        classifier_params = {"params": cstate.params,
                             "batch_stats": cstate.batch_stats}
        classifier_model = ct.build_model(ccfg)  # frozen from here on

    if args.model == "raft":
        from ..models.raft import RAFT
        from ..train.raft_train import (RAFTTrainConfig, init_state,
                                        make_train_step)
        small = not args.basic
        cfg = RAFTTrainConfig(small=small, iters=args.iters, lr=args.lr,
                              num_steps=args.steps,
                              batch_size=args.batch_size,
                              image_size=(args.crop_h, args.crop_w),
                              mixed_precision=mixed,
                              add_classifier=args.with_classifier)
        model = RAFT(small=small, dtype=model_dtype,
                     corr_impl=cfg.corr_impl)
        fwd = jax.jit(lambda v, a, b: model.apply(
            v, a, b, iters=args.iters, test_mode=True, train=False)[1])
    else:
        from ..models.gmflow import GMFlow
        from ..train.gmflow_train import (GMFlowTrainConfig, init_state,
                                          make_train_step)
        cfg = GMFlowTrainConfig(lr=args.lr, num_steps=args.steps,
                                batch_size=args.batch_size,
                                image_size=(args.crop_h, args.crop_w),
                                mixed_precision=mixed,
                                add_classifier=args.with_classifier)
        model = GMFlow(num_scales=1, dtype=model_dtype)
        fwd = jax.jit(lambda v, a, b: model.apply(
            v, a, b, attn_splits_list=(2,), corr_radius_list=(-1,),
            prop_radius_list=(-1,), training=False)["flow_preds"][-1])
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, classifier_params, classifier_model),
                   donate_argnums=0)

    held = heldout_pairs(4, args.height, args.width)

    def eval_epe(variables) -> float:
        epes = []
        for i0, i1, gt in held:
            up = fwd(variables, jnp.asarray(i0)[None], jnp.asarray(i1)[None])
            epe = np.linalg.norm(np.asarray(up)[0] - gt, axis=-1)
            epes.append(float(epe.mean()))
        return float(np.mean(epes))

    def variables_of(s):
        v = {"params": s.params}
        if s.batch_stats is not None:
            v["batch_stats"] = s.batch_stats
        return v

    epe0 = eval_epe(variables_of(state))
    print(f"initial held-out EPE: {epe0:.3f} px", flush=True)

    it = iter(loader)
    t0 = time.time()
    keys = ("image1", "image2", "flow", "valid", "label")
    first_cls = last_cls = None
    for i in range(args.steps):
        batch = next(it)
        batch = {k: jnp.asarray(batch[k]) for k in keys}
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if "classify_loss" in metrics:
            last_cls = float(metrics["classify_loss"])
            if first_cls is None:
                first_cls = last_cls
        if (i + 1) % 50 == 0:
            extra = (f" cls {last_cls:.3f}" if last_cls is not None else "")
            print(f"step {i + 1}: loss {float(metrics['total_loss']):.3f} "
                  f"epe {float(metrics['epe']):.3f}{extra}", flush=True)
    dt = time.time() - t0
    fps = args.steps * args.batch_size / dt

    epe1 = eval_epe(variables_of(state))
    result = {"initial_epe": round(epe0, 3), "final_epe": round(epe1, 3),
              "steps": args.steps, "train_frames_per_s": round(fps, 2),
              "ok": epe1 < args.epe_ratio * epe0}
    result.update(cls_metrics)
    if first_cls is not None:
        result["classify_loss_first"] = round(first_cls, 3)
        result["classify_loss_last"] = round(last_cls, 3)
        # the frozen classifier must have learned the flow classes; the CE
        # regularizer rides along for the whole flow training
        result["ok"] = bool(result["ok"]) and \
            cls_metrics.get("classifier_acc_final", 0.0) > 0.5
    print(json.dumps(result), flush=True)
    if tmp is not None:
        tmp.cleanup()
    if not result["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
