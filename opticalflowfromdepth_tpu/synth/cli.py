"""Synthesis CLI — the TPU-native `preprocess.py` (S7 entry point).

    python -m opticalflowfromdepth_tpu.synth.cli --dataset DIML \
        --data_root datasets/DIML --out synth_out/diml \
        --split 4 --split_id 0 --epochs 2

Mirrors `preprocess.py:508-561`: per-image deterministic seeding
(`jax.random.fold_in(base, epoch * len + idx)` replacing the reference's
`set_seed(12345 + idx + epoch * len)`), `--split/--split_id` index-range
sharding for farm-out, 2 synthesis epochs. The whole per-image program is
ONE jit-compiled XLA computation per (H, W) bucket — no CPU round-trips
(the reference calls cv2.inpaint ~130x/image on the host).

Images are bucket-resized to a fixed shape (default 384x512) so a single
compilation serves the whole run (TPU static-shape discipline).
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=("ReDWeb", "DIML"), required=True)
    p.add_argument("--data_root", default=None,
                   help="dataset dir (default: datasets/<name>)")
    p.add_argument("--list_file", default=None,
                   help="image list (default: <dataset>_list.txt)")
    p.add_argument("--out", required=True, help="output shard dir")
    p.add_argument("--split", type=int, default=1,
                   help="number of index shards (`preprocess.py:543-547`)")
    p.add_argument("--split_id", type=int, default=0)
    p.add_argument("--epochs", type=int, default=2,
                   help="synthesis epochs over the list (`preprocess.py:552`)")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--limit", type=int, default=None,
                   help="stop after N images (smoke runs)")
    p.add_argument("--write_workers", type=int, default=4,
                   help="npz writer threads (compression releases the GIL)")
    p.add_argument("--deflate_floats", action="store_true",
                   help="deflate f16 tensors too (native writer stores "
                        "them raw by default: ~40%% larger shards but "
                        "several-fold faster host encode — f16 bit "
                        "patterns barely compress)")
    p.add_argument("--flow_int16", action="store_true",
                   help="store flows as int16 fixed-point (1/64 px, KITTI "
                        "encoding): smaller shards, faster deflate; readers "
                        "decode by dtype. Representable range is ±511.98 px "
                        "— larger flows clip (with a warning); keep f16 "
                        "shards for extreme-motion synthesis")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # persistent compile cache: farm-out shards (--split) run in separate
    # processes; without this every process pays the full XLA compile.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_ofd_synth"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..data.source import SOURCES, _resize_chw
    from .pipeline import synthesize_sample_packed
    from .writer import AsyncShardWriter

    ds_cls = SOURCES[args.dataset]
    kwargs = {}
    if args.data_root:
        kwargs["dataset_dir"] = args.data_root
    if args.list_file:
        kwargs["list_file"] = args.list_file
    ds = ds_cls(**kwargs)

    n = len(ds)
    lo = n * args.split_id // args.split
    hi = n * (args.split_id + 1) // args.split
    print(f"{args.dataset}: {n} images, shard [{lo}, {hi}) "
          f"({args.split_id + 1}/{args.split})")

    h, w = args.height, args.width
    # synthesize_sample_packed is internally staged+jitted (compile once per
    # shape) and returns storage-dtype device arrays (u8 images, f16
    # floats), ~3x fewer device->host bytes than f32
    synth = functools.partial(synthesize_sample_packed,
                              is_stereo=(args.dataset == "DIML"))
    base_key = jax.random.PRNGKey(args.seed)

    writer = AsyncShardWriter(args.out, workers=args.write_workers,
                              flow_int16=args.flow_int16,
                              store_floats=not args.deflate_floats)
    done = 0
    pending = None  # (stem, device tree): transfer AFTER the next dispatch
    t_start = time.time()
    for epoch in range(args.epochs):
        for idx in range(lo, hi):
            if args.limit is not None and done >= args.limit:
                break
            s = ds[idx]
            img = _resize_chw(s.img0, (h, w))
            dep = _resize_chw(s.depth_or_disp, (h, w))
            key = jax.random.fold_in(base_key, epoch * n + idx)
            t0 = time.time()
            out = synth(key, jnp.asarray(img), jnp.asarray(dep))
            # two-deep pipeline: with image i's programs enqueued (async),
            # fetch image i-1 while the device computes i; npz compression
            # runs on the writer pool.
            if pending is not None:
                stem_p, out_p = pending
                writer.submit(stem_p, jax.tree.map(np.asarray, out_p))
            pending = (f"{s.name}_e{epoch}", out)
            done += 1
            print(f"[{done}] {s.name} epoch {epoch}: dispatched "
                  f"in {time.time() - t0:.2f}s")
        if args.limit is not None and done >= args.limit:
            break
    if pending is not None:
        writer.submit(pending[0], jax.tree.map(np.asarray, pending[1]))
    nfiles = writer.drain()
    dt = time.time() - t_start
    print(f"done: {done} images ({nfiles} files) in {dt:.1f}s "
          f"({done / max(dt, 1e-9):.2f} img/s)")


if __name__ == "__main__":
    main()
