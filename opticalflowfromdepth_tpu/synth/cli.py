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
    from .pipeline import synthesize_sample
    from .writer import write_sample

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
    # synthesize_sample is internally staged+jitted (compile once per shape)
    synth = functools.partial(synthesize_sample,
                              is_stereo=(args.dataset == "DIML"))
    base_key = jax.random.PRNGKey(args.seed)

    os.makedirs(args.out, exist_ok=True)
    done = 0
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
            out = jax.tree.map(np.asarray, out)  # device -> host once
            nfiles = write_sample(args.out, f"{s.name}_e{epoch}", out)
            done += 1
            print(f"[{done}] {s.name} epoch {epoch}: {nfiles} files "
                  f"in {time.time() - t0:.2f}s")
        if args.limit is not None and done >= args.limit:
            break
    dt = time.time() - t_start
    print(f"done: {done} images in {dt:.1f}s "
          f"({done / max(dt, 1e-9):.2f} img/s)")


if __name__ == "__main__":
    main()
