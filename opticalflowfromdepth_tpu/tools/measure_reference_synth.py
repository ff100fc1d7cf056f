"""Measure the REFERENCE synthesis pipeline's actual per-image rate.

Replaces the 0.2 img/s guess in ``bench.py`` with a measurement (VERDICT r3
item 7): runs the reference's own ``PreprocessPlusAugment.forward``
(`/root/reference/preprocess.py:329-506`) on this host via torch-CPU and
times it end to end, with component timers on its three irreducible
host-side stages:

  * ``fw_cuda.forward_warping`` — stubbed with a numpy lexsort routine that
    is element-exact to the CUDA kernel's raster-serial z-buffer
    (`alt_cuda/fw_cuda_kernel.cu:28-47`: strict ``<`` depth test means the
    winner per target is min(depth, then raster index); collision = hit
    whose winning depth never beat the 1000.0 LUT init). ~130 calls/image.
  * ``utils.inpaint`` — cv2 Telea inpaint; runs on CPU in the reference
    too (`utils.py:136-151` round-trips GPU->CPU every call).
  * ``np.savez_compressed`` — 61 float32 deflate-6 npz files per image
    (`preprocess.py:447,470-475`); CPU + disk in the reference too.

Two numbers are reported:

  * ``reference_cpu_img_s`` — the whole pipeline on this host (torch-CPU
    for the geometry/warp math the reference runs on GPU).
  * ``reference_gpu_optimistic_img_s`` — 1 / (inpaint + savez time): the
    upper bound on the reference's rate if every GPU-capable op were FREE,
    keeping only the stages the reference itself runs on the CPU. This is
    the conservative baseline bench.py uses for vs_baseline.

No reference code is copied; the reference tree is imported at runtime
(read-only) with two module stubs injected: ``fw_cuda`` (numpy equivalent
above) and ``dataloader`` (the snapshot's `from dataloader import COCO`
is a latent ImportError — COCO is not defined there, SURVEY.md §2.3 D1 —
and we feed tensors directly anyway). One more snapshot defect surfaces
here: `preprocess.py:463` has an unclosed paren (``torch.cat([...], axis=0``
with no ``)``) — the snapshot is not even valid Python, so the file is
loaded with a one-character in-memory repair (append the ``)``).

Usage: python -m opticalflowfromdepth_tpu.tools.measure_reference_synth \
           [--height 384] [--width 512] [--images 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


def _install_fw_cuda_stub(timers: dict) -> None:
    import torch

    mod = types.ModuleType("fw_cuda")

    def forward_warping(obj, safe_y, safe_x, depth):
        t0 = time.perf_counter()
        o = obj[0].cpu().numpy()
        ys = safe_y[0, 0].cpu().numpy().astype(np.int64).ravel()
        xs = safe_x[0, 0].cpu().numpy().astype(np.int64).ravel()
        d = depth[0, 0].cpu().numpy().astype(np.float32).ravel()
        c, h, w = o.shape
        n = h * w
        tgt = ys * w + xs
        # lexsort keys are last-key-major: sorted by (tgt, depth, raster)
        order = np.lexsort((np.arange(n), d, tgt))
        s_tgt = tgt[order]
        head = np.ones(n, bool)
        head[1:] = s_tgt[1:] != s_tgt[:-1]
        win_src = order[head]
        win_tgt = s_tgt[head]
        write_ok = d[win_src] < 1000.0
        out = np.zeros((c, n), np.float32)
        out[:, win_tgt[write_ok]] = o.reshape(c, n)[:, win_src[write_ok]]
        valid = np.zeros(n, np.float32)
        valid[win_tgt] = 1.0
        collision = np.zeros(n, np.float32)
        collision[win_tgt[~write_ok]] = 1.0
        res = (torch.from_numpy(out.reshape(1, c, h, w)),
               torch.from_numpy(valid.reshape(1, 1, h, w)),
               torch.from_numpy(collision.reshape(1, 1, h, w)))
        timers["fw"] += time.perf_counter() - t0
        timers["fw_calls"] += 1
        return res

    mod.forward_warping = forward_warping
    sys.modules["fw_cuda"] = mod


def _install_dataloader_stub() -> None:
    mod = types.ModuleType("dataloader")
    for name in ("DIML", "ReDWeb", "COCO"):
        setattr(mod, name, type(name, (), {}))
    mod.num_classes = 4
    sys.modules["dataloader"] = mod
    # torchvision is imported by preprocess.py:10 but never used there and
    # is not in this image; stub the import.
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Resize = type("Resize", (), {})
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)


def measure(height: int, width: int, images: int) -> dict:
    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.path.insert(0, REFERENCE_DIR)
    timers = {"fw": 0.0, "fw_calls": 0, "inpaint": 0.0, "savez": 0.0}
    _install_fw_cuda_stub(timers)
    _install_dataloader_stub()

    import torch
    cwd = os.getcwd()
    os.chdir(REFERENCE_DIR)  # preprocess.py resolves nothing at import,
    try:                     # but keep its expectations anyway
        path = os.path.join(REFERENCE_DIR, "preprocess.py")
        with open(path) as f:
            src = f.read()
        # repair the snapshot's syntax error at preprocess.py:463
        src = src.replace("for i in range(2, 6)], axis=0\n",
                          "for i in range(2, 6)], axis=0)\n", 1)
        preprocess = types.ModuleType("preprocess")
        preprocess.__file__ = path
        sys.modules["preprocess"] = preprocess
        exec(compile(src, path, "exec"), preprocess.__dict__)
        import utils as ref_utils
    finally:
        os.chdir(cwd)

    real_inpaint = ref_utils.inpaint

    def timed_inpaint(img, valid, collision):
        t0 = time.perf_counter()
        r = real_inpaint(img, valid, collision)
        timers["inpaint"] += time.perf_counter() - t0
        return r

    ref_utils.inpaint = timed_inpaint
    preprocess.utils.inpaint = timed_inpaint
    # inpaint ends with .to(img.get_device()) (`utils.py:150`) which is -1
    # for CPU tensors and rejected by torch; get_device is only called
    # there, so redirect it to "cpu" while measuring. The process-wide
    # patches (this and np.savez_compressed) are restored in the finally
    # below (ADVICE r4): measure() is safe to import and call from other
    # code, though a dedicated subprocess is still the recommended driver
    # (it also execs the untrusted reference preprocess.py in-process).
    real_get_device = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: "cpu"

    real_savez = np.savez_compressed
    bytes_written = {"n": 0}

    def timed_savez(path, **kw):
        t0 = time.perf_counter()
        real_savez(path, **kw)
        timers["savez"] += time.perf_counter() - t0
        bytes_written["n"] += os.path.getsize(
            path if str(path).endswith(".npz") else str(path) + ".npz")

    np.savez_compressed = timed_savez
    preprocess.np.savez_compressed = timed_savez

    rng = np.random.default_rng(0)
    ppa = preprocess.PreprocessPlusAugment(device="cpu")

    def sample(i):
        img = torch.from_numpy(
            rng.uniform(0, 255, (3, height, width)).astype(np.float32))
        yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
        depth = (120 + 80 * np.sin(xx / 37 + i) * np.cos(yy / 53) +
                 rng.uniform(0, 30, (height, width))).astype(np.float32)
        return img, torch.from_numpy(depth[None])

    results = {}
    try:
        with tempfile.TemporaryDirectory() as tmp:
            ppa(sample(0), os.path.join(tmp, "warm"), False)  # warmup image
            for k in ("fw", "inpaint", "savez"):
                timers[k] = 0.0
            timers["fw_calls"] = 0
            bytes_written["n"] = 0

            t0 = time.perf_counter()
            for i in range(images):
                ppa(sample(i + 1), os.path.join(tmp, f"m{i}"), False)
            total = time.perf_counter() - t0
    finally:
        np.savez_compressed = real_savez
        torch.Tensor.get_device = real_get_device

    cpu_rate = images / total
    irreducible = timers["inpaint"] + timers["savez"]
    optimistic_rate = images / irreducible if irreducible > 0 else 0.0
    results = {
        "height": height, "width": width, "images": images,
        "total_s_per_img": total / images,
        "fw_s_per_img": timers["fw"] / images,
        "fw_calls_per_img": timers["fw_calls"] / images,
        "inpaint_s_per_img": timers["inpaint"] / images,
        "savez_s_per_img": timers["savez"] / images,
        "npz_mb_per_img": bytes_written["n"] / images / 1e6,
        "reference_cpu_img_s": cpu_rate,
        "reference_gpu_optimistic_img_s": optimistic_rate,
    }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--images", type=int, default=2)
    args = ap.parse_args()
    res = measure(args.height, args.width, args.images)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
