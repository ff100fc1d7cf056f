"""Shard writer: synthesized tensors -> self-contained npz files.

Output schema (one coherent schema fixing the reference's npz drift,
SURVEY.md §2.3 D2). Per (group g, augment a) one file
``{stem}_g{g}_a{a}.npz`` holding BOTH supervised sides:

    img0_1/img1_1   [H, W, 3] uint8   side 1 = augment img0
    depth0_1/depth1_1 [H, W]  f16
    flow_1/back_flow_1 [H, W, 2] f16
    img0_2/... (side 2 = augment img1), label (raw augment type int)

plus one ``{stem}_group.npz`` with the 44-channel group tensor
(`preprocess.py:437-447`). Images are uint8 and flows/depths float16 —
a 4x IO saving over the reference's float32 npz, well inside training
precision (flow eps ~0.03 px at |flow|=50).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _hwc8(img_chw: np.ndarray) -> np.ndarray:
    return np.clip(np.moveaxis(img_chw, 0, -1), 0, 255).astype(np.uint8)


def _hw16(x_chw: np.ndarray) -> np.ndarray:
    arr = np.moveaxis(x_chw, 0, -1).astype(np.float16)
    return arr[..., 0] if arr.shape[-1] == 1 else arr


def write_group(out_dir: str, stem: str, group_44: np.ndarray) -> str:
    path = os.path.join(out_dir, f"{stem}_group.npz")
    np.savez_compressed(path, group=group_44.astype(np.float16))
    return path


def write_augmented(out_dir: str, stem: str, g: int, a: int,
                    pair_12: np.ndarray, set1_8: np.ndarray,
                    set2_8: np.ndarray, aug_type: int) -> str:
    """pair_12: stacked Pair channels [12, H, W]
    (img_a 0:3, depth_a 3:4, img_b 4:7, depth_b 7:8, flow 8:10, back 10:12);
    set1_8/set2_8: the two AugmentedSets [8, H, W]
    (set1 = [aug_img0, aug_depth0, flow, back_flow],
     set2 = [flow, back_flow, aug_img1, aug_depth1])."""
    path = os.path.join(out_dir, f"{stem}_g{g}_a{a}.npz")
    np.savez_compressed(
        path,
        # side 1: image1 is the augmented img0, image2 the pair's img1
        img0_1=_hwc8(set1_8[0:3]),
        depth0_1=_hw16(set1_8[3:4]),
        img1_1=_hwc8(pair_12[4:7]),
        depth1_1=_hw16(pair_12[7:8]),
        flow_1=_hw16(set1_8[4:6]),
        back_flow_1=_hw16(set1_8[6:8]),
        # side 2: image1 is the pair's img0, image2 the augmented img1
        img0_2=_hwc8(pair_12[0:3]),
        depth0_2=_hw16(pair_12[3:4]),
        img1_2=_hwc8(set2_8[4:7]),
        depth1_2=_hw16(set2_8[7:8]),
        flow_2=_hw16(set2_8[0:2]),
        back_flow_2=_hw16(set2_8[2:4]),
        label=np.int32(aug_type),
    )
    return path


def write_sample(out_dir: str, stem: str, sample: Dict[str, np.ndarray]
                 ) -> int:
    """Write everything `synth.pipeline.synthesize_sample` produced.

    Returns the number of files written (1 group + 5*12 augmented)."""
    os.makedirs(out_dir, exist_ok=True)
    write_group(out_dir, stem, np.asarray(sample["group"]))
    pairs = np.asarray(sample["pairs"])          # [5, 12, H, W]
    set1 = np.asarray(sample["aug_set1"])        # [5, 12, 8, H, W]
    set2 = np.asarray(sample["aug_set2"])
    aug_types = np.asarray(sample["aug_types"])  # [12]
    n = 1
    for g in range(pairs.shape[0]):
        for a in range(set1.shape[1]):
            write_augmented(out_dir, stem, g, a, pairs[g], set1[g, a],
                            set2[g, a], int(aug_types[a]))
            n += 1
    return n


# ---------------------------------------------------------------------------
# packed path: pre-cast tensors, fast compression, async writing
# ---------------------------------------------------------------------------

def _savez_fast(path: str, level: int = 1, **arrays) -> None:
    """np.savez_compressed with a controllable deflate level.

    numpy hardwires zlib level 6; level 1 is ~4x faster at a few percent
    larger shards — the right trade when compression runs on the data-engine
    host (`preprocess.py:437-447` equivalent). zlib compression releases the
    GIL, so these calls parallelize across writer threads.
    """
    import zipfile
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED,
                         compresslevel=level) as zf:
        for name, arr in arrays.items():
            with zf.open(name + ".npy", "w", force_zip64=True) as f:
                np.lib.format.write_array(f, np.asanyarray(arr),
                                          allow_pickle=False)


FLOW_Q = 64.0   # fixed-point step 1/64 px — the KITTI 16-bit encoding
                # (`frame_utils.py:102-114`, data/frame_io.py)


def _q16(flow_hwc: np.ndarray) -> np.ndarray:
    """Quantize flow to int16 fixed-point (1/64 px, ±511.98 px range).

    f16 shards represent magnitudes up to 65504; flows beyond the int16
    range would silently saturate (ADVICE r4), so warn loudly — synthesized
    flows at training resolutions stay well under ±512 px, and a warning
    here means the sample is an outlier worth inspecting."""
    f32 = flow_hwc.astype(np.float32)
    peak = float(np.max(np.abs(f32), initial=0.0))
    if peak * FLOW_Q > 32767:
        import warnings
        warnings.warn(
            f"--flow_int16: |flow| up to {peak:.1f} px exceeds the ±512 px "
            "int16 range; values will be clipped (use f16 shards for "
            "extreme-motion synthesis)", RuntimeWarning, stacklevel=2)
    return np.clip(np.round(f32 * FLOW_Q), -32768, 32767).astype(np.int16)


def dequantize_flow(arr: np.ndarray) -> np.ndarray:
    """Inverse of the shard flow encoding: int16 -> px; float passthrough."""
    if arr.dtype == np.int16:
        return arr.astype(np.float32) / FLOW_Q
    return arr.astype(np.float32)


def sample_plan(out_dir: str, stem: str, sample: Dict[str, np.ndarray],
                flow_int16: bool = False):
    """The 61 npz files of one packed sample as (path, [(key, array)]).

    Shared by the Python and native writers. Repeated entries (each parent
    image/depth/flow appears in ~12 of the files, matching the reference's
    per-(group,augment) schema `preprocess.py:453-476`) are THE SAME array
    objects across files — the native encoder dedups blobs by object
    identity, so repeated tensors are compressed once.

    ``flow_int16`` stores flow/back_flow as int16 fixed-point (1/64 px —
    the repo's KITTI encoding) instead of float16; readers
    (`data.datasets.AugmentedShards`) decode by dtype.
    """
    from ..synth.pipeline import GEO_POSITIONS, PHO_POSITIONS

    group = np.asarray(sample["group_f16"])
    yield os.path.join(out_dir, f"{stem}_group.npz"), [("group", group)]

    pimg = np.asarray(sample["pairs_img_u8"])    # [5, 2, 3, H, W]
    pflt = np.asarray(sample["pairs_flt_f16"])   # [5, 6, H, W]
    gimg = np.asarray(sample["geo_img_u8"])      # [5, G, 2, 3, H, W]
    gflt = np.asarray(sample["geo_flt_f16"])     # [5, G, 2, 5, H, W]
    phimg = np.asarray(sample["pho_img_u8"])     # [5, P, 2, 3, H, W]
    aug_types = np.asarray(sample["aug_types"])

    def hwc(img_chw):  # u8 [3, H, W] -> [H, W, 3]
        return np.moveaxis(img_chw, 0, -1)

    def hw(x_chw):     # f16 [C, H, W] -> [H, W, C] or [H, W]
        arr = np.moveaxis(x_chw, 0, -1)
        return arr[..., 0] if arr.shape[-1] == 1 else arr

    enc = _q16 if flow_int16 else (lambda a: a)

    for g in range(pimg.shape[0]):
        img0, img1 = hwc(pimg[g, 0]), hwc(pimg[g, 1])
        depth0, depth1 = hw(pflt[g, 0:1]), hw(pflt[g, 1:2])
        flow, back = enc(hw(pflt[g, 2:4])), enc(hw(pflt[g, 4:6]))
        for slot, a in enumerate(GEO_POSITIONS):
            f1 = gflt[g, slot, 0]  # [5, H, W]: depth, flow(2), back(2)
            f2 = gflt[g, slot, 1]
            yield os.path.join(out_dir, f"{stem}_g{g}_a{a}.npz"), [
                ("img0_1", hwc(gimg[g, slot, 0])),
                ("depth0_1", hw(f1[0:1])), ("img1_1", img1),
                ("depth1_1", depth1), ("flow_1", enc(hw(f1[1:3]))),
                ("back_flow_1", enc(hw(f1[3:5]))),
                ("img0_2", img0), ("depth0_2", depth0),
                ("img1_2", hwc(gimg[g, slot, 1])),
                ("depth1_2", hw(f2[0:1])), ("flow_2", enc(hw(f2[1:3]))),
                ("back_flow_2", enc(hw(f2[3:5]))),
                ("label", np.int32(aug_types[a]))]
        for slot, a in enumerate(PHO_POSITIONS):
            yield os.path.join(out_dir, f"{stem}_g{g}_a{a}.npz"), [
                ("img0_1", hwc(phimg[g, slot, 0])),
                ("depth0_1", depth0), ("img1_1", img1),
                ("depth1_1", depth1), ("flow_1", flow),
                ("back_flow_1", back),
                ("img0_2", img0), ("depth0_2", depth0),
                ("img1_2", hwc(phimg[g, slot, 1])),
                ("depth1_2", depth1), ("flow_2", flow),
                ("back_flow_2", back),
                ("label", np.int32(aug_types[a]))]


def write_sample_packed(out_dir: str, stem: str,
                        sample: Dict[str, np.ndarray], level: int = 1,
                        flow_int16: bool = False) -> int:
    """Write the output of `synth.pipeline.synthesize_sample_packed`
    (Python zipfile path — see :func:`sample_plan` for the schema).

    Produces byte-identical schema to :func:`write_sample` (same keys,
    dtypes, file names): geometric augmentations carry their own 8 channels;
    photometric ones re-use the parent pair's depth/flow tensors (their
    depth/flow are unchanged by construction, `preprocess.py:150-182`).
    """
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for path, entries in sample_plan(out_dir, stem, sample, flow_int16):
        _savez_fast(path, level, **dict(entries))
        n += 1
    return n


class AsyncShardWriter:
    """Shard writer overlapping npz encoding with the next image's device
    synthesis + host transfer (the reference serializes 61
    np.savez_compressed calls on the main thread per image,
    `preprocess.py:437-476`).

    Two backends:
      * native (default when `native/shardio.cc` builds): the C++
        blob-deduplicated encoder — every file job runs on native threads
        with the GIL released for the whole encode; repeated parent
        tensors are compressed once; uint8 images deflate, f16/int16
        tensors are stored raw (they barely deflate; set
        ``store_floats=False`` to deflate everything at ~3-4x the host
        cost). Measured on this 2-core host: 8.6 s/image (round-4 Python
        writer) -> ~0.5 s/image.
      * Python fallback: thread-pool of per-FILE zipfile jobs (zlib
        releases the GIL); one job per file, not per image, so the 61
        files of one image parallelize too.
    """

    def __init__(self, out_dir: str, workers: int = 4, level: int = 1,
                 flow_int16: bool = False, store_floats: bool = True,
                 use_native: bool = True):
        from concurrent.futures import ThreadPoolExecutor
        self.out_dir = out_dir
        self.level = level
        self.flow_int16 = flow_int16
        self.enc = None
        if use_native:
            try:
                from ..data.native_io import ShardEncoder
                self.enc = ShardEncoder(threads=workers, level=level,
                                        store_floats=store_floats)
            except Exception:
                self.enc = None
        self.pool = None
        self.futures = []
        if self.enc is None:
            self.pool = ThreadPoolExecutor(max_workers=workers)
        self._count = 0
        self._pending = 0

    def submit(self, stem: str, sample: Dict[str, np.ndarray]) -> None:
        # callers pass host arrays (jax.tree.map(np.asarray, ...)); device
        # arrays also work because sample_plan np.asarray()s the leaves.
        os.makedirs(self.out_dir, exist_ok=True)
        if self.enc is not None:
            # the native encoder borrows array memory until drained; flush
            # every other image so a long synthesis run stays bounded at
            # ~2 images of pinned host memory while still overlapping the
            # previous image's encode with this one's fetch
            self._pending += 1
            if self._pending > 2:
                self.enc.drain()
                self._pending = 1
        for path, entries in sample_plan(self.out_dir, stem, sample,
                                         self.flow_int16):
            self._count += 1
            if self.enc is not None:
                self.enc.file(path, entries)
            else:
                self.futures.append(self.pool.submit(
                    _savez_fast, path, self.level, **dict(entries)))

    def drain(self) -> int:
        self._pending = 0
        if self.enc is not None:
            self.enc.drain()
            self.enc.close()
        else:
            for f in self.futures:
                f.result()
            self.futures.clear()
            self.pool.shutdown()
        total = self._count
        self._count = 0
        return total
