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


def write_sample_packed(out_dir: str, stem: str,
                        sample: Dict[str, np.ndarray], level: int = 1,
                        flow_int16: bool = False) -> int:
    """Write the output of `synth.pipeline.synthesize_sample_packed`.

    Produces byte-identical schema to :func:`write_sample` (same keys,
    dtypes, file names): geometric augmentations carry their own 8 channels;
    photometric ones re-use the parent pair's depth/flow tensors (their
    depth/flow are unchanged by construction, `preprocess.py:150-182`).

    ``flow_int16`` stores flow/back_flow as int16 fixed-point (1/64 px —
    the repo's KITTI encoding) instead of float16: quantized integers
    deflate far better than f16 bit patterns, shrinking shards and
    speeding both compression and training-time reads. Readers
    (`data.datasets.AugmentedShards`) decode by dtype, so both schemas
    coexist in one dataset dir.
    """
    from ..synth.pipeline import GEO_POSITIONS, PHO_POSITIONS

    os.makedirs(out_dir, exist_ok=True)
    group = np.asarray(sample["group_f16"])
    _savez_fast(os.path.join(out_dir, f"{stem}_group.npz"), level,
                group=group)

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

    n = 1
    for g in range(pimg.shape[0]):
        img0, img1 = hwc(pimg[g, 0]), hwc(pimg[g, 1])
        depth0, depth1 = hw(pflt[g, 0:1]), hw(pflt[g, 1:2])
        flow, back = enc(hw(pflt[g, 2:4])), enc(hw(pflt[g, 4:6]))
        for slot, a in enumerate(GEO_POSITIONS):
            s1i, s2i = hwc(gimg[g, slot, 0]), hwc(gimg[g, slot, 1])
            f1 = gflt[g, slot, 0]  # [5, H, W]: depth, flow(2), back(2)
            f2 = gflt[g, slot, 1]
            _savez_fast(
                os.path.join(out_dir, f"{stem}_g{g}_a{a}.npz"), level,
                img0_1=s1i, depth0_1=hw(f1[0:1]), img1_1=img1,
                depth1_1=depth1, flow_1=enc(hw(f1[1:3])),
                back_flow_1=enc(hw(f1[3:5])),
                img0_2=img0, depth0_2=depth0, img1_2=s2i,
                depth1_2=hw(f2[0:1]), flow_2=enc(hw(f2[1:3])),
                back_flow_2=enc(hw(f2[3:5])), label=np.int32(aug_types[a]))
            n += 1
        for slot, a in enumerate(PHO_POSITIONS):
            _savez_fast(
                os.path.join(out_dir, f"{stem}_g{g}_a{a}.npz"), level,
                img0_1=hwc(phimg[g, slot, 0]), depth0_1=depth0, img1_1=img1,
                depth1_1=depth1, flow_1=flow, back_flow_1=back,
                img0_2=img0, depth0_2=depth0, img1_2=hwc(phimg[g, slot, 1]),
                depth1_2=depth1, flow_2=flow, back_flow_2=back,
                label=np.int32(aug_types[a]))
            n += 1
    return n


class AsyncShardWriter:
    """Thread-pool shard writer overlapping npz compression with the next
    image's device synthesis + host transfer (the reference serializes
    61 np.savez_compressed calls on the main thread per image,
    `preprocess.py:437-476`)."""

    def __init__(self, out_dir: str, workers: int = 4, level: int = 1,
                 flow_int16: bool = False):
        from concurrent.futures import ThreadPoolExecutor
        self.out_dir = out_dir
        self.level = level
        self.flow_int16 = flow_int16
        self.pool = ThreadPoolExecutor(max_workers=workers)
        self.futures = []

    def submit(self, stem: str, sample: Dict[str, np.ndarray]) -> None:
        # materialize on the caller thread? No: np.asarray inside the worker
        # would serialize device transfers against compute; callers pass
        # host arrays (jax.tree.map(np.asarray, ...)) or device arrays —
        # both are accepted because write_sample_packed np.asarray()s leaves.
        self.futures.append(
            self.pool.submit(write_sample_packed, self.out_dir, stem,
                             sample, self.level, self.flow_int16))

    def drain(self) -> int:
        total = 0
        for f in self.futures:
            total += f.result()
        self.futures.clear()
        self.pool.shutdown()
        return total
