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
