"""Source depth datasets for synthesis (D1): ReDWeb + DIML.

Reference: `/root/reference/dataloader.py:13-58` and the readers in
`/root/reference/utils.py:17-72`. All arrays are channel-first float32
(the synthesis engine's layout). Images are RGB (the reference keeps
cv2's BGR; channel order is immaterial to the synthesis math and is
documented here as a deliberate normalization).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


def _resize_chw(arr: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    import cv2
    c, h, w = arr.shape
    th, tw = size
    if (h, w) == (th, tw):
        return arr
    out = cv2.resize(np.moveaxis(arr, 0, -1), (tw, th),
                     interpolation=cv2.INTER_LINEAR)
    if out.ndim == 2:
        out = out[..., None]
    return np.moveaxis(out, -1, 0)


def read_img_chw(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, -1)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.moveaxis(img.astype(np.float32), -1, 0)  # [3, H, W]


def read_relative_depth_chw(path: str, smooth: bool = True) -> np.ndarray:
    """8-bit closeness map -> depth via smooth_closer (`utils.py:48-57,
    118-121`: clamp 240, depth = 1/(255 - closeness))."""
    import cv2
    d = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if d is None:
        raise FileNotFoundError(path)
    d = d.astype(np.float32)
    if smooth:
        d = np.minimum(d, 240.0)
        d = 1.0 / (255.0 - d)
    return d[None]  # [1, H, W]


def read_disparity_chw(path: str) -> np.ndarray:
    """16-bit disparity png scaled by 63/255 (`utils.py:61-73`)."""
    import cv2
    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    d = d.astype(np.float32)
    d[~np.isfinite(d)] = 0.0
    return (d * 63.0 / 255.0)[None]


@dataclass
class Sample:
    name: str
    img0: np.ndarray              # [3, H, W]
    depth_or_disp: np.ndarray     # [1, H, W]
    img1: Optional[np.ndarray] = None  # stereo right (DIML)
    is_stereo: bool = False


class ReDWeb:
    """Monocular relative depth (`dataloader.py:13-32`)."""

    def __init__(self, dataset_dir: str = "datasets/ReDWeb_V1",
                 list_file: str = "ReDWeb_list.txt"):
        self.dataset_dir = dataset_dir
        with open(list_file) as f:
            self.names = [ln.strip().split(".")[0] for ln in f if ln.strip()]

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int) -> Sample:
        name = self.names[idx]
        img = read_img_chw(os.path.join(self.dataset_dir, "Imgs",
                                        f"{name}.jpg"))
        depth = read_relative_depth_chw(
            os.path.join(self.dataset_dir, "RDs", f"{name}.png"))
        if depth.shape[1:] != img.shape[1:]:
            depth = _resize_chw(depth, img.shape[1:])
        return Sample(name, img, depth, is_stereo=False)


class DIML:
    """Stereo left/right + disparity (`dataloader.py:35-58`)."""

    def __init__(self, dataset_dir: str = "datasets/DIML",
                 list_file: str = "DIML_list.txt"):
        self.dataset_dir = dataset_dir
        with open(list_file) as f:
            self.names = [ln.strip().split(".")[0] for ln in f if ln.strip()]

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int) -> Sample:
        name = self.names[idx]
        base = os.path.join(self.dataset_dir, "train", "LR")
        img0 = read_img_chw(os.path.join(base, "outleft", f"{name}.png"))
        img1 = read_img_chw(os.path.join(base, "outright", f"{name}.png"))
        disp = read_disparity_chw(
            os.path.join(base, "disparity", f"{name}.png"))
        if disp.shape[1:] != img0.shape[1:]:
            disp = _resize_chw(disp, img0.shape[1:])
        return Sample(name, img0, disp, img1=img1, is_stereo=True)


SOURCES = {"ReDWeb": ReDWeb, "DIML": DIML}
