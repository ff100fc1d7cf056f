"""Flow/image/depth file IO (D8).

Covers every on-disk format the reference reads or writes:
  * Middlebury `.flo` read/write (`adjusted_gmflow/utils/frame_utils.py:12-65`)
  * `.pfm` read (`frame_utils.py:67-99`)
  * KITTI 16-bit png flow encode/decode `(uv*64 + 2^15, valid)`
    (`frame_utils.py:102-114`)
  * `read_gen` extension dispatch (`frame_utils.py:117-131`)
  * image / 8-bit relative depth / 16-bit disparity readers
    (`/root/reference/utils.py:17-72`)

Pure numpy + cv2/PIL; all functions return float32 numpy arrays in
channel-last layout (the host-side data plane is numpy; device code is jnp).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

TAG_CHAR = np.array([202021.25], np.float32)  # `frame_utils.py:16`


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> [H, W, 2] float32 (`frame_utils.py:20-42`)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != TAG_CHAR[0]:
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    """[H, W, 2] float32 -> Middlebury .flo (`frame_utils.py:45-65`)."""
    flow = np.asarray(flow, np.float32)
    assert flow.ndim == 3 and flow.shape[2] == 2, flow.shape
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        TAG_CHAR.tofile(f)
        np.asarray([w], np.int32).tofile(f)
        np.asarray([h], np.int32).tofile(f)
        flow.tofile(f)


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    """PFM -> ([H, W] or [H, W, 3] float32, scale); `frame_utils.py:67-99`."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise ValueError(f"malformed PFM header: {path}")
        w, h = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    # PFM stores rows bottom-to-top
    return np.flipud(data.reshape(shape)).astype(np.float32), scale


def read_flow_kitti(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit png -> (flow [H, W, 2], valid [H, W]).

    Decode `(png - 2^15) / 64` with channel-reversed cv2 read
    (`frame_utils.py:102-107`).
    """
    import cv2
    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    if raw is None:
        raise FileNotFoundError(path)
    raw = raw[:, :, ::-1].astype(np.float32)  # BGR -> RGB = (u, v, valid)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    flow = (flow - 2 ** 15) / 64.0
    return flow, valid


def write_flow_kitti(path: str, flow: np.ndarray,
                     valid: Optional[np.ndarray] = None) -> None:
    """(flow, valid) -> KITTI 16-bit png (`frame_utils.py:110-114`)."""
    import cv2
    h, w = flow.shape[:2]
    out = np.ones((h, w, 3), np.uint16)
    out[:, :, :2] = np.clip(
        flow.astype(np.float64) * 64.0 + 2 ** 15, 0, 65535).astype(np.uint16)
    if valid is not None:
        out[:, :, 2] = valid.astype(np.uint16)
    cv2.imwrite(path, out[:, :, ::-1])  # RGB -> BGR


def read_disp_kitti(path: str) -> np.ndarray:
    """KITTI 16-bit disparity png -> [H, W] float32 (png / 256)."""
    import cv2
    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if raw is None:
        raise FileNotFoundError(path)
    return raw.astype(np.float32) / 256.0


def read_image(path: str) -> np.ndarray:
    """RGB image -> [H, W, 3] float32 in [0, 255] (`utils.py:17-24`)."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32)


def read_relative_depth(path: str) -> np.ndarray:
    """8-bit relative depth map -> [H, W] float32 (`utils.py:27-43`:
    ReDWeb stores *closeness*; caller applies smooth_closer inversion)."""
    from PIL import Image
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.float32)


def read_disparity16(path: str) -> np.ndarray:
    """16-bit disparity png -> [H, W] float32 (`utils.py:46-60`, DIML)."""
    from PIL import Image
    with Image.open(path) as im:
        arr = np.asarray(im)
    return arr.astype(np.float32)


def read_gen(path: str) -> np.ndarray:
    """Extension dispatch (`frame_utils.py:117-131`)."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        return read_image(path)
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext == ".flo":
        return read_flo(path)
    if ext == ".pfm":
        flow = read_pfm(path)[0]
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    raise ValueError(f"unsupported extension: {path}")
