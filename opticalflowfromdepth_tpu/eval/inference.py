"""Directory inference: glob frames -> flow (+ optional bidir/occlusion).

Reference `adjusted_gmflow/evaluate.py:835-954` (inference_on_dir): pad,
forward (optionally bidirectional via batch-dim feature swap inside GMFlow),
fwd-bwd occlusion check, save `.flo` / colorized png / occlusion masks.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Optional

import numpy as np

from ..data import frame_io
from ..utils.flow_viz import flow_to_color
from .occlusion import forward_backward_consistency_check
from .padder import InputPadder


def inference_on_dir(infer_fn: Callable, inference_dir: str,
                     output_path: str = "output",
                     padding_factor: int = 8,
                     paired_data: bool = False,
                     save_flo_flow: bool = False,
                     pred_bidir_flow: bool = False,
                     fwd_bwd_consistency_check: bool = False) -> None:
    """infer_fn(image1, image2) -> flow [B, H, W, 2]; with
    ``pred_bidir_flow`` B doubles (fwd, bwd) like `gmflow.py:115-117`."""
    if fwd_bwd_consistency_check:
        assert pred_bidir_flow
    os.makedirs(output_path, exist_ok=True)

    filenames = sorted(glob.glob(os.path.join(inference_dir, "*.png")) +
                       glob.glob(os.path.join(inference_dir, "*.jpg")))
    stride = 2 if paired_data else 1
    if paired_data:
        assert len(filenames) % 2 == 0

    for test_id in range(0, len(filenames) - 1, stride):
        image1 = frame_io.read_image(filenames[test_id])
        image2 = frame_io.read_image(filenames[test_id + 1])
        padder = InputPadder(image1.shape, padding_factor=padding_factor)
        im1, im2 = padder.pad(image1[None], image2[None])
        flow = np.asarray(infer_fn(im1, im2))
        flow = padder.unpad(flow)

        base = os.path.join(
            output_path,
            os.path.splitext(os.path.basename(filenames[test_id]))[0])
        _save_png(base + "_flow.png", flow_to_color(flow[0]))
        if save_flo_flow:
            frame_io.write_flo(base + "_pred.flo", flow[0])
        if pred_bidir_flow:
            _save_png(base + "_flow_bwd.png", flow_to_color(flow[1]))
            if fwd_bwd_consistency_check:
                fwd_occ, bwd_occ = forward_backward_consistency_check(
                    flow[0:1], flow[1:2])
                _save_png(base + "_occ.png",
                          (np.asarray(fwd_occ)[0] * 255).astype(np.uint8))
                _save_png(base + "_occ_bwd.png",
                          (np.asarray(bwd_occ)[0] * 255).astype(np.uint8))


def _save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(arr).save(path)
