"""Eval plane: padder, metrics, validators on fake datasets, viz, occlusion."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.data import frame_io
from opticalflowfromdepth_tpu.eval.padder import InputPadder
from opticalflowfromdepth_tpu.eval.occlusion import (
    forward_backward_consistency_check)
from opticalflowfromdepth_tpu.eval.submission import forward_interpolate
from opticalflowfromdepth_tpu.eval.validators import (
    validate_kitti, validate_sintel)
from opticalflowfromdepth_tpu.utils.flow_viz import flow_to_color


def test_padder_sintel_roundtrip():
    x = np.random.default_rng(0).normal(size=(1, 436, 1024, 3)).astype(
        np.float32)
    p = InputPadder(x.shape, mode="sintel", padding_factor=8)
    (xp,) = p.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    assert xp.shape == (1, 440, 1024, 3)
    np.testing.assert_array_equal(p.unpad(xp), x)


def test_padder_kitti_mode_top_pad():
    x = np.zeros((1, 375, 1242, 3), np.float32)
    p = InputPadder(x.shape, mode="kitti", padding_factor=8)
    (xp,) = p.pad(x)
    assert xp.shape == (1, 376, 1248, 3)
    np.testing.assert_array_equal(p.unpad(xp), x)


def test_forward_interpolate_constant_flow():
    flow = np.ones((20, 30, 2), np.float32) * 3.0
    out = forward_interpolate(flow)
    assert out.shape == flow.shape
    # splatted constant flow stays ~constant in the interior
    np.testing.assert_allclose(out[5:-5, 5:-5], 3.0, atol=1e-5)


def test_fb_consistency_zero_flow_no_occlusion():
    fwd = jnp.zeros((1, 16, 24, 2))
    bwd = jnp.zeros((1, 16, 24, 2))
    occ_f, occ_b = forward_backward_consistency_check(fwd, bwd)
    assert float(occ_f.sum()) == 0.0 and float(occ_b.sum()) == 0.0


def test_fb_consistency_inconsistent_flags():
    fwd = jnp.ones((1, 16, 24, 2)) * 5.0
    bwd = jnp.ones((1, 16, 24, 2)) * 5.0  # bwd should be ~-5 if consistent
    occ_f, _ = forward_backward_consistency_check(fwd, bwd)
    assert float(occ_f.mean()) > 0.9


def test_flow_to_color():
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(32, 48, 2)).astype(np.float32) * 5
    img = flow_to_color(flow)
    assert img.shape == (32, 48, 3) and img.dtype == np.uint8
    # zero flow is near-white (center of the wheel)
    white = flow_to_color(np.zeros((8, 8, 2), np.float32))
    assert (white > 240).all()


@pytest.fixture(scope="module")
def fake_bench_root(tmp_path_factory):
    """Tiny fake Sintel + KITTI trees."""
    import cv2
    root = tmp_path_factory.mktemp("bench")
    rng = np.random.default_rng(0)

    # Sintel: one scene, 3 frames, 2 flows
    sc = root / "Sintel" / "training"
    for sub in ("clean/alley_1", "flow/alley_1", "occlusions/alley_1"):
        (sc / sub).mkdir(parents=True)
    h, w = 64, 96
    for i in range(3):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(sc / "clean/alley_1" / f"frame_{i:04d}.png"), img)
    for i in range(2):
        frame_io.write_flo(str(sc / "flow/alley_1" / f"frame_{i:04d}.flo"),
                           np.full((h, w, 2), 1.5, np.float32))
        occ = np.zeros((h, w), np.uint8)
        occ[:, : w // 2] = 255  # left half occluded
        cv2.imwrite(str(sc / "occlusions/alley_1" / f"frame_{i:04d}.png"),
                    occ)

    # KITTI: 2 pairs
    kt = root / "KITTI" / "training"
    for sub in ("image_2", "flow_occ"):
        (kt / sub).mkdir(parents=True)
    for i in range(2):
        for t in (10, 11):
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            cv2.imwrite(str(kt / "image_2" / f"{i:06d}_{t}.png"), img)
        flow = np.full((h, w, 2), -2.0, np.float32)
        valid = np.ones((h, w), np.float32)
        frame_io.write_flow_kitti(str(kt / "flow_occ" / f"{i:06d}_10.png"),
                                  flow, valid)
    return str(root)


def constant_infer(value):
    def infer(image1, image2):
        b, h, w, _ = image1.shape
        return np.full((b, h, w, 2), value, np.float32)
    return infer


def test_validate_sintel_fake(fake_bench_root):
    res = validate_sintel(constant_infer(1.5), root=fake_bench_root,
                          dstype="clean")
    assert res["sintel_clean_epe"] == pytest.approx(0.0, abs=1e-5)
    res_bad = validate_sintel(constant_infer(0.0), root=fake_bench_root,
                              dstype="clean")
    # gt flow is (1.5, 1.5) everywhere -> EPE = 1.5*sqrt(2)
    assert res_bad["sintel_clean_epe"] == pytest.approx(
        1.5 * np.sqrt(2), abs=1e-4)


def test_validate_kitti_fake(fake_bench_root):
    res = validate_kitti(constant_infer(-2.0), root=fake_bench_root)
    assert res["kitti_epe"] == pytest.approx(0.0, abs=1e-5)
    assert res["kitti_f1"] == pytest.approx(0.0, abs=1e-6)
    res_bad = validate_kitti(constant_infer(10.0), root=fake_bench_root)
    # epe = 12*sqrt(2) > 3 and epe/mag >> 0.05 everywhere -> Fl-all = 100
    assert res_bad["kitti_f1"] == pytest.approx(100.0, abs=1e-4)


def test_validate_sintel_matched_unmatched(fake_bench_root):
    """Matched = non-occluded ∧ in-frame (`adjusted_gmflow/evaluate.py:363`).

    Infer (1.5, 1.5) on gt (1.5, 1.5): EPE 0 everywhere, so both matched
    (right half) and unmatched (occluded left half) EPE are 0; with a wrong
    prediction both become 1.5*sqrt(2).
    """
    res = validate_sintel(constant_infer(1.5), root=fake_bench_root,
                          dstype="clean", evaluate_matched_unmatched=True)
    assert res["sintel_clean_matched"] == pytest.approx(0.0, abs=1e-5)
    assert res["sintel_clean_unmatched"] == pytest.approx(0.0, abs=1e-5)
    res_bad = validate_sintel(constant_infer(0.0), root=fake_bench_root,
                              dstype="clean",
                              evaluate_matched_unmatched=True)
    assert res_bad["sintel_clean_matched"] == pytest.approx(
        1.5 * np.sqrt(2), abs=1e-4)
    assert res_bad["sintel_clean_unmatched"] == pytest.approx(
        1.5 * np.sqrt(2), abs=1e-4)


def test_in_boundary_mask_semantics():
    from opticalflowfromdepth_tpu.eval.validators import in_boundary_mask
    h, w = 8, 8
    flow = np.zeros((h, w, 2), np.float32)
    flow[:, -1, 0] = 5.0  # last column points out of frame
    m = in_boundary_mask(flow)
    assert m[:, -1].max() == 0.0 and m[:, :-1].min() == 1.0


def test_validate_sintel_count_time(fake_bench_root):
    res = validate_sintel(constant_infer(1.5), root=fake_bench_root,
                          dstype="clean", count_time=True, timing_runs=3,
                          with_speed_metric=True)
    assert "inference_time_ms" in res and res["inference_time_ms"] > 0
    assert "sintel_clean_s0_10" in res
