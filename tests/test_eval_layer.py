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


# ---------------------------------------------------------------------------
# end-to-end submission + directory inference (VERDICT r3 item 4;
# `adjusted_RAFT/evaluate.py:195-257`, `adjusted_gmflow/evaluate.py:835-954`)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fake_test_root(tmp_path_factory):
    """Tiny fake Sintel TEST split (two scenes x both dstypes) + KITTI
    testing split — the submission entrypoints' input trees."""
    import cv2
    root = tmp_path_factory.mktemp("bench_test")
    rng = np.random.default_rng(1)
    h, w = 52, 70   # deliberately not divisible by 8: padder must act

    for dstype in ("clean", "final"):
        for scene, n in (("alley_9", 3), ("bandage_9", 2)):
            d = root / "Sintel" / "test" / dstype / scene
            d.mkdir(parents=True)
            for i in range(n):
                img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                cv2.imwrite(str(d / f"frame_{i + 1:04d}.png"), img)

    kt = root / "KITTI" / "testing" / "image_2"
    kt.mkdir(parents=True)
    for i in range(2):
        for t in (10, 11):
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            cv2.imwrite(str(kt / f"{i:06d}_{t}.png"), img)
    return str(root)


def test_create_sintel_submission_e2e(fake_test_root, tmp_path):
    from opticalflowfromdepth_tpu.eval.submission import (
        create_sintel_submission)

    calls = []

    def infer(image1, image2, flow_init=None):
        b, h, w, _ = image1.shape
        calls.append(None if flow_init is None else np.asarray(flow_init))
        flow = np.full((b, h, w, 2), 2.5, np.float32)
        return flow * 0.5, flow   # (flow_low, flow) RAFT test_mode contract

    out = str(tmp_path / "sintel_sub")
    create_sintel_submission(infer, root=fake_test_root, output_path=out,
                             warm_start=True)

    # (3-1)+(2-1) pairs per dstype, both dstypes
    for dstype in ("clean", "final"):
        assert sorted(os.listdir(os.path.join(out, dstype, "alley_9"))) == [
            "frame0001.flo", "frame0002.flo"]
        assert os.listdir(os.path.join(out, dstype, "bandage_9")) == [
            "frame0001.flo"]
    # written flow roundtrips at the UNPADDED size
    flo = frame_io.read_flo(
        os.path.join(out, "clean", "alley_9", "frame0001.flo"))
    assert flo.shape == (52, 70, 2)
    np.testing.assert_allclose(flo, 2.5, atol=1e-6)

    # warm start: first frame of each scene gets no init; later frames get
    # the forward-splat of the previous low-res flow (constant 1.25 here)
    assert len(calls) == 6
    per_scene = [calls[0:2], calls[2:3], calls[3:5], calls[5:6]]
    for scene_calls in per_scene:
        assert scene_calls[0] is None
        for later in scene_calls[1:]:
            assert later is not None
            np.testing.assert_allclose(later[0, 3:-3, 3:-3], 1.25, atol=1e-5)


def test_create_kitti_submission_e2e(fake_test_root, tmp_path):
    from opticalflowfromdepth_tpu.eval.submission import (
        create_kitti_submission)

    def infer(image1, image2):
        b, h, w, _ = image1.shape
        return np.full((b, h, w, 2), -3.25, np.float32)

    out = str(tmp_path / "kitti_sub")
    create_kitti_submission(infer, root=fake_test_root, output_path=out)
    assert sorted(os.listdir(out)) == ["000000_10.png", "000001_10.png"]
    flow, valid = frame_io.read_flow_kitti(
        os.path.join(out, "000000_10.png"))
    assert flow.shape == (52, 70, 2)
    np.testing.assert_allclose(flow, -3.25, atol=1 / 64)  # 16-bit quantized
    np.testing.assert_array_equal(valid, 1.0)


def test_inference_on_dir_e2e(tmp_path):
    from opticalflowfromdepth_tpu.eval.inference import inference_on_dir
    import cv2

    src = tmp_path / "frames"
    src.mkdir()
    rng = np.random.default_rng(2)
    h, w = 52, 70
    for i in range(3):
        cv2.imwrite(str(src / f"f{i:02d}.png"),
                    rng.integers(0, 255, (h, w, 3)).astype(np.uint8))

    def infer_bidir(image1, image2):
        b, hh, ww, _ = image1.shape
        fwd = np.full((b, hh, ww, 2), 4.0, np.float32)
        return np.concatenate([fwd, -fwd], axis=0)  # gmflow.py:115-117

    out = str(tmp_path / "inferred")
    inference_on_dir(infer_bidir, str(src), output_path=out,
                     save_flo_flow=True, pred_bidir_flow=True,
                     fwd_bwd_consistency_check=True)

    names = sorted(os.listdir(out))
    for stem in ("f00", "f01"):   # 3 frames -> 2 consecutive pairs
        for suffix in ("_flow.png", "_flow_bwd.png", "_pred.flo",
                       "_occ.png", "_occ_bwd.png"):
            assert stem + suffix in names, (stem + suffix, names)
    flo = frame_io.read_flo(os.path.join(out, "f00_pred.flo"))
    assert flo.shape == (h, w, 2)
    np.testing.assert_allclose(flo, 4.0, atol=1e-6)
    # fwd = -bwd everywhere => perfectly consistent => no occlusion marked
    from PIL import Image
    occ = np.asarray(Image.open(os.path.join(out, "f00_occ.png")))
    interior = occ[8:-8, 8:-8]
    assert interior.max() == 0
