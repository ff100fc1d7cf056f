"""Data plane: frame IO roundtrips, augmentors, shard writer->reader->loader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowfromdepth_tpu.data import frame_io
from opticalflowfromdepth_tpu.data.augmentor import (
    FlowAugmentor, SparseFlowAugmentor, color_jitter)
from opticalflowfromdepth_tpu.data.datasets import AugmentedShards, one_hot
from opticalflowfromdepth_tpu.data.loader import Loader, collate
from opticalflowfromdepth_tpu.synth.pipeline import synthesize_sample
from opticalflowfromdepth_tpu.synth.writer import write_sample


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(
        size=(17, 23, 2)).astype(np.float32)
    path = str(tmp_path / "x.flo")
    frame_io.write_flo(path, flow)
    got = frame_io.read_flo(path)
    np.testing.assert_array_equal(got, flow)


def test_kitti_flow_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = (rng.normal(size=(10, 14, 2)) * 10).astype(np.float32)
    valid = (rng.random((10, 14)) > 0.3).astype(np.float32)
    path = str(tmp_path / "k.png")
    frame_io.write_flow_kitti(path, flow, valid)
    got_flow, got_valid = frame_io.read_flow_kitti(path)
    np.testing.assert_allclose(got_flow, flow, atol=1 / 64)
    np.testing.assert_array_equal(got_valid, valid)


def test_pfm_read(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "x.pfm")
    with open(path, "wb") as f:
        f.write(b"Pf\n4 3\n-1.0\n")
        np.flipud(data).astype("<f4").tofile(f)
    got, scale = frame_io.read_pfm(path)
    np.testing.assert_array_equal(got, data)
    assert scale == 1.0


def test_color_jitter_preserves_shape_dtype():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
    out = color_jitter(np.random.default_rng(1), img, 0.4, 0.4, 0.4, 0.1)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_flow_augmentor_shapes_and_flip_sign():
    rng = np.random.default_rng(0)
    h, w, ch, cw = 96, 128, 64, 96
    img1 = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    img2 = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    flow = rng.normal(size=(h, w, 2)).astype(np.float32)
    back = rng.normal(size=(h, w, 2)).astype(np.float32)
    d1 = rng.uniform(1, 100, (h, w)).astype(np.float32)
    d2 = rng.uniform(1, 100, (h, w)).astype(np.float32)
    aug = FlowAugmentor((ch, cw), rng=np.random.default_rng(3))
    o1, o2, of, ob, od1, od2 = aug(img1, img2, flow, back, d1, d2)
    assert o1.shape == (ch, cw, 3) and o2.shape == (ch, cw, 3)
    assert of.shape == (ch, cw, 2) and ob.shape == (ch, cw, 2)
    assert od1.shape[:2] == (ch, cw) and od2.shape[:2] == (ch, cw)


def test_sparse_resize_scatter():
    flow = np.zeros((8, 8, 2), np.float32)
    valid = np.zeros((8, 8), np.float32)
    flow[4, 4] = (2.0, -1.0)
    valid[4, 4] = 1
    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(flow, valid, 2.0, 2.0)
    assert f2.shape == (16, 16, 2) and v2.shape == (16, 16)
    assert v2.sum() == 1
    yy, xx = np.argwhere(v2 == 1)[0]
    np.testing.assert_allclose(f2[yy, xx], [4.0, -2.0])


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """Synthesize one tiny sample and write shards."""
    rng = np.random.default_rng(0)
    h, w = 48, 64
    img = jnp.asarray(rng.uniform(0, 255, (3, h, w)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(10, 200, (1, h, w)).astype(np.float32))
    sample = synthesize_sample(jax.random.PRNGKey(0), img, depth)
    sample = jax.tree.map(np.asarray, sample)
    out = str(tmp_path_factory.mktemp("shards"))
    n = write_sample(out, "t0", sample)
    assert n == 1 + 5 * 12
    return out


def test_shard_reader_schema(shard_dir):
    ds = AugmentedShards(shard_dir, crop_size=(32, 48), seed=0)
    assert len(ds) == 2 * 60
    s = ds[0]
    assert s["image1"].shape == (32, 48, 3)
    assert s["image2"].shape == (32, 48, 3)
    assert s["flow"].shape == (32, 48, 2)
    assert s["back_flow"].shape == (32, 48, 2)
    assert s["valid"].shape == (32, 48)
    assert s["label"].shape == (4,)
    assert s["label"].sum() == 1.0


def test_shard_reader_re_augment(shard_dir):
    ds = AugmentedShards(shard_dir, crop_size=(32, 48), re_augment=True,
                         aug_params=dict(crop_size=(32, 48), min_scale=0.0,
                                         max_scale=0.2, do_flip=True),
                         seed=0)
    s = ds[5]
    assert s["image1"].shape == (32, 48, 3)
    assert np.isfinite(s["flow"]).all()


def test_depthtoflow_reader(shard_dir):
    """D3: train directly on un-augmented group pairs, label 0
    (`dataloader.py:160-232`)."""
    from opticalflowfromdepth_tpu.data.datasets import DepthToFlowShards

    ds = DepthToFlowShards(shard_dir, seed=0, h_flip_prob=0.0,
                           v_flip_prob=0.0)
    assert len(ds) == 2 * 1  # epochs x group files
    group = np.load(os.path.join(shard_dir, "t0_group.npz"))["group"]
    seen = set()
    for i in range(12):
        s = ds[i % len(ds)]
        assert s["label"].argmax() == 0 and s["label"].sum() == 1.0
        assert s["image1"].shape == group.shape[1:] + (3,)
        assert s["flow"].shape == group.shape[1:] + (2,)
        # identify which of the 3 pairs was selected by matching image1
        for gi, (i0, d0, i1, d1, fl, bk) in enumerate(
                DepthToFlowShards._PAIRS):
            if np.allclose(s["image1"],
                           np.moveaxis(group[i0[0]:i0[1]], 0, -1)) and \
               np.allclose(s["flow"],
                           np.moveaxis(group[fl[0]:fl[1]], 0, -1)):
                np.testing.assert_allclose(
                    s["image2"], np.moveaxis(group[i1[0]:i1[1]], 0, -1))
                np.testing.assert_allclose(
                    s["depth1"], group[d0[0]].astype(np.float32))
                seen.add(gi)
                break
        else:
            raise AssertionError("sample matched no group pair")
    assert seen == {0, 1, 2}


def test_depthtoflow_flip_and_crop(shard_dir):
    from opticalflowfromdepth_tpu.data.datasets import DepthToFlowShards

    ds = DepthToFlowShards(shard_dir, crop_size=(32, 48), seed=1,
                           h_flip_prob=1.0, v_flip_prob=1.0)
    s = ds[0]
    assert s["image1"].shape == (32, 48, 3)
    assert s["flow"].shape == (32, 48, 2)
    assert s["valid"].shape == (32, 48)
    assert np.isfinite(s["flow"]).all()


def test_depthtoflow_stage(shard_dir):
    from opticalflowfromdepth_tpu.data.datasets import fetch_train_dataset

    ds = fetch_train_dataset("depthtoflow", crop_size=(32, 48),
                             shards_root={"redweb": shard_dir}, seed=0)
    s = ds[0]
    assert s["image1"].shape == (32, 48, 3)
    assert s["label"].argmax() == 0


def test_shard_reader_corrupt_fallback(shard_dir, tmp_path):
    import shutil
    d = str(tmp_path / "c")
    shutil.copytree(shard_dir, d)
    files = sorted(os.listdir(d))
    bad = os.path.join(d, [f for f in files if "_g0_a0" in f][0])
    with open(bad, "wb") as f:
        f.write(b"not an npz")
    ds = AugmentedShards(d, crop_size=(32, 48), seed=0)
    s = ds[0]  # index 0 -> corrupt file -> falls through to next
    assert s["image1"].shape == (32, 48, 3)


def test_loader_batches(shard_dir):
    ds = AugmentedShards(shard_dir, crop_size=(32, 48), seed=0)
    loader = Loader(ds, batch_size=4, num_workers=2, seed=0,
                    process_index=0, process_count=1)
    it = iter(loader)
    batch = next(it)
    assert batch["image1"].shape == (4, 32, 48, 3)
    assert batch["flow"].shape == (4, 32, 48, 2)
    batch2 = next(it)
    assert batch2["image1"].shape == (4, 32, 48, 3)


def test_loader_process_sharding(shard_dir):
    """Two processes draw disjoint strides of the same permutation."""
    ds = AugmentedShards(shard_dir, crop_size=(32, 48), seed=0)
    l0 = Loader(ds, batch_size=4, num_workers=1, seed=7,
                process_index=0, process_count=2)
    l1 = Loader(ds, batch_size=4, num_workers=1, seed=7,
                process_index=1, process_count=2)
    from itertools import islice
    i0 = list(islice(l0._index_stream(), 60))
    i1 = list(islice(l1._index_stream(), 60))
    assert set(i0[:30]).isdisjoint(set(i1[:30]))
    assert l0.local_batch == 2


def test_one_hot_label_mapping():
    np.testing.assert_array_equal(one_hot(0), [1, 0, 0, 0])
    np.testing.assert_array_equal(one_hot(3), [0, 0, 0, 1])


def test_packed_writer_matches_reference_writer(shard_dir, tmp_path):
    """write_sample_packed (on-device dtype cast + photometric dedup) must
    produce byte-equivalent npz content to the original write_sample."""
    from opticalflowfromdepth_tpu.synth.pipeline import synthesize_sample_packed
    from opticalflowfromdepth_tpu.synth.writer import write_sample_packed

    rng = np.random.default_rng(0)
    h, w = 48, 64
    img = jnp.asarray(rng.uniform(0, 255, (3, h, w)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(10, 200, (1, h, w)).astype(np.float32))
    packed = synthesize_sample_packed(jax.random.PRNGKey(0), img, depth)
    packed = jax.tree.map(np.asarray, packed)
    out = str(tmp_path / "packed")
    n = write_sample_packed(out, "t0", packed)
    assert n == 1 + 5 * 12

    ref_files = sorted(os.listdir(shard_dir))
    got_files = sorted(os.listdir(out))
    assert ref_files == got_files
    for name in ref_files:
        ref = np.load(os.path.join(shard_dir, name))
        got = np.load(os.path.join(out, name))
        assert sorted(ref.files) == sorted(got.files), name
        for k in ref.files:
            assert ref[k].dtype == got[k].dtype, (name, k)
            np.testing.assert_array_equal(ref[k], got[k],
                                          err_msg=f"{name}:{k}")


def test_loader_abandoned_iterator_leaves_no_threads(shard_dir):
    """Abandoning a Loader generator must stop its producer thread (round-2
    review: a blocking q.put leaked one thread + one pinned batch)."""
    import gc
    import threading
    import time as _time

    from opticalflowfromdepth_tpu.data.loader import Loader

    ds = AugmentedShards(shard_dir, crop_size=(32, 48), seed=0)
    before = threading.active_count()
    for _ in range(3):
        it = iter(Loader(ds, batch_size=2, num_workers=2, prefetch=1,
                         process_index=0, process_count=1))
        next(it)
        it.close()   # generator close triggers the finally/stop path
    gc.collect()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"{threading.active_count() - before} leaked loader threads")


def test_device_put_sharded_batch_multihost_branch():
    """Forced process_count>1 exercises make_array_from_process_local_data
    (all shards addressable in a single-process CPU-mesh run); values must
    match the single-process device_put path."""
    from jax.sharding import Mesh

    from opticalflowfromdepth_tpu.data.loader import device_put_sharded_batch

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    a = device_put_sharded_batch(batch, mesh)["x"]
    b = device_put_sharded_batch(batch, mesh, process_count=2)["x"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augment_pair_matches_straightline():
    """The merged-sort / flip fast-path geometric augment must equal the
    straight-line composition of the public ops (`preprocess.py:116-147`
    order): ConcatFlow, two pack warps, inpaint, BackFlow."""
    import jax
    from opticalflowfromdepth_tpu.core import special_flow
    from opticalflowfromdepth_tpu.core.depth_utils import fix_warped_depth
    from opticalflowfromdepth_tpu.ops.forward_warp import (
        back_flow, concat_flow, forward_warp)
    from opticalflowfromdepth_tpu.ops.inpaint import inpaint
    from opticalflowfromdepth_tpu.synth.pipeline import Pair, augment_pair

    rng = np.random.default_rng(7)
    h, w = 24, 32
    mk = lambda c, lo, hi: jnp.asarray(
        rng.uniform(lo, hi, size=(c, h, w)).astype(np.float32))
    pair = Pair(img_a=mk(3, 0, 255), depth_a=mk(1, 1, 100),
                img_b=mk(3, 0, 255), depth_b=mk(1, 1, 100),
                flow_ab=mk(2, -4, 4), back_flow_ab=mk(2, -4, 4))

    for t in (5, 6, 7):
        key = jax.random.PRNGKey(t)
        got = augment_pair(key, pair, t)

        img0, img0_depth, img1, img1_depth, flow01, back_flow01 = pair
        sf, bsf = special_flow.special_flow(key, h, w, t)
        aug0_flow, _ = concat_flow(bsf, sf, flow01, img0_depth)
        aug1_flow, _ = concat_flow(flow01, back_flow01, sf, img1_depth)
        pack0 = jnp.concatenate([img0, img0_depth], axis=0)
        out0, v0, c0 = forward_warp(pack0, sf, img0_depth)
        aug_img0 = inpaint(out0[0:3], v0, c0)
        aug_img0_depth = fix_warped_depth(out0[3:4])
        pack1 = jnp.concatenate([img1, img1_depth], axis=0)
        out1, v1, c1 = forward_warp(pack1, sf, img1_depth)
        aug_img1 = inpaint(out1[0:3], v1, c1)
        aug_img1_depth = fix_warped_depth(out1[3:4])
        back_aug0_flow, _ = back_flow(aug0_flow, aug_img0_depth)
        back_aug1_flow, _ = back_flow(aug1_flow, img0_depth)
        want1 = jnp.concatenate(
            [aug_img0, aug_img0_depth, aug0_flow, back_aug0_flow], axis=0)
        want2 = jnp.concatenate(
            [aug1_flow, back_aug1_flow, aug_img1, aug_img1_depth], axis=0)

        np.testing.assert_array_equal(np.asarray(got.set1),
                                      np.asarray(want1), err_msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(got.set2),
                                      np.asarray(want2), err_msg=f"t={t}")


def test_flow_int16_shards_roundtrip_and_shrink(tmp_path):
    """--flow_int16 shards: flows quantize to 1/64 px (KITTI encoding),
    the reader decodes by dtype, every other key stays byte-identical,
    and the quantized shards deflate smaller."""
    from opticalflowfromdepth_tpu.synth.pipeline import (
        synthesize_sample_packed)
    from opticalflowfromdepth_tpu.synth.writer import (
        dequantize_flow, write_sample_packed)

    rng = np.random.default_rng(3)
    h, w = 48, 64
    img = jnp.asarray(rng.uniform(0, 255, (3, h, w)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = jnp.asarray(  # smooth (real-data-like) depth -> smooth flows
        (120 + 80 * np.sin(xx / 17) * np.cos(yy / 23))[None])
    packed = jax.tree.map(np.asarray, synthesize_sample_packed(
        jax.random.PRNGKey(1), img, depth))

    d_f16 = str(tmp_path / "f16")
    d_i16 = str(tmp_path / "i16")
    write_sample_packed(d_f16, "t0", packed)
    write_sample_packed(d_i16, "t0", packed, flow_int16=True)

    files = sorted(os.listdir(d_f16))
    assert files == sorted(os.listdir(d_i16))
    size_f16 = sum(os.path.getsize(os.path.join(d_f16, f)) for f in files)
    size_i16 = sum(os.path.getsize(os.path.join(d_i16, f)) for f in files)
    # quantized integers deflate better than f16 bit patterns (~6% whole-
    # shard / ~15% flow-entry on smooth synthetic depth; more on real data)
    assert size_i16 < 0.98 * size_f16, (size_i16, size_f16)

    for name in files:
        if name.endswith("_group.npz"):
            continue
        ref = np.load(os.path.join(d_f16, name))
        got = np.load(os.path.join(d_i16, name))
        assert sorted(ref.files) == sorted(got.files), name
        for k in ref.files:
            if k.startswith(("flow_", "back_flow_")):
                assert got[k].dtype == np.int16, (name, k)
                np.testing.assert_allclose(
                    dequantize_flow(got[k]), ref[k].astype(np.float32),
                    atol=1 / 64 + 1e-3, err_msg=f"{name}:{k}")
            else:
                np.testing.assert_array_equal(ref[k], got[k],
                                              err_msg=f"{name}:{k}")

    # reader decodes transparently; non-flow outputs identical
    a = AugmentedShards(d_f16, crop_size=(32, 48), seed=5)[0]
    b = AugmentedShards(d_i16, crop_size=(32, 48), seed=5)[0]
    np.testing.assert_array_equal(a["image1"], b["image1"])
    np.testing.assert_allclose(a["flow"], b["flow"], atol=1 / 64 + 1e-3)
    np.testing.assert_allclose(a["back_flow"], b["back_flow"],
                               atol=1 / 64 + 1e-3)
