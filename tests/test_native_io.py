"""Native (C++) npz shard decoder vs numpy oracle.

The native decoder (`native/shardio.cc`, bound in `data/native_io.py`) must
be byte-exact with np.load on everything the shard writer emits
(`synth/writer.py`: uint8 images, float16 flows/depths, savez_compressed)
plus uncompressed npz, scalars, and fortran-order arrays.
"""

import os

import numpy as np
import pytest

from opticalflowfromdepth_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native IO toolchain unavailable")


def _roundtrip(tmp_path, save_fn, arrays):
    path = os.path.join(tmp_path, "t.npz")
    save_fn(path, **arrays)
    got = native_io.load_npz(str(path))
    assert set(got) == set(arrays)
    for k, ref in arrays.items():
        np.testing.assert_array_equal(got[k], np.asarray(ref), err_msg=k)
        assert got[k].dtype == np.asarray(ref).dtype, k


@pytest.mark.parametrize("save_fn", [np.savez, np.savez_compressed])
def test_roundtrip_mixed_dtypes(tmp_path, save_fn):
    rng = np.random.default_rng(0)
    _roundtrip(tmp_path, save_fn, {
        "img": rng.integers(0, 256, (37, 53, 3)).astype(np.uint8),
        "flow": rng.normal(size=(37, 53, 2)).astype(np.float16),
        "depth": rng.uniform(1, 100, (37, 53)).astype(np.float32),
        "big": rng.normal(size=(5, 7, 3, 2)).astype(np.float64),
        "idx": rng.integers(-5, 5, (11,)).astype(np.int32),
        "label": np.int64(3),
        "flag": np.array(True),
    })


def test_roundtrip_shard_like(tmp_path):
    """Exactly the writer's schema (`synth/writer.py:40-67`)."""
    rng = np.random.default_rng(1)
    arrays = {}
    for s in ("1", "2"):
        arrays[f"img0_{s}"] = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
        arrays[f"img1_{s}"] = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
        arrays[f"flow_{s}"] = rng.normal(size=(64, 96, 2)).astype(np.float16)
        arrays[f"back_flow_{s}"] = rng.normal(size=(64, 96, 2)).astype(np.float16)
        arrays[f"depth0_{s}"] = rng.uniform(1, 100, (64, 96)).astype(np.float16)
        arrays[f"depth1_{s}"] = rng.uniform(1, 100, (64, 96)).astype(np.float16)
    arrays["label"] = np.asarray(6)
    _roundtrip(tmp_path, np.savez_compressed, arrays)


def test_fortran_order(tmp_path):
    x = np.asfortranarray(np.arange(24, dtype=np.float32).reshape(4, 6))
    path = os.path.join(tmp_path, "f.npz")
    np.savez(path, x=x)
    got = native_io.load_npz(str(path))["x"]
    np.testing.assert_array_equal(got, x)


def test_corrupt_file_raises(tmp_path):
    path = os.path.join(tmp_path, "bad.npz")
    with open(path, "wb") as f:
        f.write(b"this is not a zip file" * 10)
    with pytest.raises(IOError):
        native_io.load_npz(str(path))


def test_truncated_file_raises(tmp_path):
    path = os.path.join(tmp_path, "t.npz")
    np.savez_compressed(path, x=np.zeros((100, 100), np.float32))
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(IOError):
        native_io.load_npz(str(path))


def test_prefetch_pool_out_of_order(tmp_path):
    rng = np.random.default_rng(2)
    paths, refs = [], []
    for i in range(12):
        p = os.path.join(tmp_path, f"s{i}.npz")
        arr = rng.normal(size=(33, 47, 2)).astype(np.float32)
        np.savez_compressed(p, flow=arr, i=np.int32(i))
        paths.append(p)
        refs.append(arr)

    pool = native_io.Prefetcher(num_threads=3)
    try:
        tickets = [pool.submit(p) for p in paths]
        # take in reverse order: tickets resolve independently of order
        for i in reversed(range(12)):
            got = pool.take(tickets[i])
            np.testing.assert_array_equal(got["flow"], refs[i])
            assert int(got["i"]) == i
    finally:
        pool.close()


def test_pool_propagates_errors(tmp_path):
    bad = os.path.join(tmp_path, "nope.npz")
    pool = native_io.Prefetcher(num_threads=1)
    try:
        t = pool.submit(bad)
        with pytest.raises(IOError):
            pool.take(t)
    finally:
        pool.close()
