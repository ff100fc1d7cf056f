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


# ---------------------------------------------------------------------------
# native encoder (round 5)
# ---------------------------------------------------------------------------

def test_encoder_roundtrip_np_load_and_native(tmp_path):
    """save_npz output must be np.load-compatible (stored + deflated
    entries) and native-decodable."""
    rng = np.random.default_rng(1)
    arrays = {
        "img": rng.integers(0, 256, (41, 57, 3)).astype(np.uint8),
        "flow": rng.normal(size=(41, 57, 2)).astype(np.float16),
        "q16": (rng.normal(0, 300, (41, 57, 2)) * 64).astype(np.int16),
        "depth": rng.uniform(1, 100, (41, 57)).astype(np.float32),
        "label": np.int32(6),
    }
    for store_floats in (True, False):
        path = os.path.join(tmp_path, f"e{int(store_floats)}.npz")
        native_io.save_npz(path, arrays, store_floats=store_floats)
        with np.load(path) as z:
            for k, v in arrays.items():
                np.testing.assert_array_equal(z[k], v, err_msg=k)
                assert z[k].dtype == np.asarray(v).dtype, k
        got = native_io.load_npz(path)
        for k, v in arrays.items():
            np.testing.assert_array_equal(got[k], v, err_msg=k)


def test_encoder_blob_dedup_and_many_files(tmp_path):
    """One blob shared by many files; every file reads back correctly and
    the shared entry is identical. Exercises the work-stealing pool with
    more files than threads."""
    rng = np.random.default_rng(2)
    shared = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    uniq = [rng.normal(size=(64, 96, 2)).astype(np.float16)
            for _ in range(16)]
    enc = native_io.ShardEncoder(threads=3)
    try:
        for i in range(16):
            enc.file(os.path.join(tmp_path, f"f{i}.npz"),
                     [("shared", shared), ("u", uniq[i])])
        enc.drain()
    finally:
        enc.close()
    for i in range(16):
        with np.load(os.path.join(tmp_path, f"f{i}.npz")) as z:
            np.testing.assert_array_equal(z["shared"], shared)
            np.testing.assert_array_equal(z["u"], uniq[i])


def test_encoder_error_reported(tmp_path):
    enc = native_io.ShardEncoder(threads=2)
    try:
        enc.file(os.path.join(tmp_path, "no_such_dir", "x.npz"),
                 [("a", np.zeros((4, 4), np.float32))])
        with pytest.raises(IOError):
            enc.drain()
    finally:
        enc.close()


def test_async_writer_native_matches_python(tmp_path):
    """AsyncShardWriter's native backend must produce the same file set
    with identical decoded content as the Python writer."""
    import jax
    import jax.numpy as jnp
    from opticalflowfromdepth_tpu.synth.pipeline import (
        synthesize_sample_packed)
    from opticalflowfromdepth_tpu.synth.writer import (
        AsyncShardWriter, write_sample_packed)

    rng = np.random.default_rng(0)
    h, w = 48, 64
    img = jnp.asarray(rng.uniform(0, 255, (3, h, w)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    dep = jnp.asarray((130 + 70 * np.sin(xx / 19) * np.cos(yy / 23))[None])
    packed = jax.tree.map(np.asarray, synthesize_sample_packed(
        jax.random.PRNGKey(0), img, dep))

    nat = os.path.join(tmp_path, "nat")
    py = os.path.join(tmp_path, "py")
    wr = AsyncShardWriter(nat, workers=2)
    assert wr.enc is not None, "native encoder should be available here"
    wr.submit("t", packed)
    n = wr.drain()
    os.makedirs(py)
    n2 = write_sample_packed(py, "t", packed)
    assert n == n2
    fa, fb = sorted(os.listdir(nat)), sorted(os.listdir(py))
    assert fa == fb
    for f in fa:
        with np.load(os.path.join(nat, f)) as za, \
             np.load(os.path.join(py, f)) as zb:
            assert sorted(za.files) == sorted(zb.files)
            for k in za.files:
                np.testing.assert_array_equal(za[k], zb[k], err_msg=f + k)
