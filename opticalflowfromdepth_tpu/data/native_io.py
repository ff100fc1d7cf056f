"""ctypes bindings for the native (C++) npz shard decoder + prefetch pool.

The reference feeds training with forked torch-DataLoader worker processes
decoding npz shards (`adjusted_RAFT/core/datasets.py:354-358`,
`adjusted_gmflow/main.py:419-422`). The TPU-native replacement is
``native/shardio.cc``: an in-process C++ thread pool that parses ZIP/DEFLATE
npz containers entirely outside the GIL and returns numpy-ready buffers —
no fork, no pickling, no per-worker CUDA/TPU context.

Build model: compiled on demand with g++ into a content-hashed .so under
``~/.cache/ofd_native`` (first call only); everything degrades gracefully to
``np.load`` when a toolchain or zlib is unavailable or
``OFD_DISABLE_NATIVE_IO=1`` is set.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "shardio.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    if os.environ.get("OFD_DISABLE_NATIVE_IO"):
        return None
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~"), ".cache", "ofd_native")
    so_path = os.path.join(cache, f"libofdio_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache, exist_ok=True)
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", tmp, "-lz", "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    lib.ofdio_load.restype = ctypes.c_void_p
    lib.ofdio_load.argtypes = [ctypes.c_char_p]
    lib.ofdio_error.restype = ctypes.c_char_p
    lib.ofdio_error.argtypes = [ctypes.c_void_p]
    lib.ofdio_count.restype = ctypes.c_int
    lib.ofdio_count.argtypes = [ctypes.c_void_p]
    lib.ofdio_name.restype = ctypes.c_char_p
    lib.ofdio_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ofdio_dtype.restype = ctypes.c_char_p
    lib.ofdio_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ofdio_ndim.restype = ctypes.c_int
    lib.ofdio_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ofdio_shape.restype = None
    lib.ofdio_shape.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_longlong)]
    lib.ofdio_fortran.restype = ctypes.c_int
    lib.ofdio_fortran.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ofdio_nbytes.restype = ctypes.c_longlong
    lib.ofdio_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ofdio_copy.restype = None
    lib.ofdio_copy.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.ofdio_free.restype = None
    lib.ofdio_free.argtypes = [ctypes.c_void_p]
    lib.ofdio_enc_new.restype = ctypes.c_void_p
    lib.ofdio_enc_new.argtypes = [ctypes.c_int]
    lib.ofdio_enc_blob.restype = ctypes.c_longlong
    lib.ofdio_enc_blob.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong, ctypes.c_char_p,
        ctypes.c_int, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
        ctypes.c_int]
    lib.ofdio_enc_file.restype = ctypes.c_longlong
    lib.ofdio_enc_file.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_longlong)]
    lib.ofdio_enc_drain.restype = ctypes.c_longlong
    lib.ofdio_enc_drain.argtypes = [ctypes.c_void_p]
    lib.ofdio_enc_last_error.restype = ctypes.c_char_p
    lib.ofdio_enc_last_error.argtypes = [ctypes.c_void_p]
    lib.ofdio_enc_free.restype = None
    lib.ofdio_enc_free.argtypes = [ctypes.c_void_p]
    lib.ofdio_pool_new.restype = ctypes.c_void_p
    lib.ofdio_pool_new.argtypes = [ctypes.c_int]
    lib.ofdio_pool_submit.restype = ctypes.c_longlong
    lib.ofdio_pool_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ofdio_pool_take.restype = ctypes.c_void_p
    lib.ofdio_pool_take.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.ofdio_pool_free.restype = None
    lib.ofdio_pool_free.argtypes = [ctypes.c_void_p]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        with _LOCK:
            if not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def available() -> bool:
    """True iff the native decoder built and loaded on this machine."""
    return _lib() is not None


def _unpack(lib: ctypes.CDLL, handle: int, path: str) -> Dict[str, np.ndarray]:
    try:
        err = lib.ofdio_error(handle).decode()
        if err:
            raise IOError(f"native npz decode failed for {path}: {err}")
        out: Dict[str, np.ndarray] = {}
        for i in range(lib.ofdio_count(handle)):
            name = lib.ofdio_name(handle, i).decode()
            dtype = np.dtype(lib.ofdio_dtype(handle, i).decode())
            ndim = lib.ofdio_ndim(handle, i)
            shape_buf = (ctypes.c_longlong * 8)()
            lib.ofdio_shape(handle, i, shape_buf)
            shape = tuple(shape_buf[d] for d in range(ndim))
            arr = np.empty(
                shape[::-1] if lib.ofdio_fortran(handle, i) else shape, dtype)
            nbytes = lib.ofdio_nbytes(handle, i)
            assert arr.nbytes == nbytes, (path, name, arr.nbytes, nbytes)
            if nbytes:
                lib.ofdio_copy(handle, i,
                               arr.ctypes.data_as(ctypes.c_void_p))
            if lib.ofdio_fortran(handle, i):
                arr = arr.T  # stored column-major: view back as `shape`
            out[name] = arr
        return out
    finally:
        lib.ofdio_free(handle)


def load_npz(path: str) -> Dict[str, np.ndarray]:
    """Decode an npz file; native fast path, np.load fallback."""
    lib = _lib()
    if lib is None:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    handle = lib.ofdio_load(path.encode())
    return _unpack(lib, handle, path)


class ShardEncoder:
    """Native blob-deduplicated npz writer (multithreaded, no GIL).

    The synthesis schema repeats each parent image/flow across ~12 of the
    61 per-image files (matching `preprocess.py:453-476`); a *blob* is one
    npy entry compressed + CRC'd once and referenced by many files, so the
    host cost is proportional to UNIQUE bytes. uint8 entries are deflated
    (they compress well and fast); ≥16-bit float/int entries are STORED by
    default — f16/int16 flow tensors barely deflate (~0.7-0.9 ratio) and
    dominate the write time otherwise. Output stays np.load-compatible.

    Usage: blob()/file() any number of times, then drain() — which blocks
    until every file is on disk and releases the borrowed array refs.
    Do not submit concurrently with drain().
    """

    def __init__(self, threads: int = 0, level: int = 1,
                 store_floats: bool = True):
        lib = _lib()
        if lib is None or not hasattr(lib, "ofdio_enc_new"):
            raise RuntimeError("native IO unavailable; check g++/zlib or "
                               "unset OFD_DISABLE_NATIVE_IO")
        self._libref = lib
        self._enc = lib.ofdio_enc_new(threads if threads > 0
                                      else (os.cpu_count() or 2))
        self.level = level
        self.store_floats = store_floats
        self._keep: list = []          # contiguous arrays alive until drain
        self._ids: Dict[int, int] = {}  # id(array) -> blob id

    def blob(self, arr: np.ndarray) -> int:
        """Register one array as a blob; repeated calls with the SAME
        array object return the same blob id (the dedup seam)."""
        key = id(arr)
        got = self._ids.get(key)
        if got is not None:
            return got
        c = np.ascontiguousarray(arr)
        # keep BOTH alive until drain: `c` is borrowed by C++; `arr` pins
        # the id() key (a GC'd original could let a new array reuse the
        # address and silently alias the wrong blob)
        self._keep.append((arr, c))
        # floats are stored raw (f16 flow/depth bit patterns barely
        # deflate); uint8 images and int16 quantized flows deflate well
        deflate = c.dtype.kind != "f" or not self.store_floats
        shape = (ctypes.c_longlong * max(c.ndim, 1))(*c.shape)
        bid = self._libref.ofdio_enc_blob(
            self._enc, c.ctypes.data_as(ctypes.c_void_p), c.nbytes,
            c.dtype.str.encode(), c.ndim, shape,
            8 if deflate else 0, self.level)
        self._ids[key] = bid
        return bid

    def file(self, path: str, entries) -> None:
        """entries: iterable of (key, array). Queues one npz write."""
        names = []
        ids = []
        for k, a in entries:
            names.append(k.encode())
            ids.append(self.blob(np.asanyarray(a)))
        n = len(names)
        self._libref.ofdio_enc_file(
            self._enc, path.encode(), n,
            (ctypes.c_char_p * n)(*names), (ctypes.c_longlong * n)(*ids))

    def drain(self) -> None:
        fails = self._libref.ofdio_enc_drain(self._enc)
        self._keep.clear()
        self._ids.clear()
        if fails:
            err = self._libref.ofdio_enc_last_error(self._enc).decode()
            raise IOError(f"native shard encode: {fails} file(s) failed "
                          f"(last error: {err})")

    def close(self) -> None:
        if self._enc is not None:
            self._libref.ofdio_enc_free(self._enc)
            self._enc = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def save_npz(path: str, arrays: Dict[str, np.ndarray], level: int = 1,
             store_floats: bool = True) -> None:
    """One-shot native npz write (np.load-compatible); np.savez fallback."""
    lib = _lib()
    if lib is None or not hasattr(lib, "ofdio_enc_new"):
        np.savez_compressed(path, **arrays)
        return
    enc = ShardEncoder(threads=os.cpu_count() or 2, level=level,
                       store_floats=store_floats)
    try:
        enc.file(path, arrays.items())
        enc.drain()
    finally:
        enc.close()


class Prefetcher:
    """Native decode pool: submit paths, take decoded dicts by ticket.

    Decoding runs on C++ threads with the GIL fully released, so a single
    Python loader thread can keep N shards in flight — the in-process
    replacement for torch DataLoader's forked workers.
    """

    def __init__(self, num_threads: int = 4):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native IO unavailable; check g++/zlib or "
                               "unset OFD_DISABLE_NATIVE_IO")
        self._libref = lib
        self._pool = lib.ofdio_pool_new(num_threads)
        self._paths: Dict[int, str] = {}

    def submit(self, path: str) -> int:
        ticket = self._libref.ofdio_pool_submit(self._pool, path.encode())
        self._paths[ticket] = path
        return ticket

    def take(self, ticket: int) -> Dict[str, np.ndarray]:
        handle = self._libref.ofdio_pool_take(self._pool, ticket)
        return _unpack(self._libref, handle, self._paths.pop(ticket, "?"))

    def close(self) -> None:
        if self._pool is not None:
            self._libref.ofdio_pool_free(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
