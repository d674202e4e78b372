"""ctypes binding for the native C++ TFRecord reader (native/ptdata.cc).

The native library decodes GZIP TFRecord shards (zlib inflate + record framing
+ minimal Example proto walk) off the Python hot path and releases the GIL, so
the pipeline's worker threads truly overlap with training. Falls back cleanly
when the shared object has not been built (pure-Python codec in tfrecord.py).

Build: `make -C native` (produces native/libptdata.so).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libptdata.so"),
    os.path.join(os.path.dirname(__file__), "libptdata.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for path in _SO_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.ptdata_read_file.restype = ctypes.c_void_p
                lib.ptdata_read_file.argtypes = [ctypes.c_char_p, ctypes.c_int]
                lib.ptdata_num_records.restype = ctypes.c_long
                lib.ptdata_num_records.argtypes = [ctypes.c_void_p]
                lib.ptdata_copy_clips.restype = ctypes.c_int
                lib.ptdata_copy_clips.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_long,
                ]
                lib.ptdata_clips_ptr.restype = ctypes.c_void_p
                lib.ptdata_clips_ptr.argtypes = [ctypes.c_void_p]
                lib.ptdata_labels_ptr.restype = ctypes.c_void_p
                lib.ptdata_labels_ptr.argtypes = [ctypes.c_void_p]
                lib.ptdata_free.argtypes = [ctypes.c_void_p]
                if hasattr(lib, "ptdata_crc32c"):
                    # Added after the first .so builds; guard so a stale
                    # library still loads for the reader path.
                    lib.ptdata_crc32c.restype = ctypes.c_uint
                    lib.ptdata_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_long]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def crc32c(data: bytes):
    """CRC32C via the native library, or None if it is not built / too old."""
    lib = _load()
    if lib is None or not hasattr(lib, "ptdata_crc32c"):
        return None
    return int(lib.ptdata_crc32c(data, len(data)))


class ShardView:
    """Zero-copy view over one decoded shard (clips [N,T,H,W,3], labels [N]).

    The underlying buffer belongs to the C++ handle: use the views only while
    the ShardView is open, and copy anything that outlives `close()` (numpy
    fancy indexing copies, so gathered batches are safe). Handles are pooled
    in the library, so open/close across shards reuses already-faulted pages
    — on this VM a fresh ~50-100MB allocation costs seconds of first-touch
    page faults, which is why the pipeline avoids per-clip copies entirely."""

    def __init__(self, path: str, timesteps: int, height: int = 32,
                 width: int = 32):
        lib = _load()
        clip_bytes = timesteps * height * width * 3
        self._lib = lib
        self._handle = lib.ptdata_read_file(path.encode(), clip_bytes)
        if not self._handle:
            raise IOError(f"ptdata failed to read {path}")
        n = lib.ptdata_num_records(self._handle)
        if n == 0:
            # Legitimately empty shard: expose empty arrays (the data()
            # pointers may be NULL for a fresh handle).
            self.clips = np.empty((0, timesteps, height, width, 3), np.uint8)
            self.labels = np.empty((0,), np.uint8)
            return
        cptr = lib.ptdata_clips_ptr(self._handle)
        lptr = lib.ptdata_labels_ptr(self._handle)
        self.clips = np.ctypeslib.as_array(
            ctypes.cast(cptr, ctypes.POINTER(ctypes.c_uint8)),
            shape=(n, timesteps, height, width, 3))
        self.labels = np.ctypeslib.as_array(
            ctypes.cast(lptr, ctypes.POINTER(ctypes.c_uint8)), shape=(n,))

    def __len__(self) -> int:
        return int(self.labels.shape[0])

    def close(self):
        if self._handle:
            self._lib.ptdata_free(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_clip_records(path: str, timesteps: int, height: int = 32, width: int = 32):
    """Yield (uint8 [T,H,W,3] clip, label byte) from one shard via the C++
    reader (compat shim; the pipeline's fast path uses ShardView directly)."""
    with ShardView(path, timesteps, height, width) as shard:
        for i in range(len(shard)):
            yield shard.clips[i].copy(), int(shard.labels[i])
