"""ctypes bindings for the native indexed-TFRecord reader
(native/tfrecord_index.cc) and a Grain-compatible random-access data source.

Raw TFRecords are a stream format; Grain's global-shuffle pipelines need
O(1) record access.  ``build_index`` does one native scan producing a
binary (offset, length) index; ``IndexedTFRecordFile`` then serves
``reader[i] -> bytes`` via pread — thread-safe and picklable (handles
reopen lazily per process, so Grain can fork workers).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtfrecord_index.so")

_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "tfrecord_index.cc")
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO_PATH, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.tfr_build_index.restype = ctypes.c_int64
        lib.tfr_build_index.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_int]
        lib.tfr_open.restype = ctypes.c_void_p
        lib.tfr_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_int]
        lib.tfr_count.restype = ctypes.c_int64
        lib.tfr_count.argtypes = [ctypes.c_void_p]
        lib.tfr_record_length.restype = ctypes.c_int64
        lib.tfr_record_length.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tfr_read.restype = ctypes.c_int64
        lib.tfr_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_uint8),
                                 ctypes.c_int64]
        lib.tfr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def build_index(tfrecord_path: str, index_path: str | None = None,
                *, verify_crc: bool = True) -> int:
    """Index a TFRecord file (native sequential scan).  Returns the record
    count.  Default index path: ``<tfrecord_path>.idx``."""
    index_path = index_path or tfrecord_path + ".idx"
    lib = _load_lib()
    n = lib.tfr_build_index(tfrecord_path.encode(), index_path.encode(),
                            1 if verify_crc else 0)
    if n == -1:
        raise OSError(f"cannot open {tfrecord_path} or {index_path}")
    if n == -2:
        raise ValueError(f"corrupt TFRecord framing/CRC in {tfrecord_path}")
    return int(n)


class IndexedTFRecordFile:
    """Random access to one TFRecord file: ``reader[i] -> bytes``.

    Picklable (reopens lazily after fork/unpickle).  Builds the index on
    first use when missing.
    """

    def __init__(self, tfrecord_path: str, index_path: str | None = None,
                 *, verify_crc: bool = False):
        self.tfrecord_path = tfrecord_path
        self.index_path = index_path or tfrecord_path + ".idx"
        self.verify_crc = verify_crc
        self._handle = None
        self._count = None
        self._ensure_open()

    def _ensure_open(self):
        if self._handle is not None:
            return
        lib = _load_lib()
        if not os.path.exists(self.index_path):
            build_index(self.tfrecord_path, self.index_path)
        h = lib.tfr_open(self.tfrecord_path.encode(),
                         self.index_path.encode(),
                         1 if self.verify_crc else 0)
        if not h:
            raise OSError(
                f"cannot open {self.tfrecord_path} / {self.index_path}")
        self._handle = h
        self._count = int(lib.tfr_count(h))

    def __len__(self) -> int:
        self._ensure_open()
        return self._count

    def __getitem__(self, i: int) -> bytes:
        self._ensure_open()
        if i < 0:
            i += self._count
        lib = _load_lib()
        length = lib.tfr_record_length(self._handle, i)
        if length < 0:
            raise IndexError(i)
        buf = (ctypes.c_uint8 * max(length, 1))()
        got = lib.tfr_read(self._handle, i, buf, length)
        if got == -3:
            raise ValueError(f"CRC mismatch at record {i}")
        if got < 0 or got != length:
            raise OSError(f"read failed at record {i}: {got}")
        return bytes(bytearray(buf[:length]))

    def close(self):
        if self._handle is not None:
            _load_lib().tfr_close(self._handle)
            self._handle = None

    # picklable across Grain worker processes
    def __getstate__(self):
        return {"tfrecord_path": self.tfrecord_path,
                "index_path": self.index_path,
                "verify_crc": self.verify_crc}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._handle = None
        self._count = None


def make_source(pattern, *, verify_crc: bool = False):
    """Random-access Grain source for a file pattern, dispatched by format:
    ``*.array_record`` / ``*.arrayrecord`` files open as ArrayRecord (its
    footer IS the index), anything else as indexed TFRecords (our native
    C++ reader).  Both yield raw serialized tf.train.Example bytes, so the
    rest of the Grain pipeline is format-agnostic."""
    import glob as _glob

    if isinstance(pattern, str):
        paths = sorted(_glob.glob(pattern)) or [pattern]
    else:
        paths = list(pattern)
    if any(p.endswith((".array_record", ".arrayrecord")) for p in paths):
        if not all(p.endswith((".array_record", ".arrayrecord"))
                   for p in paths):
            raise ValueError(f"mixed record formats in {paths}")
        from grain.sources import ArrayRecordDataSource

        return ArrayRecordDataSource(paths)
    return TFRecordDataSource(paths, verify_crc=verify_crc)


class TFRecordDataSource:
    """Grain RandomAccessDataSource over sharded TFRecord files: a global
    index into the concatenation of per-file records."""

    def __init__(self, paths, *, verify_crc: bool = False):
        import glob as _glob

        if isinstance(paths, str):
            paths = sorted(_glob.glob(paths)) or [paths]
        self._files = [IndexedTFRecordFile(p, verify_crc=verify_crc)
                       for p in paths]
        self._offsets = []
        total = 0
        for f in self._files:
            self._offsets.append(total)
            total += len(f)
        self._total = total

    @property
    def files(self):
        """The underlying IndexedTFRecordFiles (for per-file sidecar
        metadata like the video index cache)."""
        return list(self._files)

    def __len__(self) -> int:
        return self._total

    def __getitem__(self, i: int) -> bytes:
        if i < 0:
            i += self._total
        if not 0 <= i < self._total:
            raise IndexError(i)
        import bisect

        fi = bisect.bisect_right(self._offsets, i) - 1
        return self._files[fi][i - self._offsets[fi]]
