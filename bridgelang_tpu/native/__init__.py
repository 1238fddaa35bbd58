"""ctypes bindings for the native (C++) runtime library.

First-party native components (the reference has none — SURVEY.md notes all
its native performance is third-party): TFRecord framing with CRC32C
verification (dataset inspection/sharding without TensorFlow) and the action
bin/debin codec. Builds on demand with `make` (g++); all callers degrade
gracefully if the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libbridgelang_native.so"
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Path:
    if force or not _SO.exists():
        subprocess.run(["make", "-C", str(_DIR)], check=True, capture_output=True)
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build()
        lib = ctypes.CDLL(str(_SO))
        lib.blx_crc32c.restype = ctypes.c_uint32
        lib.blx_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.blx_reader_open.restype = ctypes.c_void_p
        lib.blx_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.blx_reader_next.restype = ctypes.c_int
        lib.blx_reader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.blx_reader_close.argtypes = [ctypes.c_void_p]
        lib.blx_count_records.restype = ctypes.c_int64
        lib.blx_count_records.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.blx_writer_open.restype = ctypes.c_void_p
        lib.blx_writer_open.argtypes = [ctypes.c_char_p]
        lib.blx_writer_write.restype = ctypes.c_int
        lib.blx_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
        lib.blx_writer_close.argtypes = [ctypes.c_void_p]
        lib.blx_actions_to_tokens.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.blx_tokens_to_actions.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def crc32c(data: bytes) -> int:
    return _load().blx_crc32c(data, len(data))


class TFRecordWriter:
    def __init__(self, path: str):
        self._lib = _load()
        self._h = self._lib.blx_writer_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write(self, record: bytes) -> None:
        if self._lib.blx_writer_write(self._h, record, len(record)) != 0:
            raise OSError("write failed")

    def close(self) -> None:
        if self._h:
            self._lib.blx_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_tfrecords(path: str, check_crc: bool = True) -> Iterator[bytes]:
    lib = _load()
    h = lib.blx_reader_open(str(path).encode(), 1 if check_crc else 0)
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        length = ctypes.c_int64()
        while True:
            status = lib.blx_reader_next(h, ctypes.byref(ptr), ctypes.byref(length))
            if status == 0:
                return
            if status < 0:
                raise OSError(f"corrupt TFRecord in {path}")
            yield ctypes.string_at(ptr, length.value)
    finally:
        lib.blx_reader_close(h)


def count_records(path: str, check_crc: bool = True) -> int:
    n = _load().blx_count_records(str(path).encode(), 1 if check_crc else 0)
    if n < 0:
        raise OSError(f"corrupt TFRecord in {path}")
    return int(n)


def actions_to_tokens(actions: np.ndarray, n_bins: int = 256, vocab_size: int = 32000) -> np.ndarray:
    a = np.ascontiguousarray(actions, dtype=np.float32)
    out = np.empty(a.shape, dtype=np.int32)
    _load().blx_actions_to_tokens(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size, n_bins, vocab_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def tokens_to_actions(tokens: np.ndarray, n_bins: int = 256, vocab_size: int = 32000) -> np.ndarray:
    t = np.ascontiguousarray(tokens, dtype=np.int32)
    out = np.empty(t.shape, dtype=np.float32)
    _load().blx_tokens_to_actions(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t.size, n_bins, vocab_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
