"""Native (C++) runtime components, bound via ctypes.

The reference ships its runtime bookkeeping as C++ inside the NPU torch
plugin; the TPU-native equivalent here is a small shared library built
on first import with the system toolchain (no pybind11 in the image —
plain C ABI + ctypes).  Everything has a pure-numpy fallback so the
framework works on machines without a compiler: set
``MOJO_NATIVE=0`` to force the fallback, ``MOJO_NATIVE=1`` to require
the native path (raises if the build fails).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

from mojo_opset_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_SRC = Path(__file__).with_name("block_allocator.cpp")
_LIB_DIR = Path(__file__).parent / "_build"
_LOCK = threading.Lock()
_lib = None
_lib_tried = False


def _build_library() -> Path | None:
    """Compile block_allocator.cpp → _build/libmojo_native.so (cached)."""
    tag = f"cp{sys.version_info.major}{sys.version_info.minor}"
    out = _LIB_DIR / f"libmojo_native_{tag}.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    _LIB_DIR.mkdir(exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"), "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as exc:  # missing toolchain, sandbox, ...
        logger.debug("native build failed (%s); using numpy fallback", exc)
        return None
    return out


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    with _LOCK:
        if _lib_tried:
            return _lib
        _lib_tried = True
        path = _build_library()
        if path is None:
            if os.environ.get("MOJO_NATIVE", "") == "1":
                raise RuntimeError("MOJO_NATIVE=1 but native build failed")
            return None
        lib = ctypes.CDLL(str(path))
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.mojo_alloc_create.restype = ctypes.c_void_p
        lib.mojo_alloc_create.argtypes = [ctypes.c_int32] * 4
        lib.mojo_alloc_destroy.argtypes = [ctypes.c_void_p]
        lib.mojo_alloc_free_count.restype = ctypes.c_int32
        lib.mojo_alloc_free_count.argtypes = [ctypes.c_void_p]
        lib.mojo_alloc_reserve.restype = ctypes.c_int32
        lib.mojo_alloc_reserve.argtypes = [ctypes.c_void_p, i32p, i32p, i32p, i32p]
        lib.mojo_alloc_release.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p, i32p]
        lib.mojo_alloc_reset.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p, i32p]
        _lib = lib
        return _lib


def native_available() -> bool:
    if os.environ.get("MOJO_NATIVE", "") == "0":
        return False
    return _load() is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeBlockAllocator:
    """ctypes handle over the C++ allocator; caller owns the numpy tables.

    Same hand-out order as the numpy fallback in
    :class:`~mojo_opset_tpu.runtime.session.PagedAttentionRuntimeState`
    (tail slice of the free list, ascending), so switching implementations
    produces bit-identical block tables.
    """

    def __init__(self, batch: int, max_blocks_per_seq: int, total_blocks: int,
                 block_size: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native allocator unavailable")
        self._lib = lib
        self._h = lib.mojo_alloc_create(batch, max_blocks_per_seq, total_blocks, block_size)
        if not self._h:
            raise ValueError("bad allocator geometry")
        self.total_blocks = total_blocks

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mojo_alloc_destroy(h)
            self._h = None

    @property
    def num_free_blocks(self) -> int:
        return int(self._lib.mojo_alloc_free_count(self._h))

    def reserve(self, q_lens: np.ndarray, seq_lens: np.ndarray,
                block_tables: np.ndarray) -> np.ndarray:
        """Transactional batched reserve; returns pre-reserve context lens."""
        q = np.ascontiguousarray(q_lens, np.int32)
        ctx = np.empty_like(seq_lens)
        rc = self._lib.mojo_alloc_reserve(self._h, _ptr(q), _ptr(seq_lens),
                                          _ptr(block_tables), _ptr(ctx))
        if rc == -1:
            raise ValueError("PagedAttentionRuntimeState: Out of paged KV cache memory.")
        if rc == -2:
            raise ValueError("sequence exceeds max_blocks_per_seq")
        return ctx

    def release(self, batch_idx: int, seq_lens: np.ndarray, block_tables: np.ndarray):
        self._lib.mojo_alloc_release(self._h, batch_idx, _ptr(seq_lens), _ptr(block_tables))

    def reset(self, seq_lens: np.ndarray, block_tables: np.ndarray):
        self._lib.mojo_alloc_reset(self._h, self.total_blocks, _ptr(seq_lens), _ptr(block_tables))
