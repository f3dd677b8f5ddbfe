"""ctypes wrapper for the native prefetching dataset loader
(native/dataloader.cpp).  Falls back to the pure-Python loaders in
io/datasets.py when the shared library has not been built."""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional

import numpy as np

from .datasets import SequenceItem

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libtpuslam_dataloader.so")
_lib = None


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.dl_open.restype = ctypes.c_void_p
        _lib.dl_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ]
        _lib.dl_count.restype = ctypes.c_int
        _lib.dl_count.argtypes = [ctypes.c_void_p]
        _lib.dl_next.restype = ctypes.c_int
        _lib.dl_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib.dl_close.argtypes = [ctypes.c_void_p]
    return _lib


class NativeSequence:
    """Iterates decoded frames produced by the C++ worker pool, in order."""

    def __init__(
        self,
        folder: str,
        rgb_list: str = "rgb.txt",
        depth_list: str = "",
        depth_factor: float = 5000.0,
        n_threads: int = 4,
        prefetch: int = 8,
        max_hw=(480, 640),
        max_frames: int = 0,
    ):
        lib = _load()
        self._lib = lib
        self._h = lib.dl_open(
            folder.encode(), rgb_list.encode(), depth_list.encode(),
            depth_factor, n_threads, prefetch,
        )
        if not self._h:
            raise FileNotFoundError(f"{folder}/{rgb_list}")
        self.count = lib.dl_count(self._h)
        if max_frames > 0:
            self.count = min(self.count, max_frames)
        self._max_hw = max_hw
        self._with_depth = bool(depth_list)

    def __len__(self):
        return self.count

    def __iter__(self) -> Iterator[SequenceItem]:
        H, W = self._max_hw
        gray = np.empty(H * W, np.float32)
        depth = np.empty(H * W, np.float32) if self._with_depth else None
        hw = (ctypes.c_int * 2)()
        stamp = ctypes.c_double()
        emitted = 0
        while emitted < self.count:
            idx = self._lib.dl_next(
                self._h,
                gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if depth is not None
                else None,
                hw,
                ctypes.byref(stamp),
            )
            if idx < 0:
                break
            h, w = hw[0], hw[1]
            g = gray[: h * w].reshape(h, w).copy()
            d = depth[: h * w].reshape(h, w).copy() if depth is not None else None
            emitted += 1
            yield SequenceItem(idx, stamp.value, g, d)

    def close(self):
        if self._h:
            self._lib.dl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
