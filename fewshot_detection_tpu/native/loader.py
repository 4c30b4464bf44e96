"""ctypes binding + on-demand build for the native image pipeline.

The shared library is compiled from src/imagepipe.cpp on first use (g++,
libjpeg, libpng — all in the base image). When the toolchain or libraries
are missing, `native_available()` is False and callers fall back to the
PIL pipeline. The native path is an opt-in throughput path: interpolation
is a PIL-style triangle filter, within a few uint8 counts of PIL but not
bit-identical (PIL's resize default is bicubic)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src", "imagepipe.cpp")
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libimagepipe.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB, "-ljpeg", "-lpng",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.fsd_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fsd_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fsd_load_augment.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fsd_load_plain.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fsd_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.fsd_augment_raw.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.fsd_load_batch_raw.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeImagePipe:
    """Batch-oriented native loader."""

    def __init__(self, n_threads: int | None = None):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError(f"native pipeline unavailable: {_build_error}")
        self.n_threads = n_threads or max(os.cpu_count() or 1, 1)

    def image_size(self, path: str) -> tuple[int, int]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self.lib.fsd_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"cannot decode {path}")
        return w.value, h.value

    def decode(self, path: str) -> np.ndarray:
        w, h = self.image_size(path)
        buf = np.empty((h, w, 3), np.uint8)
        rc = self.lib.fsd_decode(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size, ctypes.byref(ctypes.c_int()), ctypes.byref(ctypes.c_int()),
        )
        if rc != 0:
            raise IOError(f"cannot decode {path}")
        return buf

    def load_plain(self, path: str, width: int, height: int) -> np.ndarray:
        out = np.empty((height, width, 3), np.float32)
        rc = self.lib.fsd_load_plain(path.encode(), width, height, _fptr(out))
        if rc != 0:
            raise IOError(f"cannot decode {path}")
        return out

    def load_augment(
        self, path: str, width: int, height: int,
        pleft: int, pright: int, ptop: int, pbot: int,
        flip: int, dhue: float, dsat: float, dexp: float,
    ) -> np.ndarray:
        out = np.empty((height, width, 3), np.float32)
        rc = self.lib.fsd_load_augment(
            path.encode(), width, height, pleft, pright, ptop, pbot,
            flip, dhue, dsat, dexp, _fptr(out),
        )
        if rc != 0:
            raise IOError(f"cannot decode {path}")
        return out

    def load_batch(
        self,
        paths: list[str],
        width: int,
        height: int,
        params: np.ndarray | None = None,
    ) -> tuple[np.ndarray, int]:
        """params: (n, 8) float32 [pleft,pright,ptop,pbot,flip,dhue,dsat,
        dexp] or None for plain resize. Returns (batch, n_failed)."""
        n = len(paths)
        out = np.empty((n, height, width, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        if params is None:
            p = np.zeros((n, 8), np.float32)
            augment = 0
        else:
            p = np.ascontiguousarray(params, np.float32)
            augment = 1
        fails = self.lib.fsd_load_batch(
            arr, n, width, height, _fptr(p), augment, _fptr(out),
            self.n_threads,
        )
        return out, int(fails)

    def augment_raw(
        self, rgb: np.ndarray, width: int, height: int,
        pleft: int, pright: int, ptop: int, pbot: int,
        flip: int, dhue: float, dsat: float, dexp: float,
    ) -> np.ndarray:
        """Augment tail on an already decoded (H,W,3) uint8 array — no IO."""
        rgb = np.ascontiguousarray(rgb, np.uint8)
        out = np.empty((height, width, 3), np.float32)
        rc = self.lib.fsd_augment_raw(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rgb.shape[1], rgb.shape[0], width, height,
            pleft, pright, ptop, pbot, flip, dhue, dsat, dexp, 1, _fptr(out),
        )
        if rc != 0:
            raise ValueError("fsd_augment_raw failed")
        return out

    def resize_raw(self, rgb: np.ndarray, width: int, height: int) -> np.ndarray:
        """Plain filtered resize of a decoded (H,W,3) uint8 array."""
        rgb = np.ascontiguousarray(rgb, np.uint8)
        out = np.empty((height, width, 3), np.float32)
        rc = self.lib.fsd_augment_raw(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rgb.shape[1], rgb.shape[0], width, height,
            0, 0, 0, 0, 0, 0.0, 0.0, 0.0, 0, _fptr(out),
        )
        if rc != 0:
            raise ValueError("fsd_augment_raw failed")
        return out

    def load_batch_raw(
        self,
        bufs: list[np.ndarray],
        width: int,
        height: int,
        params: np.ndarray | None = None,
    ) -> tuple[np.ndarray, int]:
        """Batch augment over decoded (H,W,3) uint8 arrays (RAM cache hits).
        Same params layout/return as load_batch."""
        n = len(bufs)
        bufs = [np.ascontiguousarray(b, np.uint8) for b in bufs]
        out = np.empty((n, height, width, 3), np.float32)
        ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
            *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
        )
        whs = np.empty((n, 2), np.int32)
        for i, b in enumerate(bufs):
            whs[i, 0] = b.shape[1]
            whs[i, 1] = b.shape[0]
        if params is None:
            p = np.zeros((n, 8), np.float32)
            augment = 0
        else:
            p = np.ascontiguousarray(params, np.float32)
            augment = 1
        fails = self.lib.fsd_load_batch_raw(
            ptrs, whs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
            width, height, _fptr(p), augment, _fptr(out), self.n_threads,
        )
        return out, int(fails)
