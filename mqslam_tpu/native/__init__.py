"""Native (C++) runtime components, built on demand and bound via ctypes.

Mirrors the reference's compile-on-import convention for its native kernels
(reference: Work/python_libs/triangulation_c/__init__.py:3-11 scipy.weave
build; Work/python_libs/convert_c_to_ext_lib.py) — here a plain g++ shared
library with a ctypes binding and graceful fallback (callers use
``available()``; the PIL path in mqslam_tpu.io.images remains the default
when the toolchain or libraries are missing).
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

__all__ = ["available", "decode_gray", "ImageSequence", "build"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imageio.cpp")
_SO = os.path.join(_DIR, "libmqslam_io.so")
_lib = None
_load_error = None


def build(verbose=False):
    """Compile the shared library (g++ -O3, links libpng/libjpeg)."""
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-lpng", "-ljpeg", "-lpthread"]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if verbose:
        print(f"built {_SO}", file=sys.stderr)
    return _SO


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            build()
        lib = ctypes.CDLL(_SO)
        lib.mq_decode_gray.restype = ctypes.c_int
        lib.mq_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mq_seq_open.restype = ctypes.c_void_p
        lib.mq_seq_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.mq_seq_next.restype = ctypes.c_int
        lib.mq_seq_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mq_seq_close.restype = None
        lib.mq_seq_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain/libs missing: fall back to PIL
        _load_error = e
    return _lib


def available():
    return _load() is not None


def decode_gray(path, max_h=4096, max_w=4096):
    """Decode one PNG/JPEG to [H, W] float32 grayscale (0..255)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native imageio unavailable: {_load_error}")
    buf = np.empty(max_h * max_w, dtype=np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.mq_decode_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h * max_w, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"decode failed ({rc}) for {path}")
    return buf[:h.value * w.value].reshape(h.value, w.value).copy()


class ImageSequence:
    """Prefetching iterator over an image sequence (decode off-thread)."""

    def __init__(self, paths, queue_depth=4, max_h=2160, max_w=4096):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native imageio unavailable: {_load_error}")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._max_h, self._max_w = max_h, max_w
        self._handle = lib.mq_seq_open(arr, len(self._paths), queue_depth,
                                       max_h, max_w)
        self._buf = np.empty(max_h * max_w, dtype=np.float32)

    def __iter__(self):
        return self

    def __next__(self):
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.mq_seq_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(h), ctypes.byref(w))
        if rc == 1:
            raise StopIteration
        if rc != 0:
            raise IOError(f"sequence decode failed ({rc})")
        return self._buf[:h.value * w.value].reshape(
            h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.mq_seq_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
