"""ctypes bindings for the native I/O runtime (built on demand).

Compiles hmrt_native.cpp with g++ on first use (cached as _hmrt_native.so
next to the source); every consumer has a pure-Python fallback, so a
missing toolchain only costs speed, never functionality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "hmrt_native.cpp")
_SO = os.path.join(_DIR, "_hmrt_native.so")

_lib = None
_tried = False


def get_lib():
    """The loaded native library, or None if unavailable.

    HMRT_NO_NATIVE=1 disables it (pure-Python fallbacks take over) —
    a debugging lever to rule the native tier in/out of a failure.
    """
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("HMRT_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            # -ffp-contract=off: no FMA contraction — terrain_fbm must
            # round every multiply/add exactly like numpy to stay
            # bit-identical to the Python spec. Parallelism is plain
            # std::thread (-pthread), NOT OpenMP: libgomp in the JAX
            # process crashed XLA's LLVM compile threads.
            cmd = ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                   "-pthread", "-o", _SO, _SRC, "-lz"]
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int]
        lib.zlib_inflate.restype = ctypes.c_int64
        lib.zlib_inflate.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64]
        lib.rawmap_open.restype = ctypes.c_void_p
        lib.rawmap_open.argtypes = [ctypes.c_char_p]
        lib.rawmap_side.restype = ctypes.c_int64
        lib.rawmap_side.argtypes = [ctypes.c_void_p]
        lib.rawmap_tile.restype = ctypes.c_int
        lib.rawmap_tile.argtypes = [ctypes.c_void_p] + [ctypes.c_int64] * 4 \
            + [ctypes.c_void_p]
        lib.rawmap_close.argtypes = [ctypes.c_void_p]
        lib.build_pyramid_host.restype = ctypes.c_int64
        lib.build_pyramid_host.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                           ctypes.c_void_p, ctypes.c_float]
        lib.terrain_fbm.restype = ctypes.c_int
        lib.terrain_fbm.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def terrain_fbm(n: int, grids: list, cells: list, amps: list,
                ridged: bool):
    """Native fBm octave accumulation (bit-identical to the numpy path in
    io/heightmap.py, OpenMP over rows); None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    flat = np.concatenate([np.ascontiguousarray(g, np.float32).ravel()
                           for g in grids])
    sizes = np.array([g.size for g in grids], np.int64)
    offs = np.zeros(len(grids), np.int64)
    offs[1:] = np.cumsum(sizes[:-1])
    cells_arr = np.asarray(cells, np.int64)
    amps_arr = np.asarray(amps, np.float64)
    out = np.empty((n, n), np.float32)
    lib.terrain_fbm(flat.ctypes.data, offs.ctypes.data,
                    cells_arr.ctypes.data, amps_arr.ctypes.data,
                    len(grids), n, int(bool(ridged)), out.ctypes.data)
    return out


def png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int):
    """Native scanline unfilter; returns None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty(h * stride, np.uint8)
    rc = lib.png_unfilter(raw.ctypes.data, out.ctypes.data, h, stride, bpp)
    if rc != 0:
        raise ValueError("bad PNG filter byte")
    return out.reshape(h, stride)


class RawTileMap:
    """mmap'd square raw-f32 heightmap with edge-clamped tile extraction
    (SURVEY.md C5: 8192^2-class maps streamed without full materialization).
    Falls back to numpy memmap when the native lib is unavailable."""

    def __init__(self, path: str):
        self._lib = get_lib()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.rawmap_open(path.encode())
        if self._h:
            self.side = int(self._lib.rawmap_side(self._h))
        else:
            self._mm = np.memmap(path, dtype=np.float32, mode="r")
            n = int(round(len(self._mm) ** 0.5))
            if n * n != len(self._mm):
                raise ValueError(f"{path}: raw f32 file is not square")
            self._mm = self._mm.reshape(n, n)
            self.side = n

    def tile(self, y0: int, x0: int, th: int, tw: int) -> np.ndarray:
        if self._h:
            out = np.empty((th, tw), np.float32)
            self._lib.rawmap_tile(self._h, y0, x0, th, tw, out.ctypes.data)
            return out
        ys = np.clip(np.arange(y0, y0 + th), 0, self.side - 1)
        xs = np.clip(np.arange(x0, x0 + tw), 0, self.side - 1)
        return np.asarray(self._mm[np.ix_(ys, xs)], np.float32)

    def close(self):
        if self._h:
            self._lib.rawmap_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def build_pyramid_host(heights: np.ndarray, neg_inf: float) -> np.ndarray:
    """Host-side flat max pyramid (same layout as core/pyramid.py), or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(heights, np.float32)
    n = h.shape[0]
    nc = n - 1
    m = 1
    while m < nc:
        m <<= 1
    total = (4 * m * m - 1) // 3
    out = np.empty(total, np.float32)
    lib.build_pyramid_host(h.ctypes.data, n, out.ctypes.data,
                           np.float32(neg_inf))
    return out
