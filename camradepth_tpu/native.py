"""ctypes bindings for the native host kernels (native/rasterize.cc).

Compiles the shared library on first use (g++ -O3) into the repo's
``native/`` directory, caching by source mtime. Falls back gracefully —
callers check :func:`available` and use the XLA/numpy paths otherwise.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_SRC = _NATIVE_DIR / "rasterize.cc"
_LIB = _NATIVE_DIR / "librasterize.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.raster_min_depth.argtypes = [
        i64p, f64p, f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f64p, f64p,
    ]
    lib.quantize_pixels.argtypes = [
        f64p, f64p, u8p, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.c_int64, i64p, f64p, f64p,
    ]
    lib.raster_min_depth_batch.argtypes = [
        i64p, f64p, f64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, f64p, f64p, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def raster_min_depth_host(
    pix: np.ndarray,
    depth: np.ndarray,
    payload: Dict[str, np.ndarray],
    num_pixels: int,
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Native scatter-min; same contract as geometry.raster.raster_min_depth
    but host-side (invalid points marked with pix < 0)."""
    lib = _load()
    n = len(depth)
    names = list(payload)
    widths = []
    cols = []
    for k in names:
        v = np.asarray(payload[k], np.float64)
        v = v.reshape(n, -1)
        widths.append(v.shape[1])
        cols.append(v)
    n_channels = int(sum(widths))
    flat = (
        np.ascontiguousarray(np.concatenate(cols, axis=1))
        if n_channels else np.zeros((n, 0))
    )
    pix = np.ascontiguousarray(pix, np.int64)
    depth = np.ascontiguousarray(depth, np.float64)
    out_depth = np.zeros(num_pixels, np.float64)
    out_payload = np.zeros((num_pixels, n_channels), np.float64)
    if lib is None:
        # numpy fallback: stable lexicographic order reproduces semantics
        order = np.lexsort((np.arange(n), depth, pix))
        pid_s = pix[order]
        keep = np.concatenate([[True], pid_s[1:] != pid_s[:-1]])
        keep &= (pid_s >= 0) & (pid_s < num_pixels)
        tgt = pid_s[keep]
        out_depth[tgt] = depth[order][keep]
        if n_channels:
            out_payload[tgt] = flat[order][keep]
    else:
        lib.raster_min_depth(
            _ptr(pix, ctypes.c_int64), _ptr(depth, ctypes.c_double),
            _ptr(flat, ctypes.c_double), n, n_channels, num_pixels,
            _ptr(out_depth, ctypes.c_double),
            _ptr(out_payload, ctypes.c_double),
        )
    out = {}
    off = 0
    for k, w in zip(names, widths):
        chunk = out_payload[:, off: off + w]
        out[k] = chunk[:, 0] if w == 1 else chunk
        off += w
    return out_depth, out


def quantize_pixels_host(x, y, valid, scale: float, h_out: int, w_out: int):
    """Native center-aligned quantization; returns (pix, xq, yq)."""
    lib = _load()
    n = len(x)
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    v = (
        np.ascontiguousarray(valid, np.uint8)
        if valid is not None else None
    )
    if lib is None:
        xq = np.clip((x + 0.5) / scale - 0.5, 0, w_out - 1)
        yq = np.clip((y + 0.5) / scale - 0.5, 0, h_out - 1)
        pix = (np.round(yq).astype(np.int64) * w_out
               + np.round(xq).astype(np.int64))
        if valid is not None:
            pix = np.where(valid, pix, -1)
        return pix, xq, yq
    pix = np.empty(n, np.int64)
    xq = np.empty(n, np.float64)
    yq = np.empty(n, np.float64)
    lib.quantize_pixels(
        _ptr(x, ctypes.c_double), _ptr(y, ctypes.c_double),
        _ptr(v, ctypes.c_uint8) if v is not None else None,
        n, scale, h_out, w_out,
        _ptr(pix, ctypes.c_int64), _ptr(xq, ctypes.c_double),
        _ptr(yq, ctypes.c_double),
    )
    return pix, xq, yq
