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


def _build(out: Optional[Path] = None) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(out or _LIB), str(_SRC)],
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
        _bind(lib)
    except (OSError, AttributeError):
        # AttributeError = a loadable but STALE .so missing newer symbols
        # (git does not preserve mtimes, so the mtime check can pass on a
        # pre-built library from an older source). Rebuild once from the
        # current source; fall back to the numpy paths if that fails too.
        # Rebuild under a UNIQUE path: dlopen caches mappings by
        # pathname, so an in-place rebuild hands back the stale mapping
        # no matter what is on disk (verified).
        import os

        alt = _LIB.with_name(f".librasterize-rebuild-{os.getpid()}.so")
        if not _build(out=alt):
            return None
        try:
            lib = ctypes.CDLL(str(alt))
            _bind(lib)
        except (OSError, AttributeError):
            return None
        finally:
            # refresh the canonical path for future processes; the
            # loaded mapping keeps the inode alive either way
            try:
                os.replace(alt, _LIB)
            except OSError:
                alt.unlink(missing_ok=True)
    _lib = lib
    return _lib


def _bind(lib: ctypes.CDLL) -> None:
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
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.assemble_normalize_u8.argtypes = [
        u8p, ctypes.c_int64, f32p, f32p, f32p, ctypes.c_int64,
    ]
    lib.assemble_scale_clip_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p, ctypes.c_int64,
    ]
    lib.assemble_scale_clip_f64.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, f32p, ctypes.c_int64,
    ]
    lib.encode_inverse_depth_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, f32p,
    ]
    lib.encode_inverse_depth_f64.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_double, f32p,
    ]
    lib.gather_rows_cols_i64_to_i32.argtypes = [
        i64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
        ctypes.c_int64, i32p,
    ]
    lib.gather_rows_cols_i32_to_i32.argtypes = [
        i32p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
        ctypes.c_int64, i32p,
    ]
    lib.wire_union_nonzero_f32.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p, ctypes.c_int64,
        f32p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64,
    ]
    lib.wire_union_nonzero_f32.restype = ctypes.c_int64
    lib.wire_union_nonzero_f64.argtypes = [
        f64p, ctypes.c_int64, f64p, ctypes.c_int64, f64p, ctypes.c_int64,
        f64p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64,
    ]
    lib.wire_union_nonzero_f64.restype = ctypes.c_int64
    lib.wire_gather_f32.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, f32p,
        ctypes.c_int64,
    ]
    lib.wire_gather_f64.argtypes = [
        f64p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, f32p,
        ctypes.c_int64,
    ]
    lib.wire_gt_sparse_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, i32p, f32p,
        ctypes.c_int64,
    ]
    lib.wire_gt_sparse_f32.restype = ctypes.c_int64
    lib.wire_gt_sparse_f64.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, i32p, f32p,
        ctypes.c_int64,
    ]
    lib.wire_gt_sparse_f64.restype = ctypes.c_int64
    lib.gather_rows_cols_i64_to_u8.argtypes = [
        i64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
        ctypes.c_int64, u8p,
    ]
    lib.gather_rows_cols_i64_to_u8.restype = ctypes.c_int
    lib.gather_rows_cols_i32_to_u8.argtypes = [
        i32p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
        ctypes.c_int64, u8p,
    ]
    lib.gather_rows_cols_i32_to_u8.restype = ctypes.c_int


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


# ---------------------------------------------------------------------------
# Frame-assembly kernels (native/rasterize.cc, frame-assembly section).
#
# One pass per channel group, written straight into the caller's
# preallocated interleaved [npix, C] float32 feature buffer. ctypes
# releases the GIL for the call's duration, so the BatchLoader's worker
# threads scale across cores — numpy's ufuncs hold the GIL and serialize
# them (measured: the numpy assemble is ~33 ms/frame and caps the loader
# at ~11 fps/core; see data/channels.py). Bit-exact vs the numpy path,
# pinned by tests/test_native.py.


def normalize_image_into(img_u8: np.ndarray, mean: np.ndarray,
                         std: np.ndarray, out2d: np.ndarray,
                         col: int) -> None:
    """(u8/255 - mean)/std into out2d[:, col:col+3]; img_u8 [npix, 3] C-order."""
    lib = _load()
    npix, stride = out2d.shape
    lib.assemble_normalize_u8(
        _ptr(img_u8, ctypes.c_uint8), npix,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        _ptr(out2d[:, col:], ctypes.c_float), stride,
    )


def scale_clip_into(src2d: np.ndarray, ch0: int, n_ch: int,
                    out2d: np.ndarray, col: int, use_clip: bool,
                    lo: float, hi: float, div: float) -> None:
    """out2d[:, col:col+n_ch] = clip?(src2d[:, ch0:ch0+n_ch], lo, hi) / div.

    src2d must be C-contiguous [npix, in_ch] float32 or float64; the
    computation runs in the INPUT precision and casts at the store,
    matching numpy's `np.clip(x, lo, hi) / div` then `.astype(float32)`.
    """
    lib = _load()
    npix, stride = out2d.shape
    in_stride = src2d.shape[1]
    out = _ptr(out2d[:, col:], ctypes.c_float)
    if src2d.dtype == np.float32:
        lib.assemble_scale_clip_f32(
            _ptr(src2d, ctypes.c_float), npix, in_stride, ch0, n_ch,
            int(use_clip), lo, hi, div, out, stride,
        )
    elif src2d.dtype == np.float64:
        lib.assemble_scale_clip_f64(
            _ptr(src2d, ctypes.c_double), npix, in_stride, ch0, n_ch,
            int(use_clip), lo, hi, div, out, stride,
        )
    else:  # pragma: no cover - callers pre-check dtypes
        raise TypeError(f"unsupported dtype {src2d.dtype}")


def encode_inverse_depth_native(depth: np.ndarray,
                                max_depth: float) -> np.ndarray:
    """Native channels.encode_inverse_depth; depth [H, W] f32/f64 C-order."""
    lib = _load()
    out = np.empty(depth.shape, np.float32)
    n = depth.size
    if depth.dtype == np.float32:
        lib.encode_inverse_depth_f32(
            _ptr(depth, ctypes.c_float), n, max_depth,
            _ptr(out, ctypes.c_float),
        )
    elif depth.dtype == np.float64:
        lib.encode_inverse_depth_f64(
            _ptr(depth, ctypes.c_double), n, max_depth,
            _ptr(out, ctypes.c_float),
        )
    else:  # pragma: no cover - callers pre-check dtypes
        raise TypeError(f"unsupported dtype {depth.dtype}")
    return out


# ---------------------------------------------------------------------------
# Wire-encode kernels (data/wire.py encode_frame_wire fast path). Fused
# GIL-free passes replacing ~20 ms/frame of numpy (union mask, GT encode +
# sparsify, seg resize); bit-exact, pinned by tests/test_native.py.


def wire_union_nonzero(sources, npix: int, out_idx: np.ndarray) -> int:
    """Ascending indices of pixels where ANY strided source is nonzero.

    ``sources``: list of (base_array_1d, element_stride) — all the same
    float dtype. Writes at most len(out_idx) indices (zero-padded
    leftovers stay 0); returns the TRUE count (overflow = count > cap).
    """
    lib = _load()
    if len(sources) > 4:  # pragma: no cover - wire has at most 4 channels
        raise ValueError("at most 4 union sources")
    dt = sources[0][0].dtype
    ct = ctypes.c_float if dt == np.float32 else ctypes.c_double
    fn = (lib.wire_union_nonzero_f32 if dt == np.float32
          else lib.wire_union_nonzero_f64)
    args = []
    for base, stride in sources:
        args += [_ptr(base, ct), stride]
    while len(args) < 8:
        args += [None, 0]
    return int(fn(*args, npix, _ptr(out_idx, ctypes.c_int32),
                  len(out_idx)))


def wire_gather(base: np.ndarray, stride: int, idx: np.ndarray, n: int,
                use_clip: bool, lo: float, hi: float, div: float,
                out: np.ndarray, out_offset: int, out_stride: int) -> None:
    """out.flat[out_offset::out_stride][:n] = clip?(base[idx*stride])/div,
    computed in the source dtype, f32 at the store (numpy op order)."""
    lib = _load()
    assert out.dtype == np.float32 and out.flags.c_contiguous
    optr = ctypes.cast(out.ctypes.data + out_offset * 4,
                       ctypes.POINTER(ctypes.c_float))
    if base.dtype == np.float32:
        lib.wire_gather_f32(
            _ptr(base, ctypes.c_float), stride,
            _ptr(idx, ctypes.c_int32), n, int(use_clip), lo, hi, div,
            optr, out_stride,
        )
    else:
        lib.wire_gather_f64(
            _ptr(base, ctypes.c_double), stride,
            _ptr(idx, ctypes.c_int32), n, int(use_clip), lo, hi, div,
            optr, out_stride,
        )


def wire_gt_sparse(depth: np.ndarray, stride: int, npix: int,
                   max_depth: float, out_idx: np.ndarray,
                   out_val: np.ndarray) -> int:
    """Fused encode_inverse_depth + sparsify over a strided f32/f64 depth
    view; returns the true point count (overflow = count > cap)."""
    lib = _load()
    if depth.dtype == np.float32:
        return int(lib.wire_gt_sparse_f32(
            _ptr(depth, ctypes.c_float), stride, npix, max_depth,
            _ptr(out_idx, ctypes.c_int32), _ptr(out_val, ctypes.c_float),
            len(out_idx),
        ))
    return int(lib.wire_gt_sparse_f64(
        _ptr(depth, ctypes.c_double), stride, npix, max_depth,
        _ptr(out_idx, ctypes.c_int32), _ptr(out_val, ctypes.c_float),
        len(out_idx),
    ))


def gather_resize_u8(img: np.ndarray, ri: np.ndarray,
                     ci: np.ndarray) -> Optional[np.ndarray]:
    """img[np.ix_(ri, ci)].astype(uint8) for int label maps; None when a
    value falls outside [0, 255] (caller raises the descriptive error)."""
    lib = _load()
    h_out, w_out = len(ri), len(ci)
    out = np.empty((h_out, w_out), np.uint8)
    ri = np.ascontiguousarray(ri, np.int64)
    ci = np.ascontiguousarray(ci, np.int64)
    w_in = img.shape[1]
    if img.dtype == np.int64:
        rc = lib.gather_rows_cols_i64_to_u8(
            _ptr(img, ctypes.c_int64), w_in, _ptr(ri, ctypes.c_int64),
            _ptr(ci, ctypes.c_int64), h_out, w_out,
            _ptr(out, ctypes.c_uint8),
        )
    elif img.dtype == np.int32:
        rc = lib.gather_rows_cols_i32_to_u8(
            _ptr(img, ctypes.c_int32), w_in, _ptr(ri, ctypes.c_int64),
            _ptr(ci, ctypes.c_int64), h_out, w_out,
            _ptr(out, ctypes.c_uint8),
        )
    else:  # pragma: no cover - callers pre-check dtypes
        raise TypeError(f"unsupported dtype {img.dtype}")
    return None if rc else out


def gather_resize_i32(img: np.ndarray, ri: np.ndarray,
                      ci: np.ndarray) -> np.ndarray:
    """img[np.ix_(ri, ci)].astype(int32) for int32/int64 label maps."""
    lib = _load()
    h_out, w_out = len(ri), len(ci)
    out = np.empty((h_out, w_out), np.int32)
    ri = np.ascontiguousarray(ri, np.int64)
    ci = np.ascontiguousarray(ci, np.int64)
    w_in = img.shape[1]
    if img.dtype == np.int64:
        lib.gather_rows_cols_i64_to_i32(
            _ptr(img, ctypes.c_int64), w_in, _ptr(ri, ctypes.c_int64),
            _ptr(ci, ctypes.c_int64), h_out, w_out,
            _ptr(out, ctypes.c_int32),
        )
    elif img.dtype == np.int32:
        lib.gather_rows_cols_i32_to_i32(
            _ptr(img, ctypes.c_int32), w_in, _ptr(ri, ctypes.c_int64),
            _ptr(ci, ctypes.c_int64), h_out, w_out,
            _ptr(out, ctypes.c_int32),
        )
    else:  # pragma: no cover - callers pre-check dtypes
        raise TypeError(f"unsupported dtype {img.dtype}")
    return out
