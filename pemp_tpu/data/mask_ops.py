"""COCO mask operations: ctypes bridge to the native C++ implementation.

Replaces the pycocotools ``_mask`` C extension (reference
data_kits/coco.py:261 uses ``coco.annToMask``); the native library
(native/coco_mask.cpp) implements the official COCO RLE / polygon
semantics. Compiled on demand with g++ into ``native/build/``; pure-numpy
fallbacks cover environments without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False
_LIB_LOCK = threading.Lock()    # loader worker threads race the first build


def _build_lib() -> Optional[ctypes.CDLL]:
    src = _NATIVE_DIR / "coco_mask.cpp"
    build = _NATIVE_DIR / "build"
    build.mkdir(exist_ok=True)
    so = build / "libcoco_mask.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        # compile to a temp path + atomic rename: an interrupted in-place
        # build would leave a corrupt .so with a fresh mtime that the
        # staleness check above would trust forever
        tmp = build / f"libcoco_mask.{os.getpid()}.tmp.so"
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(src)]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(str(so))
    lib.rle_from_string.restype = ctypes.c_int
    lib.rle_from_string.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.polys_to_mask.restype = ctypes.c_int
    lib.polys_to_mask.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    with _LIB_LOCK:     # first call comes from concurrent loader workers
        if not _LIB_TRIED:
            _LIB_TRIED = True
            try:
                _LIB = _build_lib()
            except Exception:
                _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# numpy fallbacks (same semantics, slower)
# ---------------------------------------------------------------------------

def _rle_from_string_np(s: bytes) -> np.ndarray:
    counts: List[int] = []
    p, n = 0, len(s)
    while p < n:
        x, k, more = 0, 0, 1
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = c & 0x20
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def _rle_decode_np(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in counts:
        run = int(run)
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val = 1 - val
    return flat.reshape(w, h).T     # column-major -> [h, w]


def _rle_from_poly_np(xy: np.ndarray, h: int, w: int) -> np.ndarray:
    """Exact official polygon rasterization (the 5x-upsampled boundary
    walk), bit-matching the native implementation: vertices scaled 5x and
    rounded, a dense integer walk along every edge in its original
    direction, column transitions downsampled to pixel-grid crossings,
    sort + parity -> alternating column-major run lengths."""
    import math

    k = len(xy) // 2
    scale = 5.0
    x = [int(scale * xy[2 * j] + 0.5) for j in range(k)]
    y = [int(scale * xy[2 * j + 1] + 0.5) for j in range(k)]
    x.append(x[0])
    y.append(y[0])

    u: List[int] = []
    v: List[int] = []
    for j in range(k):
        xs, xe, ys, ye = x[j], x[j + 1], y[j], y[j + 1]
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe = xe, xs
            ys, ye = ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx else 0.0
            for d in range(dx + 1):
                t = dx - d if flip else d
                u.append(t + xs)
                v.append(int(ys + s * t + 0.5))
        else:
            s = (xe - xs) / dy if dy else 0.0
            for d in range(dy + 1):
                t = dy - d if flip else d
                v.append(t + ys)
                u.append(int(xs + s * t + 0.5))

    pos: List[int] = []
    for j in range(1, len(u)):
        if u[j] == u[j - 1]:
            continue
        xd = float(u[j] if u[j] < u[j - 1] else u[j] - 1)
        xd = (xd + 0.5) / scale - 0.5
        if math.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(v[j] if v[j] < v[j - 1] else v[j - 1])
        yd = (yd + 0.5) / scale - 0.5
        yd = min(max(yd, 0.0), float(h))
        pos.append(int(xd) * h + int(math.ceil(yd)))

    a = sorted(pos)
    a.append(h * w)
    deltas = []
    p = 0
    for t in a:
        deltas.append(t - p)
        p = t
    b = [deltas[0]]
    j = 1
    while j < len(deltas):
        if deltas[j] > 0:
            b.append(deltas[j])
            j += 1
        else:
            j += 1
            if j < len(deltas):
                b[-1] += deltas[j]
                j += 1
    return np.asarray(b, np.uint32)


def _polys_to_mask_np(polys: List[np.ndarray], h: int, w: int) -> np.ndarray:
    """Fallback: union of exact per-ring rasterizations (bit-matches the
    native path; validated in tests/test_coco_rasterizer_golden.py)."""
    mask = np.zeros((h, w), np.uint8)
    for poly in polys:
        mask |= _rle_decode_np(
            _rle_from_poly_np(np.asarray(poly, np.float64).ravel(), h, w),
            h, w)
    return mask


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def decode_rle(rle: dict) -> np.ndarray:
    """Decode a COCO RLE dict {'size': [h, w], 'counts': str|list}."""
    h, w = rle["size"]
    counts = rle["counts"]
    lib = get_lib()
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, bytes):
        if lib is not None:
            buf = (ctypes.c_uint32 * (len(counts) + 1))()
            n = lib.rle_from_string(counts, buf, len(counts) + 1)
            counts = np.ctypeslib.as_array(buf)[:n].copy()
        else:
            counts = _rle_from_string_np(counts)
    counts = np.asarray(counts, np.uint32)
    if lib is not None:
        out = np.zeros((h, w), np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    return _rle_decode_np(counts, h, w)


def polys_to_mask(polys: List, h: int, w: int) -> np.ndarray:
    """Rasterize a segmentation (list of flat polygon coord lists)."""
    polys = [np.asarray(p, np.float64).ravel() for p in polys
             if len(p) >= 6]
    if not polys:
        return np.zeros((h, w), np.uint8)
    lib = get_lib()
    if lib is not None:
        xy = np.concatenate(polys)
        sizes = np.asarray([len(p) for p in polys], np.int32)
        out = np.zeros((h, w), np.uint8)
        ret = lib.polys_to_mask(
            xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(polys), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ret == 0:
            return out
    return _polys_to_mask_np(polys, h, w)


def ann_to_mask(ann: dict, h: int, w: int) -> np.ndarray:
    """pycocotools ``annToMask`` equivalent: segmentation -> [h, w] uint8."""
    seg = ann.get("segmentation")
    if isinstance(seg, list):
        return polys_to_mask(seg, h, w)
    if isinstance(seg, dict):
        return decode_rle(seg)
    return np.zeros((h, w), np.uint8)
