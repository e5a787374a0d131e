"""COCO mask operations: ctypes bridge to the native C++ implementation.

Replaces the pycocotools ``_mask`` C extension (reference
data_kits/coco.py:261 uses ``coco.annToMask``); the native library
(native/coco_mask.cpp) implements the official COCO RLE / polygon
semantics. Compiled on demand with g++ into ``native/build/``; pure-numpy
fallbacks cover environments without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    src = _NATIVE_DIR / "coco_mask.cpp"
    build = _NATIVE_DIR / "build"
    build.mkdir(exist_ok=True)
    so = build / "libcoco_mask.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)]
        subprocess.run(cmd, check=True, capture_output=True)
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


def _polys_to_mask_np(polys: List[np.ndarray], h: int, w: int) -> np.ndarray:
    """Scanline even-odd fallback (may differ from COCO on boundary px)."""
    mask = np.zeros((h, w), np.uint8)
    yy = np.arange(h) + 0.5
    for poly in polys:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        x0, y0 = pts[:, 0], pts[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        for yi, yc in enumerate(yy):
            cross = ((y0 <= yc) & (y1 > yc)) | ((y1 <= yc) & (y0 > yc))
            if not cross.any():
                continue
            t = (yc - y0[cross]) / (y1[cross] - y0[cross])
            xs = np.sort(x0[cross] + t * (x1[cross] - x0[cross]))
            for a, b in zip(xs[0::2], xs[1::2]):
                lo = max(0, int(np.ceil(a - 0.5)))
                hi = min(w, int(np.floor(b - 0.5)) + 1)
                if hi > lo:
                    mask[yi, lo:hi] = 1
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
