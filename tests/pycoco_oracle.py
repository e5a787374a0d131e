"""Pure-Python oracle of the official COCO polygon rasterization
(pycocotools maskApi.c ``rleFrPoly`` / ``rleDecode`` / ``rleMerge``
semantics), written from the published algorithm. Used only by tests to
validate the native C++ implementation (native/coco_mask.cpp) and the
numpy fallback on frozen fixtures and randomized polygons.

Algorithm (rleFrPoly): vertices are scaled 5x and rounded; a dense
integer walk covers every boundary edge; column transitions of the walk
are downsampled back to the pixel grid and become column-major crossing
positions; sorting + parity turns them into alternating run lengths.
"""

import math

import numpy as np


def rle_from_poly(xy, h, w):
    """xy: flat [x0, y0, x1, y1, ...]; returns uint32 run lengths
    (alternating 0-run / 1-run, column-major)."""
    k = len(xy) // 2
    scale = 5.0
    x = [int(scale * xy[2 * j] + 0.5) for j in range(k)]
    y = [int(scale * xy[2 * j + 1] + 0.5) for j in range(k)]
    x.append(x[0])
    y.append(y[0])

    # dense boundary walk (every edge, original direction preserved
    # through the flip/t indexing)
    u, v = [], []
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

    # column transitions -> pixel-grid crossing points
    px, py = [], []
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
        yd = math.ceil(yd)
        px.append(int(xd))
        py.append(int(yd))

    # crossings -> sorted column-major positions -> delta -> parity merge
    a = sorted(int(xx) * h + int(yy) for xx, yy in zip(px, py))
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


def decode(counts, h, w):
    """Column-major alternating runs -> row-major uint8 [h, w]."""
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in counts:
        if val:
            flat[pos:pos + int(run)] = 1
        pos += int(run)
        val = 1 - val
    return flat.reshape(w, h).T


def polys_to_mask(polys, h, w):
    """Union of rings (pycocotools ``merge`` of per-ring masks)."""
    mask = np.zeros((h, w), np.uint8)
    for poly in polys:
        if len(poly) >= 6:
            mask |= decode(rle_from_poly(list(poly), h, w), h, w)
    return mask
