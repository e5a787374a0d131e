"""COCO polygon rasterizer golden fixtures (VERDICT round-1 item 5).

Frozen expected masks (pixel count + sha256 of the mask bytes) for
nontrivial polygon cases, generated from an independent pure-Python
transcription of the official COCO algorithm (tests/pycoco_oracle.py,
the pycocotools maskApi.c ``rleFrPoly`` semantics: 5x-upsampled boundary
walk, column-crossing parity fill). Both the native C++ path and the
numpy fallback must reproduce every fixture exactly, and they must agree
bit-for-bit with the oracle on randomized polygons.

This suite caught (and now guards against) a real bug: the original
native dense-boundary walk mishandled edges walked against their
original direction (right-to-left / bottom-to-top with slope), which
corrupted ~15% of mask pixels on arbitrary polygons.
"""

import hashlib

import numpy as np
import pytest

from pemp_tpu.data import mask_ops
from tests.pycoco_oracle import polys_to_mask as oracle_mask

# (name, polygons, h, w, expected_fg_px, sha256(mask.tobytes())[:16])
FIXTURES = [
    ("rect_int", [[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14,
     48, "72618727650a11f4"),
    ("rect_frac", [[1.3, 2.7, 9.6, 2.7, 9.6, 7.2, 1.3, 7.2]], 12, 14,
     36, "8e9e00a9645cc767"),
    ("bowtie_self_intersect", [[2, 2, 18, 14, 18, 2, 2, 14]], 16, 20,
     96, "3d89f93d6953f212"),
    ("star_self_intersect", [[10, 1, 13, 19, 1, 7, 19, 7, 7, 19]], 21, 21,
     66, "e1ed4bb1dad0b130"),
    ("self_touching_pinch",
     [[2, 2, 10, 10, 18, 2, 18, 18, 10, 10, 2, 18]], 20, 20,
     128, "66937ca8e5b69769"),
    ("multi_ring_overlap",
     [[1, 1, 9, 1, 9, 9, 1, 9], [5, 5, 14, 5, 14, 14, 5, 14]], 16, 16,
     129, "4e9cd51811ebfeb0"),
    ("collinear_dup_vertices",
     [[2, 2, 6, 2, 10, 2, 10, 2, 10, 10, 2, 10]], 12, 12,
     64, "3160d786b8916298"),
    ("out_of_bounds", [[-3, -4, 25, -2, 26, 13, -5, 14]], 12, 20,
     240, "770da3c513c3c3a2"),
    ("thin_sliver", [[1, 1, 18, 1.18, 18, 1.55, 1, 1.4]], 6, 20,
     8, "30e14c875a4fb198"),
    ("tiny_subpixel", [[5.2, 5.3, 5.6, 5.3, 5.6, 5.8, 5.2, 5.8]], 10, 10,
     1, "04263c88b9aeb706"),
    ("degenerate_line", [[2, 3, 8, 3, 14, 3]], 8, 16,
     0, "38723a2e5e8a17aa"),
    ("ccw_triangle", [[3, 2, 16, 5, 7, 17]], 19, 19,
     92, "e61490066e145ae9"),
    ("cw_triangle", [[3, 2, 7, 17, 16, 5]], 19, 19,
     92, "e61490066e145ae9"),
]


def _digest(mask: np.ndarray) -> str:
    return hashlib.sha256(mask.tobytes()).hexdigest()[:16]


@pytest.mark.parametrize("name,polys,h,w,n_fg,digest", FIXTURES,
                         ids=[f[0] for f in FIXTURES])
def test_frozen_fixture(name, polys, h, w, n_fg, digest):
    for label, mask in [
        ("native", mask_ops.polys_to_mask(polys, h, w)),
        ("fallback", mask_ops._polys_to_mask_np(
            [np.asarray(p, np.float64) for p in polys], h, w)),
        ("oracle", oracle_mask(polys, h, w)),
    ]:
        assert mask.shape == (h, w), (name, label)
        assert int(mask.sum()) == n_fg, (name, label, int(mask.sum()))
        assert _digest(mask) == digest, (name, label)


def test_native_matches_oracle_randomized():
    """500 random polygons + 100 multi-ring unions: the native C++
    rasterizer must agree with the official-algorithm oracle exactly."""
    if mask_ops.get_lib() is None:
        pytest.skip("no compiler for the native lib")
    rng = np.random.RandomState(0)
    for _ in range(500):
        h, w = rng.randint(8, 60), rng.randint(8, 60)
        k = rng.randint(3, 12)
        poly = (rng.rand(k * 2) * np.array([w, h] * k)).tolist()
        np.testing.assert_array_equal(
            mask_ops.polys_to_mask([poly], h, w),
            oracle_mask([poly], h, w))
    for _ in range(100):
        h, w = rng.randint(12, 50), rng.randint(12, 50)
        polys = [(rng.rand(rng.randint(3, 7) * 2) * min(h, w)).tolist()
                 for _ in range(rng.randint(2, 4))]
        np.testing.assert_array_equal(
            mask_ops.polys_to_mask(polys, h, w),
            oracle_mask(polys, h, w))


def test_fallback_matches_native_randomized():
    if mask_ops.get_lib() is None:
        pytest.skip("no compiler for the native lib")
    rng = np.random.RandomState(7)
    for _ in range(100):
        h, w = rng.randint(8, 48), rng.randint(8, 48)
        k = rng.randint(3, 10)
        poly = [np.asarray((rng.rand(k * 2) * np.array([w, h] * k)),
                           np.float64)]
        np.testing.assert_array_equal(
            mask_ops.polys_to_mask(poly, h, w),
            mask_ops._polys_to_mask_np(poly, h, w))


def test_rle_odd_tail():
    """RLE whose counts end mid-column (odd tail): decode must leave the
    remaining pixels background on both paths."""
    counts = np.asarray([3, 5, 2, 7, 4], np.uint32)     # sums to 21 < 5*5
    h, w = 5, 5
    want = mask_ops._rle_decode_np(counts, h, w)
    got = mask_ops.decode_rle({"size": [h, w], "counts": counts})
    np.testing.assert_array_equal(got, want)
    assert int(want.sum()) == 5 + 7                      # the two 1-runs
    assert want.T.ravel()[21:].sum() == 0                # tail stays bg
