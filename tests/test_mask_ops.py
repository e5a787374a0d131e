"""Native COCO mask ops: C++ vs numpy fallback parity + COCO index."""

import json

import numpy as np
import pytest

from pemp_tpu.data import mask_ops
from pemp_tpu.data.coco_index import COCOIndex


def encode_rle(mask: np.ndarray):
    """Column-major run-length encode (test helper)."""
    flat = mask.T.ravel()
    counts, val, run = [], 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, px
    counts.append(run)
    return np.asarray(counts, np.uint32)


def test_rle_decode_roundtrip_both_paths():
    rng = np.random.RandomState(0)
    mask = (rng.rand(23, 31) > 0.6).astype(np.uint8)
    counts = encode_rle(mask)
    rle = {"size": [23, 31], "counts": counts}
    got = mask_ops.decode_rle(rle)
    np.testing.assert_array_equal(got, mask)
    np.testing.assert_array_equal(
        mask_ops._rle_decode_np(counts, 23, 31), mask)


def test_rle_string_decoding():
    # delta base-48 string encoding round trip via the numpy encoder
    def encode_counts_to_string(counts):
        s = []
        for i, c in enumerate(counts):
            x = int(c)
            if i > 2:
                x -= int(counts[i - 2])
            more = True
            while more:
                ch = x & 0x1F
                x >>= 5
                more = x != (-1 if ch & 0x10 else 0)
                if more:
                    ch |= 0x20
                s.append(chr(ch + 48))
        return "".join(s)

    counts = np.asarray([3, 5, 2, 7, 11, 1], np.uint32)
    s = encode_counts_to_string(counts)
    got = mask_ops._rle_from_string_np(s.encode())
    np.testing.assert_array_equal(got, counts)
    # C++ path through decode_rle
    total = int(counts.sum())
    h = total  # single-column mask
    rle = {"size": [h, 1], "counts": s}
    dec = mask_ops.decode_rle(rle)
    np.testing.assert_array_equal(dec, mask_ops._rle_decode_np(counts, h, 1))


def test_polygon_rectangle_exact():
    # COCO semantics: rect [2,2]-[10,8] covers rows 2..7, cols 2..9
    poly = [2, 2, 10, 2, 10, 8, 2, 8]
    mask = mask_ops.polys_to_mask([poly], 12, 14)
    want = np.zeros((12, 14), np.uint8)
    want[2:8, 2:10] = 1
    np.testing.assert_array_equal(mask, want)


def test_polygon_union_of_rings():
    p1 = [1, 1, 4, 1, 4, 4, 1, 4]
    p2 = [6, 6, 9, 6, 9, 9, 6, 9]
    mask = mask_ops.polys_to_mask([p1, p2], 11, 11)
    assert mask[2, 2] == 1 and mask[7, 7] == 1 and mask[5, 5] == 0


def test_coco_index(tmp_path):
    data = {
        "images": [{"id": 1, "height": 10, "width": 12,
                    "file_name": "a.jpg"},
                   {"id": 2, "height": 8, "width": 8,
                    "file_name": "b.jpg"}],
        "annotations": [
            {"id": 100, "image_id": 1, "category_id": 5,
             "segmentation": [[2, 2, 8, 2, 8, 6, 2, 6]]},
            {"id": 101, "image_id": 2, "category_id": 7,
             "segmentation": [[1, 1, 5, 1, 5, 5, 1, 5]]},
        ],
        "categories": [{"id": 5}, {"id": 7}],
    }
    f = tmp_path / "instances.json"
    f.write_text(json.dumps(data))
    coco = COCOIndex(f)
    assert coco.getImgIds(catIds=5) == [1]
    assert coco.loadImgs(1)[0]["file_name"] == "a.jpg"
    ann = coco.loadAnns(coco.getAnnIds(imgIds=1))[0]
    mask = coco.annToMask(ann)
    assert mask.shape == (10, 12)
    assert mask.sum() > 0
