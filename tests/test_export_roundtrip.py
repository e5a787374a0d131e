"""Checkpoint export (ours -> reference .pth layout) round-trips exactly
through the importer for every supported family.

export_trained and convert_trained are inverse mappings over the same
key tables; a round-trip (random params -> state_dict -> fresh trees)
must reproduce every exported leaf bit-exactly. Leaves the importer
does not touch (e.g. DropBlock-free extras both sides skip) are checked
by asserting the importer wrote into every path the exporter read.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).parents[1]))

from tools.convert_reference_ckpt import build_init_trees, convert_trained
from tools.export_reference_ckpt import export_trained

CASES = [
    ("baseline", "vgg16"),
    ("baseline", "resnet50"),
    ("pemp_stage1", "resnet50"),
    ("pemp_stage1", "vgg16"),
    ("pemp_stage2", "resnet50"),
    ("panet", "resnet50"),
    ("panet", "vgg16"),
    ("canet", "resnet50"),
    ("rpmms", "resnet50"),
    ("pfenet", "resnet50"),
]


def _init_trees(name, backbone, seed):
    _, params, stats = build_init_trees(name, backbone, shot=1, seed=seed)
    return params, stats


def _randomize(tree, rng):
    """Fill every leaf with fresh random values (batch stats init as
    0/1 constants would hide mean<->var mapping swaps)."""
    return jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(a.dtype), tree)


@pytest.mark.parametrize("name,backbone", CASES)
def test_export_import_roundtrip(name, backbone):
    params, stats = _init_trees(name, backbone, seed=0)
    rng = np.random.default_rng(7)
    params = _randomize(params, rng)
    stats = _randomize(stats, rng)

    sd = export_trained(name, backbone, params, stats)
    assert sd, "export produced an empty state_dict"
    # fresh (differently seeded) trees: every imported leaf must be
    # overwritten back to the exported values
    params2, stats2 = _init_trees(name, backbone, seed=123)
    convert_trained(name, backbone, sd, params2, stats2)
    sd2 = export_trained(name, backbone, params2, stats2)

    assert set(sd) == set(sd2)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)


def test_export_key_shapes_are_torch_layout():
    """Conv weights must be OIHW (reference torch layout), not HWIO."""
    params, stats = _init_trees("pemp_stage1", "resnet50", seed=0)
    sd = export_trained("pemp_stage1", "resnet50", params, stats)
    w = sd["encoder.backbone.conv1.weight"]
    assert w.shape == (64, 3, 7, 7)
    assert "encoder.backbone.layer1.0.bn1.running_mean" in sd
    assert sd["ctr"].shape[0] == 512     # [c, 2p] centers, untransposed
