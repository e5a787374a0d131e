"""Model registry: name -> (net-config dataclass, builder).

The builder turns a top-level :class:`pemp_tpu.config.Config` (with its
``net`` scope installed) into a Flax module plus the list of frozen-param
regex patterns for the optimizer mask.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

from pemp_tpu.models import baseline as _baseline
from pemp_tpu.models import canet as _canet
from pemp_tpu.models import panet as _panet
from pemp_tpu.models import pemp_stage1 as _s1
from pemp_tpu.models import pemp_stage2 as _s2
from pemp_tpu.models import pfenet as _pfenet
from pemp_tpu.models import rpmms as _rpmms

DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32}


def _dtype(cfg):
    return DTYPES[cfg.tpu.precision]


def build_baseline(cfg):
    net = cfg.net
    model = _baseline.Baseline(
        backbone=net.backbone, out_channels=net.out_channels,
        dist_scalar=net.dist_scalar, dtype=_dtype(cfg))
    return model, _baseline.Baseline.FROZEN[net.backbone]


def build_pemp_stage1(cfg):
    net = cfg.net
    model = _s1.PEMPStage1(
        backbone=net.backbone, out_channels=net.out_channels,
        protos=net.protos, drop_rate=net.drop_rate,
        block_size=net.block_size, dist_scalar=net.dist_scalar,
        dtype=_dtype(cfg))
    return model, _s1.PEMPStage1.FROZEN[net.backbone]


def build_pemp_stage2(cfg):
    net = cfg.net
    backbone2 = net.backbone2 or net.backbone
    model = _s2.PEMPStage2(
        backbone=backbone2, out_channels=net.out_channels,
        protos=net.protos2, drop_rate=net.drop_rate2,
        dist_scalar=net.dist_scalar, spq=cfg.shot + cfg.query,
        dtype=_dtype(cfg))
    return model, _s2.PEMPStage2.FROZEN[backbone2]


def build_panet(cfg):
    net = cfg.net
    model = _panet.PANet(
        backbone=net.backbone, out_channels=net.out_channels,
        dist_scalar=net.dist_scalar, dtype=_dtype(cfg))
    return model, _panet.PANet.FROZEN[net.backbone]


def build_canet(cfg):
    net = cfg.net
    model = _canet.CaNet(
        drop_rate=net.drop_rate, use_history=net.history, dtype=_dtype(cfg))
    return model, _canet.CaNet.FROZEN[net.freeze_backbone]


def build_rpmms(cfg):
    net = cfg.net
    model = _rpmms.RPMMs(drop_rate=net.drop_rate, dtype=_dtype(cfg))
    return model, _rpmms.RPMMs.FROZEN["resnet50"]


def build_pfenet(cfg):
    model = _pfenet.PFENet(shot=cfg.shot, dtype=_dtype(cfg))
    return model, _pfenet.PFENet.FROZEN["resnet50v2"]


REGISTRY: Dict[str, Tuple[Any, Callable]] = {
    "baseline": (_baseline.NetConfig, build_baseline),
    "pemp_stage1": (_s1.NetConfig, build_pemp_stage1),
    "pemp_stage2": (_s1.NetConfig, build_pemp_stage2),
    "panet": (_panet.NetConfig, build_panet),
    "canet": (_canet.NetConfig, build_canet),
    "rpmms": (_rpmms.NetConfig, build_rpmms),
    "pfenet": (_pfenet.NetConfig, build_pfenet),
}


def net_config(name: str):
    return REGISTRY[name][0]()


def build(name: str, cfg):
    """Returns (flax module, frozen-param regex list)."""
    return REGISTRY[name][1](cfg)
