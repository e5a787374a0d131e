"""torchvision checkpoint -> Flax parameter conversion (weight surgery).

Counterpart of the reference's pretrained-weight loading with key/channel
surgery (reference networks/backbones.py:138-157 for plain ResNet,
:249-276 for the CM channel padding, :407-421 for VGG16, and the stage-2
4-channel first conv). Torch convs are OIHW; Flax NHWC convs are HWIO, so
kernels transpose (2, 3, 1, 0). Extra input channels introduced by the CM
variants (+n per stage) and the prior channel (+1 on conv1) are
zero-padded, exactly like the reference surgery — including the intended
behavior of the reference's buggy ``VGG16CM.init_weights`` path
(backbones.py:518, SURVEY.md section 7.3).

Checkpoint files are looked up under ``data/`` (same filenames the
reference uses); when absent, backbones keep their random init and a
notice is logged (datasets/weights are not bundled).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

PRETRAINED_FILES = {
    "vgg16": "data/vgg16-397923af.pth",
    "resnet50": "data/resnet50-19c8e357.pth",
    "resnet101": "data/resnet101-5d3b4d8f.pth",
    "resnet50v2": "data/resnet50_v2.pth",
}

RESNET_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _t(w) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _pad_in(kernel: np.ndarray, extra: int) -> np.ndarray:
    """Zero-pad input channels (HWIO axis 2) — the reference surgery
    concatenates zeros for new channels (backbones.py:255-274)."""
    if extra <= 0:
        return kernel
    h, w, i, o = kernel.shape
    return np.concatenate(
        [kernel, np.zeros((h, w, extra, o), kernel.dtype)], axis=2)


def _set_conv(params, path, kernel, bias=None):
    node = params
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]["Conv_0"]
    if leaf["kernel"].shape != kernel.shape:
        raise ValueError(f"shape mismatch at {path}: "
                         f"{leaf['kernel'].shape} vs {kernel.shape}")
    leaf["kernel"] = kernel.astype(leaf["kernel"].dtype)
    if bias is not None:
        leaf["bias"] = np.asarray(bias, leaf["bias"].dtype)


def _set_bn(params, batch_stats, path, sd, key):
    node_p, node_s = params, batch_stats
    for p in path[:-1]:
        node_p = node_p[p]
        node_s = node_s[p]
    leaf_p = node_p[path[-1]]["BatchNorm_0"]
    leaf_s = node_s[path[-1]]["BatchNorm_0"]
    leaf_p["scale"] = np.asarray(sd[f"{key}.weight"], leaf_p["scale"].dtype)
    leaf_p["bias"] = np.asarray(sd[f"{key}.bias"], leaf_p["bias"].dtype)
    leaf_s["mean"] = np.asarray(sd[f"{key}.running_mean"],
                                leaf_s["mean"].dtype)
    leaf_s["var"] = np.asarray(sd[f"{key}.running_var"], leaf_s["var"].dtype)


def load_state_dict(path: Path) -> Dict:
    import torch
    sd = torch.load(str(path), map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def convert_resnet(sd: Dict, params, batch_stats, backbone: str,
                   stages: int = 3, cm_channels: int = 0,
                   in_channels: int = 3, prefix: str = "backbone"):
    """Map a torchvision ResNet state_dict onto our dilated trunk.
    ``cm_channels`` pads the first conv of every stage (+n, CM variants);
    ``in_channels`` > 3 pads conv1 (the stage-2 prior channel)."""
    bp = params[prefix]
    bs = batch_stats[prefix]

    k = _t(sd["conv1.weight"])
    k = _pad_in(k, in_channels - 3)
    _set_conv({prefix: params[prefix]}, (prefix, "conv1"), k)
    _set_bn({prefix: bp}, {prefix: bs}, (prefix, "bn1"), sd, "bn1")

    for si in range(1, stages + 1):
        blocks = RESNET_BLOCKS[backbone][si - 1]
        for bi in range(blocks):
            tk = f"layer{si}.{bi}"
            ours = f"layer{si}_{bi}"
            for ci in (1, 2, 3):
                kk = _t(sd[f"{tk}.conv{ci}.weight"])
                if ci == 1 and bi == 0 and cm_channels:
                    kk = _pad_in(kk, cm_channels)
                _set_conv({prefix: bp}, (prefix, ours, f"conv{ci}"), kk)
                _set_bn({prefix: bp}, {prefix: bs},
                        (prefix, ours, f"bn{ci}"), sd, f"{tk}.bn{ci}")
            if f"{tk}.downsample.0.weight" in sd and \
                    "downsample_conv" in bp[ours]:
                kk = _t(sd[f"{tk}.downsample.0.weight"])
                if bi == 0 and cm_channels:
                    kk = _pad_in(kk, cm_channels)
                _set_conv({prefix: bp}, (prefix, ours, "downsample_conv"), kk)
                _set_bn({prefix: bp}, {prefix: bs},
                        (prefix, ours, "downsample_bn"), sd,
                        f"{tk}.downsample.1")


def convert_vgg16(sd: Dict, params, backbone_prefix: str = "backbone",
                  cm_channels: int = 0, in_channels: int = 3):
    """torchvision VGG16 ``features.*`` convs -> our conv0..conv12.
    With CM, the first conv of blocks 2-5 gains +n input channels and
    conv0 gains the prior channel — all zero-padded."""
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    # first conv of blocks 2..5 in our flat numbering
    block_firsts = {2: 2, 3: 4, 4: 7, 5: 10}
    cm_first = set(block_firsts.values()) if cm_channels else set()
    bp = params[backbone_prefix]
    for our_i, ti in enumerate(torch_idx):
        k = _t(sd[f"features.{ti}.weight"])
        if our_i == 0:
            k = _pad_in(k, in_channels - 3)
        elif our_i in cm_first:
            k = _pad_in(k, cm_channels)
        _set_conv({backbone_prefix: bp}, (backbone_prefix, f"conv{our_i}"),
                  k, sd[f"features.{ti}.bias"])


def convert_resnet50v2(sd: Dict, params, batch_stats,
                       prefix: str = "backbone"):
    """Deep-base ResNet-50 v2 (PFENet trunk): 3-conv stem + 4 stages."""
    bp, bs = params[prefix], batch_stats[prefix]
    for i in (1, 2, 3):
        # trunk stems are list-attrs in flax -> names stem_convs_{i-1}
        _set_conv({prefix: bp}, (prefix, f"stem_convs_{i - 1}"),
                  _t(sd[f"conv{i}.weight"]))
        _set_bn({prefix: bp}, {prefix: bs}, (prefix, f"stem_bns_{i - 1}"),
                sd, f"bn{i}")
    for si, blocks in enumerate((3, 4, 6, 3), 1):
        for bi in range(blocks):
            tk, ours = f"layer{si}.{bi}", f"layer{si}_{bi}"
            for ci in (1, 2, 3):
                _set_conv({prefix: bp}, (prefix, ours, f"conv{ci}"),
                          _t(sd[f"{tk}.conv{ci}.weight"]))
                _set_bn({prefix: bp}, {prefix: bs},
                        (prefix, ours, f"bn{ci}"), sd, f"{tk}.bn{ci}")
            if f"{tk}.downsample.0.weight" in sd and \
                    "downsample_conv" in bp[ours]:
                _set_conv({prefix: bp}, (prefix, ours, "downsample_conv"),
                          _t(sd[f"{tk}.downsample.0.weight"]))
                _set_bn({prefix: bp}, {prefix: bs},
                        (prefix, ours, "downsample_bn"), sd,
                        f"{tk}.downsample.1")


def try_load_backbone(model_name: str, cfg, params, batch_stats, logger):
    """Best-effort pretrained init; silently keeps random init when the
    checkpoint file is absent."""
    net = cfg.net
    if model_name == "pemp_stage2":
        backbone = getattr(net, "backbone2", "") or net.backbone
    elif model_name == "pfenet":
        backbone = "resnet50v2"
    elif model_name in ("canet", "rpmms"):
        backbone = "resnet50"
    else:
        backbone = net.backbone

    path = Path(PRETRAINED_FILES.get(backbone, ""))
    if not path.exists():
        logger.info(f"[pretrained] {path} not found - backbone "
                    f"'{backbone}' keeps random init")
        return False

    sd = load_state_dict(path)
    cm = 2 if model_name == "pemp_stage2" else 0
    in_c = 4 if model_name == "pemp_stage2" else 3
    if backbone in ("resnet50", "resnet101"):
        convert_resnet(sd, params, batch_stats, backbone, stages=3,
                       cm_channels=cm, in_channels=in_c)
    elif backbone == "vgg16":
        convert_vgg16(sd, params, cm_channels=cm, in_channels=in_c)
    elif backbone == "resnet50v2":
        convert_resnet50v2(sd, params, batch_stats)
    logger.info(f"[pretrained] backbone '{backbone}' initialized from {path}")
    return True
