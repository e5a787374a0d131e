#!/usr/bin/env python
"""Export OUR trained checkpoint (msgpack) to the REFERENCE's .pth
state_dict layout — the inverse of tools/convert_reference_ckpt.py.

Lets a model trained here be evaluated/deployed in the reference's
PyTorch stack (reference entry/*.py test pipelines), completing the
two-way checkpoint interchange. Key names mirror the reference modules:
baseline/pemp_stage1/pemp_stage2 (networks/baseline.py,
pemp_stage1.py:73-105, pemp_stage2.py:48-95), canet (canet.py:54-120),
rpmms (rpmms.py:155-210), pfenet (pfenet.py:64-66 layer0 regrouping).

Usage:
  python tools/export_reference_ckpt.py --model pemp_stage1 \
      --backbone resnet50 --ckpt bestckpt.msgpack --out bestckpt.pth
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

RESNET_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _inv_t(k) -> np.ndarray:
    """flax conv HWIO -> torch OIHW."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _conv(sd, params, path, key, bias=True):
    sd[f"{key}.weight"] = _inv_t(_get(params, path + ("Conv_0", "kernel")))
    node = params
    for p in path:
        node = node[p]
    if bias and "bias" in node["Conv_0"]:
        sd[f"{key}.bias"] = np.asarray(node["Conv_0"]["bias"])


def _bn(sd, params, stats, path, key):
    sd[f"{key}.weight"] = _get(params, path + ("BatchNorm_0", "scale"))
    sd[f"{key}.bias"] = _get(params, path + ("BatchNorm_0", "bias"))
    sd[f"{key}.running_mean"] = _get(stats, path + ("BatchNorm_0", "mean"))
    sd[f"{key}.running_var"] = _get(stats, path + ("BatchNorm_0", "var"))


def export_resnet(sd, params, stats, backbone: str, stages: int = 3,
                  prefix: str = "", our_prefix: str = "backbone"):
    """Inverse of torch_convert.convert_resnet (shape-exact: CM/prior
    channel padding is already part of the trained weights)."""
    bp = params[our_prefix]
    _conv(sd, params, (our_prefix, "conv1"), f"{prefix}conv1", bias=False)
    _bn(sd, params, stats, (our_prefix, "bn1"), f"{prefix}bn1")
    for si in range(1, stages + 1):
        for bi in range(RESNET_BLOCKS[backbone][si - 1]):
            tk = f"{prefix}layer{si}.{bi}"
            ours = f"layer{si}_{bi}"
            for ci in (1, 2, 3):
                _conv(sd, params, (our_prefix, ours, f"conv{ci}"),
                      f"{tk}.conv{ci}", bias=False)
                _bn(sd, params, stats, (our_prefix, ours, f"bn{ci}"),
                    f"{tk}.bn{ci}")
            if "downsample_conv" in bp[ours]:
                _conv(sd, params, (our_prefix, ours, "downsample_conv"),
                      f"{tk}.downsample.0", bias=False)
                _bn(sd, params, stats, (our_prefix, ours, "downsample_bn"),
                    f"{tk}.downsample.1")


def export_vgg16(sd, params, prefix: str = "", our_prefix: str = "backbone"):
    """Inverse of torch_convert.convert_vgg16 (torchvision features.*)."""
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for our_i, ti in enumerate(torch_idx):
        _conv(sd, params, (our_prefix, f"conv{our_i}"),
              f"{prefix}features.{ti}")


def export_trained(model_name: str, backbone: str, params, stats):
    """params/stats trees -> reference full-model state_dict (np arrays).
    Exact inverse of convert_reference_ckpt.convert_trained."""
    sd = {}

    if model_name == "pfenet":
        for j, (ci, bi_) in enumerate(((0, 1), (3, 4), (6, 7))):
            _conv(sd, params, ("backbone", f"stem_convs_{j}"),
                  f"layer0.{ci}", bias=False)
            _bn(sd, params, stats, ("backbone", f"stem_bns_{j}"),
                f"layer0.{bi_}")
        for si, nb in ((1, 3), (2, 4), (3, 6), (4, 3)):
            for bi in range(nb):
                tk, ours = f"layer{si}.{bi}", f"layer{si}_{bi}"
                for ci in (1, 2, 3):
                    _conv(sd, params, ("backbone", ours, f"conv{ci}"),
                          f"{tk}.conv{ci}", bias=False)
                    _bn(sd, params, stats, ("backbone", ours, f"bn{ci}"),
                        f"{tk}.bn{ci}")
                if "downsample_conv" in params["backbone"][ours]:
                    _conv(sd, params, ("backbone", ours, "downsample_conv"),
                          f"{tk}.downsample.0", bias=False)
                    _bn(sd, params, stats,
                        ("backbone", ours, "downsample_bn"),
                        f"{tk}.downsample.1")
        _conv(sd, params, ("down_query_conv",), "down_query.0")
        _conv(sd, params, ("down_supp_conv",), "down_supp.0")
        n_bins = len([k for k in params if k.startswith("init_merge_")])
        for i in range(n_bins):
            _conv(sd, params, (f"init_merge_{i}",), f"init_merge.{i}.0")
            _conv(sd, params, (f"beta_conv_{i}_0",), f"beta_conv.{i}.0")
            _conv(sd, params, (f"beta_conv_{i}_1",), f"beta_conv.{i}.2")
            _conv(sd, params, (f"inner_cls_{i}", "conv"), f"inner_cls.{i}.0")
            _conv(sd, params, (f"inner_cls_{i}", "cls"), f"inner_cls.{i}.3")
            if i:
                _conv(sd, params, (f"alpha_conv_{i - 1}",),
                      f"alpha_conv.{i - 1}.0")
        _conv(sd, params, ("res1",), "res1.0")
        _conv(sd, params, ("res2_0",), "res2.0")
        _conv(sd, params, ("res2_1",), "res2.2")
        _conv(sd, params, ("cls", "conv"), "cls.0")
        _conv(sd, params, ("cls", "cls"), "cls.3")
        return sd

    prefix = {"canet": "encoder.",
              "rpmms": "model_res."}.get(model_name, "encoder.backbone.")

    if model_name == "rpmms":
        export_resnet(sd, params, stats, "resnet50", stages=3, prefix=prefix)
        _conv(sd, params, ("layer5_conv",), "layer5.0")
        _bn(sd, params, stats, ("layer5_bn",), "layer5.1")
        _conv(sd, params, ("layer55_conv",), "layer55.0")
        _conv(sd, params, ("layer56_conv",), "layer56.0")
        for k in range(5):
            _conv(sd, params, ("layer6", f"aspp_{k}"), f"layer6.aspp_{k}.0")
        _conv(sd, params, ("layer7_conv",), "layer7.0")
        _conv(sd, params, ("layer9",), "layer9")
        for i in (1, 2, 3):
            _conv(sd, params, (f"residule{i}", "conv1"), f"residule{i}.1")
            _conv(sd, params, (f"residule{i}", "conv2"), f"residule{i}.3")
        return sd

    if model_name == "canet":
        export_resnet(sd, params, stats, "resnet50", stages=3, prefix=prefix)
        for name in ("layer5", "layer55", "aspp_0", "aspp_1", "aspp_2",
                     "aspp_3", "aspp_4", "layer6"):
            _conv(sd, params, (name, "conv"), f"{name}.0")
        for i in (1, 2, 3):
            _conv(sd, params, (f"residual_{i}", "conv1"), f"residual_{i}.1")
            _conv(sd, params, (f"residual_{i}", "conv2"), f"residual_{i}.3")
        _conv(sd, params, ("layer7",), "layer7")
        return sd

    if backbone == "vgg16":
        export_vgg16(sd, params, prefix=prefix)
    else:
        export_resnet(sd, params, stats, backbone, stages=3, prefix=prefix)

    if model_name in ("baseline", "panet"):
        # identical layouts (reference panet.py:48-61)
        if "projection" in params:
            _conv(sd, params, ("projection",), "encoder.projection")
        return sd

    if model_name == "pemp_stage1":
        if "ctr" in params:
            sd["ctr"] = np.asarray(params["ctr"])
        if backbone == "vgg16":
            return sd
        _conv(sd, params, ("purifier", "conv1"), "encoder.purifier.0")
        _conv(sd, params, ("purifier", "conv2"), "encoder.purifier.3")
        for k in range(5):
            _bn(sd, params, stats, ("purifier", "aspp", f"aspp_{k}_bn"),
                f"encoder.purifier.6.aspp_{k}.0")
            _conv(sd, params, ("purifier", "aspp", f"aspp_{k}_conv"),
                  f"encoder.purifier.6.aspp_{k}.2")
        _conv(sd, params, ("purifier", "aspp", "layer6"),
              "encoder.purifier.6.layer6")
        return sd

    if model_name == "pemp_stage2":
        if backbone == "vgg16":
            raise ValueError("pemp_stage2 vgg16 export not supported "
                             "(ResNetCM only, matching the importer)")
        if "ctr" in params:
            sd["ctr"] = np.asarray(params["ctr"])
        for i in (1, 2, 3):
            w = _get(params, ("backbone", f"cm{i}", "linear", "kernel"))
            sd[f"encoder.backbone.linear{i}.weight"] = \
                np.ascontiguousarray(w.T)
            sd[f"encoder.backbone.linear{i}.bias"] = _get(
                params, ("backbone", f"cm{i}", "linear", "bias"))
        _conv(sd, params, ("purifier", "conv1"), "encoder.purifier.0")
        _conv(sd, params, ("purifier", "conv2"), "encoder.purifier.3")
        for k in range(5):
            _conv(sd, params, ("purifier", "aspp", f"aspp_{k}"),
                  f"encoder.purifier.6.aspp_{k}.0")
        _conv(sd, params, ("purifier", "aspp", "layer6"),
              "encoder.purifier.6.layer6")
        return sd

    raise ValueError(f"Unsupported model '{model_name}'")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["baseline", "pemp_stage1", "pemp_stage2",
                             "panet", "canet", "rpmms", "pfenet"])
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--ckpt", required=True, help="our .msgpack checkpoint")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--shot", type=int, default=1)
    args = ap.parse_args()

    import torch
    from pemp_tpu.core import checkpoint as ckpt_lib
    from tools.convert_reference_ckpt import build_init_trees

    _, params, stats = build_init_trees(args.model, args.backbone, args.shot)
    variables = ckpt_lib.load_variables(
        Path(args.ckpt), {"params": params, "batch_stats": stats})

    sd = export_trained(args.model, args.backbone,
                        variables["params"], variables["batch_stats"])
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"exported {args.ckpt} -> {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
