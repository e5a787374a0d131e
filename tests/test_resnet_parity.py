"""ResNet bottleneck + frozen-BN numerical parity vs a torch mirror of
the reference block (backbones.py:42-77: stride on conv1, BN eps 1e-5,
residual add before the final relu), plus the stage-1 trained-checkpoint
converter mapping."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from pemp_tpu.models.backbones import BottleNeck


class TorchBottleneck(nn.Module):
    """Reference BottleNeck (backbones.py:42-77)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


def randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(bn.weight.numel())
                                         .astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(bn.bias.numel())
                                       .astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(
            rng.randn(bn.running_mean.numel()).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(
            rng.rand(bn.running_var.numel()).astype(np.float32) + 0.5))


def test_bottleneck_eval_parity():
    rng = np.random.RandomState(0)
    tb = TorchBottleneck(32, 16, stride=2, dilation=1, downsample=True)
    for bn in (tb.bn1, tb.bn2, tb.bn3, tb.downsample[1]):
        randomize_bn(bn, rng)
    tb.eval()

    model = BottleNeck(planes=16, stride=2, dilation=1, use_downsample=True)
    x = rng.randn(2, 17, 17, 32).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def put_conv(name, conv):
        params[name]["Conv_0"]["kernel"] = np.transpose(
            conv.weight.detach().numpy(), (2, 3, 1, 0))

    def put_bn(name, bn):
        params[name]["BatchNorm_0"]["scale"] = bn.weight.detach().numpy()
        params[name]["BatchNorm_0"]["bias"] = bn.bias.detach().numpy()
        stats[name]["BatchNorm_0"]["mean"] = bn.running_mean.numpy()
        stats[name]["BatchNorm_0"]["var"] = bn.running_var.numpy()

    put_conv("conv1", tb.conv1); put_bn("bn1", tb.bn1)
    put_conv("conv2", tb.conv2); put_bn("bn2", tb.bn2)
    put_conv("conv3", tb.conv3); put_bn("bn3", tb.bn3)
    put_conv("downsample_conv", tb.downsample[0])
    put_bn("downsample_bn", tb.downsample[1])

    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), False)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_stage1_trained_ckpt_converter_mapping():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from convert_reference_ckpt import convert_trained
    from pemp_tpu.models.pemp_stage1 import PEMPStage1
    from tests.test_torch_convert import fake_resnet50_sd

    rng = np.random.RandomState(3)
    sd = {f"encoder.backbone.{k}": v
          for k, v in fake_resnet50_sd(rng).items()}
    # purifier convs
    sd["encoder.purifier.0.weight"] = rng.randn(256, 1024, 1, 1).astype(np.float32)
    sd["encoder.purifier.0.bias"] = rng.randn(256).astype(np.float32)
    sd["encoder.purifier.3.weight"] = rng.randn(256, 256, 3, 3).astype(np.float32)
    sd["encoder.purifier.3.bias"] = rng.randn(256).astype(np.float32)
    # ASPPV2 branches (BN at .0, conv at .2) + tail
    for k in range(5):
        base = f"encoder.purifier.6.aspp_{k}"
        sd[f"{base}.0.weight"] = rng.rand(256).astype(np.float32)
        sd[f"{base}.0.bias"] = rng.randn(256).astype(np.float32)
        sd[f"{base}.0.running_mean"] = rng.randn(256).astype(np.float32)
        sd[f"{base}.0.running_var"] = rng.rand(256).astype(np.float32)
        ksz = 1 if k < 2 else 3
        sd[f"{base}.2.weight"] = rng.randn(256, 256, ksz, ksz).astype(np.float32)
        sd[f"{base}.2.bias"] = rng.randn(256).astype(np.float32)
    sd["encoder.purifier.6.layer6.weight"] = rng.randn(
        512, 1280, 1, 1).astype(np.float32)
    sd["encoder.purifier.6.layer6.bias"] = rng.randn(512).astype(np.float32)
    sd["ctr"] = rng.rand(512, 6).astype(np.float32)

    model = PEMPStage1(backbone="resnet50")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 1, 33, 33, 3)),
                           jnp.zeros((1, 1, 33, 33, 2)),
                           jnp.zeros((1, 1, 33, 33, 3)), out_hw=None)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    convert_trained("pemp_stage1", "resnet50", sd, params, stats)

    np.testing.assert_array_equal(params["ctr"], sd["ctr"])
    np.testing.assert_array_equal(
        params["purifier"]["conv1"]["Conv_0"]["kernel"],
        np.transpose(sd["encoder.purifier.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        params["purifier"]["aspp"]["aspp_3_conv"]["Conv_0"]["kernel"],
        np.transpose(sd["encoder.purifier.6.aspp_3.2.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        stats["purifier"]["aspp"]["aspp_2_bn"]["BatchNorm_0"]["var"],
        sd["encoder.purifier.6.aspp_2.0.running_var"])
