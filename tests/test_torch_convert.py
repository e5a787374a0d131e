"""torchvision->Flax weight conversion: synthetic state dicts with the
real key layout, checked for exact transposed placement + CM zero padding
(reference surgery: backbones.py:138-157, :249-276)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pemp_tpu.utils import torch_convert as tc

RESNET50_BLOCKS = (3, 4, 6)
PLANES = (64, 128, 256)


def fake_resnet50_sd(rng, in_c=3):
    """State dict with torchvision resnet50 keys/shapes (3 stages)."""
    sd = {}

    def bn(key, c):
        sd[f"{key}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.running_var"] = np.abs(rng.randn(c)).astype(np.float32)

    sd["conv1.weight"] = rng.randn(64, in_c, 7, 7).astype(np.float32)
    bn("bn1", 64)
    inplanes = 64
    for si, (blocks, planes) in enumerate(zip(RESNET50_BLOCKS, PLANES), 1):
        for bi in range(blocks):
            tk = f"layer{si}.{bi}"
            sd[f"{tk}.conv1.weight"] = rng.randn(
                planes, inplanes if bi == 0 else planes * 4, 1, 1
            ).astype(np.float32)
            bn(f"{tk}.bn1", planes)
            sd[f"{tk}.conv2.weight"] = rng.randn(
                planes, planes, 3, 3).astype(np.float32)
            bn(f"{tk}.bn2", planes)
            sd[f"{tk}.conv3.weight"] = rng.randn(
                planes * 4, planes, 1, 1).astype(np.float32)
            bn(f"{tk}.bn3", planes)
            if bi == 0:
                sd[f"{tk}.downsample.0.weight"] = rng.randn(
                    planes * 4, inplanes, 1, 1).astype(np.float32)
                bn(f"{tk}.downsample.1", planes * 4)
        inplanes = planes * 4
    return sd


def init_model(model, *args):
    return model.init({"params": jax.random.PRNGKey(0)}, *args)


def test_resnet50_conversion_places_transposed_weights():
    from pemp_tpu.models.backbones import ResNet

    rng = np.random.RandomState(0)
    sd = fake_resnet50_sd(rng)
    model = ResNet((3, 4, 6))
    variables = init_model(model, jnp.zeros((1, 33, 33, 3)), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    wrapped_p, wrapped_s = {"backbone": params}, {"backbone": stats}
    tc.convert_resnet(sd, wrapped_p, wrapped_s, "resnet50", stages=3)

    got = wrapped_p["backbone"]["layer2_1"]["conv2"]["Conv_0"]["kernel"]
    want = np.transpose(sd["layer2.1.conv2.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    got = wrapped_p["backbone"]["layer3_0"]["downsample_conv"]["Conv_0"]["kernel"]
    want = np.transpose(sd["layer3.0.downsample.0.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        wrapped_s["backbone"]["bn1"]["BatchNorm_0"]["mean"],
        sd["bn1.running_mean"])
    np.testing.assert_array_equal(
        wrapped_p["backbone"]["layer1_2"]["bn3"]["BatchNorm_0"]["scale"],
        sd["layer1.2.bn3.weight"])


def test_resnetcm_conversion_pads_channels():
    """Stage-2 surgery: conv1 +1 prior channel, first conv of each stage
    +2 CM channels, all zero-padded (reference :249-276)."""
    from pemp_tpu.models.backbones import ResNetCM

    rng = np.random.RandomState(1)
    sd = fake_resnet50_sd(rng)
    model = ResNetCM((3, 4, 6), spq=2)
    x = jnp.zeros((2, 33, 33, 4))
    mask = jnp.zeros((2, 33, 33, 1))
    variables = init_model(model, (x, mask), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    wp, ws = {"backbone": params}, {"backbone": stats}
    tc.convert_resnet(sd, wp, ws, "resnet50", stages=3,
                      cm_channels=2, in_channels=4)

    k = wp["backbone"]["conv1"]["Conv_0"]["kernel"]       # [7,7,4,64]
    np.testing.assert_array_equal(
        k[:, :, :3], np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    assert (k[:, :, 3] == 0).all()                        # prior channel

    k = wp["backbone"]["layer1_0"]["conv1"]["Conv_0"]["kernel"]  # [1,1,66,64]
    np.testing.assert_array_equal(
        k[:, :, :64], np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0)))
    assert (k[:, :, 64:] == 0).all()                      # CM channels


def test_vgg16_conversion():
    from pemp_tpu.models.backbones import VGG16

    rng = np.random.RandomState(2)
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    for (ic, oc), ti in zip(chans, torch_idx):
        sd[f"features.{ti}.weight"] = rng.randn(oc, ic, 3, 3).astype(np.float32)
        sd[f"features.{ti}.bias"] = rng.randn(oc).astype(np.float32)

    model = VGG16()
    variables = init_model(model, jnp.zeros((1, 33, 33, 3)), False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    wp = {"backbone": params}
    tc.convert_vgg16(sd, wp)
    got = wp["backbone"]["conv7"]["Conv_0"]["kernel"]
    want = np.transpose(sd["features.17.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        wp["backbone"]["conv0"]["Conv_0"]["bias"], sd["features.0.bias"])
