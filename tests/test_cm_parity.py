"""Communication-module numerical parity vs a torch mirror of the
reference episode pooling (backbones.py:208-222): prior-masked mean+max
pooled features of all S+Q episode images, episode mean, linear to n=2
channels, broadcast to every pixel."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pemp_tpu.models.backbones import CommModule


def torch_comm(x, mask, linear, spq, stride):
    """Reference ResNetCM.comm in torch (NCHW)."""
    mask = F.max_pool2d(mask, 3, stride, 1)
    masked_x = (x * mask).view(*x.shape[:2], -1)
    mean = masked_x.mean(dim=-1)
    mean = mean.view(x.shape[0] // spq, spq, -1).mean(dim=1)
    max_ = masked_x.max(dim=-1)[0]
    max_ = max_.view(x.shape[0] // spq, spq, -1).mean(dim=1)
    feat = torch.cat([mean, max_], dim=1)
    feat = linear(feat)
    feat = feat.unsqueeze(1).unsqueeze(-1).unsqueeze(-1) \
        .expand(-1, spq, -1, *x.shape[-2:])
    return feat.reshape(x.shape[0], -1, *x.shape[-2:]), mask


def test_comm_module_matches_reference_math():
    rng = np.random.RandomState(0)
    spq, c, h, w = 3, 16, 17, 17
    b = 2
    x = rng.randn(b * spq, h, w, c).astype(np.float32)
    mask = (rng.rand(b * spq, 2 * h, 2 * w, 1) > 0.5).astype(np.float32)

    module = CommModule(n=2, spq=spq, mask_stride=2)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.asarray(x), jnp.asarray(mask))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    linear = nn.Linear(2 * c, 2)
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(
            params["linear"]["kernel"].T.copy()))
        linear.bias.copy_(torch.from_numpy(
            np.asarray(params["linear"]["bias"]).copy()))

    feat, new_mask = module.apply(variables, jnp.asarray(x),
                                  jnp.asarray(mask))
    with torch.no_grad():
        tfeat, tmask = torch_comm(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2),
            linear, spq, stride=2)

    np.testing.assert_allclose(
        np.asarray(feat),
        tfeat.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(new_mask)[..., 0], tmask[:, 0].numpy())
