"""Whole-model numerical parity: our Flax Baseline/VGG16 vs a torch
mirror of the reference forward (networks/baseline.py:69-149 +
backbones.py:372-405), sharing identical weights via the converter.

This exercises every conv/pool/dilation/padding convention, the support
feature upsample, masked pooling, cosine matching, and the final
align_corners resize in one shot — end-to-end logits must agree to f32
tolerance.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pemp_tpu.models.baseline import Baseline
from pemp_tpu.utils import torch_convert as tc

H = W = 33


def torch_vgg16(init=3):
    """The reference VGG16 trunk layer list (backbones.py:375-397),
    lastRelu=False."""
    return nn.Sequential(
        nn.Conv2d(init, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 1, 1),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2), nn.ReLU(),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2),
    )


def torch_baseline_forward(trunk, sup_img, sup_mask, qry_img):
    """Reference Baseline.forward math (baseline.py:88-149), NCHW."""
    B, S, C, Hh, Ww = sup_img.shape
    Q = qry_img.shape[1]
    img_cat = torch.cat([sup_img, qry_img], 1).view(B * (S + Q), C, Hh, Ww)
    fts = trunk(img_cat)
    c, h, w = fts.shape[1:]
    fts = fts.view(B, S + Q, c, h, w)
    sup_fts = fts[:, :S].reshape(B * S, c, h, w)
    qry_fts = fts[:, S:].reshape(B * Q, c, h, w)
    sup_up = F.interpolate(sup_fts, (Hh, Ww), mode="bilinear",
                           align_corners=True)
    m = sup_mask.view(B * S, 2, Hh, Ww)
    fg, bg = m.split(1, dim=1)
    fg_v = (sup_up * fg).sum((2, 3)) / (fg.sum((2, 3)) + 1e-5)
    bg_v = (sup_up * bg).sum((2, 3)) / (bg.sum((2, 3)) + 1e-5)
    fg_p = fg_v.view(B, S, -1).mean(1)
    bg_p = bg_v.view(B, S, -1).mean(1)
    fg_d = F.cosine_similarity(qry_fts, fg_p[..., None, None], dim=1) * 20
    bg_d = F.cosine_similarity(qry_fts, bg_p[..., None, None], dim=1) * 20
    pred = torch.stack([bg_d, fg_d], 1)
    return F.interpolate(pred, (Hh, Ww), mode="bilinear",
                         align_corners=True)


def test_baseline_vgg16_forward_parity():
    torch.manual_seed(0)
    trunk = torch_vgg16().eval()

    # convert torch weights into the Flax model via the converter path
    conv_idx = [i for i, m in enumerate(trunk) if isinstance(m, nn.Conv2d)]
    sd = {}
    for j, i in enumerate(conv_idx):
        # converter expects torchvision key layout features.<i>.*
        tvi = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28][j]
        sd[f"features.{tvi}.weight"] = trunk[i].weight.detach().numpy()
        sd[f"features.{tvi}.bias"] = trunk[i].bias.detach().numpy()

    model = Baseline(backbone="vgg16")
    rng = np.random.RandomState(0)
    sup_img = rng.randn(2, 1, H, W, 3).astype(np.float32)
    fg = (rng.rand(2, 1, H, W, 1) > 0.5).astype(np.float32)
    sup_mask = np.concatenate([fg, 1 - fg], -1)
    qry_img = rng.randn(2, 1, H, W, 3).astype(np.float32)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(H, W))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tc.convert_vgg16(sd, params)

    ours = model.apply({"params": params}, jnp.asarray(sup_img),
                       jnp.asarray(sup_mask), jnp.asarray(qry_img),
                       out_hw=(H, W), train=False)
    ours = np.asarray(ours)                       # [B, Q, H, W, 2]

    with torch.no_grad():
        ref = torch_baseline_forward(
            trunk,
            torch.from_numpy(sup_img).permute(0, 1, 4, 2, 3),
            torch.from_numpy(sup_mask).permute(0, 1, 4, 2, 3),
            torch.from_numpy(qry_img).permute(0, 1, 4, 2, 3))
    ref = ref.view(2, 1, 2, H, W).permute(0, 1, 3, 4, 2).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)
