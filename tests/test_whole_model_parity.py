"""Whole-model forward parity vs torch mirrors of the reference math
(VERDICT round-1 item 2): end-to-end logits for every model family,
weights shared through the same converters that load real reference
checkpoints. Eval mode (DropBlock/Dropout no-ops); f32 everywhere with
matmul precision pinned (this env's default matmul precision is
bf16-level even on CPU).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests import torch_mirrors as tm

H = W = 49
B, S, Q = 2, 1, 1


def episode(rng, h=H, w=W, b=B, s=S, q=Q):
    sup_img = rng.randn(b, s, h, w, 3).astype(np.float32)
    fg = (rng.rand(b, s, h, w, 1) > 0.5).astype(np.float32)
    sup_mask = np.concatenate([fg, 1 - fg], -1)
    qry_img = rng.randn(b, q, h, w, 3).astype(np.float32)
    return sup_img, sup_mask, qry_img


def nchw(x):
    """[B, K, H, W, C] -> torch [B, K, C, H, W]."""
    return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()


def to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def init_ours(model, sup_img, sup_mask, qry_img, **kw):
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), **kw)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    return params, stats


def test_pemp_stage1_resnet50_forward_parity():
    """Flagship: dilated frozen-BN ResNet-50 + purifier (convs, ASPPV2)
    + meta-prototype module + cosine matching + align_corners resize
    (reference pemp_stage1.py:111-230, backbones.py:80-157, :324-369)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from convert_reference_ckpt import convert_trained
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = tm.TorchPEMPStage1(protos=3)
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng)
    model = PEMPStage1(backbone="resnet50", protos=3)
    params, stats = init_ours(model, sup_img, sup_mask, qry_img,
                              out_hw=(H, W))
    convert_trained("pemp_stage1", "resnet50", to_numpy_sd(ref),
                    params, stats)

    with jax.default_matmul_precision("highest"):
        ours, resp = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), ret_ind=True,
            train=False)
    ours = np.asarray(ours)                          # [B, Q, H, W, 2]
    resp = np.asarray(resp)                          # [B, Q, H, W]

    with torch.no_grad():
        want, want_resp = ref(nchw(sup_img), nchw(sup_mask),
                              nchw(qry_img), ret_ind=True)
    want = want.view(B, Q, 2, H, W).permute(0, 1, 3, 4, 2).numpy()
    want_resp = want_resp.view(B, Q, H, W).numpy()

    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=2e-4)
    # response maps are integer argmax labels: demand near-exact
    # agreement (ties at f32 can flip the odd pixel)
    assert (resp != want_resp).mean() < 0.01


def test_pemp_stage2_resnetcm_forward_parity():
    """Stage 2: 4-channel RGB+prior input, ResNetCM with episode
    communication modules, Dropout/ASPP purifier, mpm (reference
    pemp_stage2.py:42-230, backbones.py:160-276)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from convert_reference_ckpt import convert_trained
    from pemp_tpu.models.pemp_stage2 import PEMPStage2

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    ref = tm.TorchPEMPStage2(protos=3, spq=S + Q)
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng)
    qry_prior = (rng.rand(B, Q, H, W) > 0.5).astype(np.float32)
    model = PEMPStage2(backbone="resnet50", protos=3, spq=S + Q)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), jnp.asarray(qry_prior),
                           out_hw=(H, W))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    convert_trained("pemp_stage2", "resnet50", to_numpy_sd(ref),
                    params, stats)

    with jax.default_matmul_precision("highest"):
        ours = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), jnp.asarray(qry_prior),
            out_hw=(H, W), train=False)
    ours = np.asarray(ours)

    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                   torch.from_numpy(qry_prior).view(B * Q, 1, H, W))
    want = want.view(B, Q, 2, H, W).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=2e-4)


def test_rpmms_forward_parity():
    """RPMMs: separate support/query encoding, EM prototype mixtures with
    injected mu inits (same init shared by the fg and bg EM), residual
    3-scale pyramid (reference rpmms.py:144-287)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from convert_reference_ckpt import convert_trained
    from pemp_tpu.models.rpmms import RPMMs

    torch.manual_seed(4)
    rng = np.random.RandomState(4)
    mu_inits = []
    for k in (1, 3, 6):
        mu = (rng.randn(1, 256, k) * np.sqrt(2.0 / k)).astype(np.float32)
        mu = mu / (1e-6 + np.linalg.norm(mu, axis=1, keepdims=True))
        mu_inits.append(mu.astype(np.float32))
    ref = tm.TorchRPMMs([torch.from_numpy(m) for m in mu_inits])
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng)
    model = RPMMs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "pmm": jax.random.PRNGKey(1)},
        jnp.asarray(sup_img), jnp.asarray(sup_mask), jnp.asarray(qry_img),
        out_hw=None)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    convert_trained("rpmms", "resnet50", to_numpy_sd(ref), params, stats)

    with jax.default_matmul_precision("highest"):
        ours = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=None, train=False,
            mu_init=[jnp.asarray(m) for m in mu_inits],
            rngs={"pmm": jax.random.PRNGKey(2)})
    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))

    assert len(ours) == len(want) == 3
    for got_k, want_k in zip(ours, want):
        got_k = np.asarray(got_k)                 # [B, Q, h, w, 2]
        b, q, h, w, _ = got_k.shape
        want_k = want_k.view(b, q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
        np.testing.assert_allclose(got_k, want_k, rtol=1e-3, atol=3e-4)


def test_pfenet_forward_parity():
    """PFENet: deep-base ResNet-v2 frozen trunk, masked layer-4 re-run,
    training-free prior, enrichment pyramid with alpha convs and
    per-scale aux heads (reference pfenet.py:52-287). Bins (8, 4, 3)
    exercise both the upsampling and non-divisible adaptive-pool paths."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from convert_reference_ckpt import convert_trained
    from pemp_tpu.models.pfenet import PFENet

    torch.manual_seed(5)
    rng = np.random.RandomState(5)
    bins = (8, 4, 3)
    ref = tm.TorchPFENet(shot=1, pyramid_bins=bins)
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng)
    model = PFENet(shot=1, ppm_scales=bins)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(H, W))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    convert_trained("pfenet", "resnet50v2", to_numpy_sd(ref),
                    params, stats)

    with jax.default_matmul_precision("highest"):
        ours, aux = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), train=False)
    ours = np.asarray(ours)

    with torch.no_grad():
        want, want_aux = ref(nchw(sup_img), nchw(sup_mask),
                             nchw(qry_img))
    want = want.view(B, Q, 2, H, W).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=3e-4)

    assert len(aux) == len(want_aux) == len(bins)
    for got_a, want_a in zip(aux, want_aux):
        want_a = want_a.view(B, Q, 2, H, W).permute(0, 1, 3, 4, 2).numpy()
        np.testing.assert_allclose(np.asarray(got_a), want_a,
                                   rtol=1e-3, atol=3e-4)


def test_panet_vgg16_forward_and_align_loss_parity():
    """PANet: baseline prototypes + the prototype-alignment auxiliary
    loss (reference panet.py:85-194)."""
    from pemp_tpu.models.panet import PANet
    from pemp_tpu.utils import torch_convert as tc

    torch.manual_seed(2)
    rng = np.random.RandomState(2)
    ref = tm.TorchPANet()
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng)
    model = PANet(backbone="vgg16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(H, W))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tc.convert_vgg16(tm.vgg16_torchvision_sd(ref.encoder), params)

    with jax.default_matmul_precision("highest"):
        ours, align = model.apply(
            {"params": params}, jnp.asarray(sup_img),
            jnp.asarray(sup_mask), jnp.asarray(qry_img),
            out_hw=(H, W), train=False)
    ours, align = np.asarray(ours), float(align)

    with torch.no_grad():
        want, want_align = ref(nchw(sup_img), nchw(sup_mask),
                               nchw(qry_img))
    want = want.view(B, Q, 2, H, W).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(align, float(want_align),
                               rtol=1e-4, atol=1e-5)


def test_canet_forward_parity():
    """CaNet: concat(layer2, layer3) features, dense comparison with the
    tiled support prototype, history-mask residual refinement + ASPP
    (reference canet.py:131-209)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    from convert_reference_ckpt import convert_trained
    from pemp_tpu.models.canet import CaNet

    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    ref = tm.TorchCaNet()
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng)
    h8 = w8 = 7                       # feature res for 49x49 inputs
    history = rng.rand(B, Q, h8, w8, 2).astype(np.float32)
    model = CaNet()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), jnp.asarray(history),
                           out_hw=(H, W))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    convert_trained("canet", "resnet50", to_numpy_sd(ref), params, stats)

    with jax.default_matmul_precision("highest"):
        ours = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), jnp.asarray(history),
            out_hw=(H, W), train=False)
    ours = np.asarray(ours)

    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                   torch.from_numpy(history).permute(0, 1, 4, 2, 3)
                   .contiguous())
    want = want.view(B, Q, 2, H, W).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=2e-4)
