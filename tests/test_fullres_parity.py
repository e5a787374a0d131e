"""Full-RESOLUTION torch parity for every family (VERDICT r4 next #1).

The r2-r4 parity suites prove semantic equivalence at 33-49 px; the
reference always runs at its preset resolutions (reference
data_kits/datasets.py:14-31 — 401x401 default; scripts/canet.sh 321,
scripts/pfenet.sh 473, scripts/rpmms.sh 481). Resolution-dependent
semantics — align-corners scale factors, dilated-conv borders,
max_pool_torch ceil_mode boundaries at 401, PFENet's (60,30,15,8)
pyramid against a 60x60 feature map at 473, the nearest-downsample mask
grid at 51/41/61 — are exercised ONLY at these shapes, so a bug there
would pass the toy-resolution suite and burn the +-0.2 mIoU real-data
budget. One slow-marked forward-logits case per family at its preset
shape (f32, eval mode, weights shared through the real checkpoint
converters), plus ONE full-resolution train-step gradient case for the
flagship (f64, cedt — the production loss, whose EDT weight grid is
itself resolution-dependent).

f32 tolerance note: at 401+ px the prototype poolings contract ~65x
more pixels than at 49 px, so the f32 cancellation floor rises
accordingly; gates are set ~2-5x looser than the toy-resolution suite
and each assert reports the observed max error for future tightening.
"""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
from convert_reference_ckpt import convert_trained  # noqa: E402

from pemp_tpu.core import losses as loss_lib  # noqa: E402
from pemp_tpu.core import solver  # noqa: E402
from tests import torch_mirrors as tm  # noqa: E402

pytestmark = pytest.mark.slow

B, S, Q = 1, 1, 1


def episode(rng, h, w, dtype=np.float32):
    sup_img = rng.randn(B, S, h, w, 3).astype(dtype)
    fg = (rng.rand(B, S, h, w, 1) > 0.5).astype(dtype)
    sup_mask = np.concatenate([fg, 1 - fg], -1)
    qry_img = rng.randn(B, Q, h, w, 3).astype(dtype)
    return sup_img, sup_mask, qry_img


def nchw(x):
    return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()


def to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def init_and_convert(model, family, backbone, ref, init_args, init_kwargs):
    variables = model.init({"params": jax.random.PRNGKey(0)}, *init_args,
                           **init_kwargs)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    convert_trained(family, backbone, to_numpy_sd(ref), params, stats)
    return params, stats


def assert_logits_close(got, want, rtol, atol, what):
    """allclose with an error report that records the observed floor
    (so future rounds can tighten the gates from data, not guesses)."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    adiff = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-12)
    msg = (f"{what}: max abs {adiff.max():.3e}, "
           f"max rel {(adiff / denom).max():.3e} "
           f"(logit scale ~{np.abs(want).max():.1f})")
    ok = adiff <= atol + rtol * np.abs(want)
    assert ok.all(), msg + f"; {100 * (~ok).mean():.4f}% of pixels out"


def test_fullres_baseline_r50_401():
    """Baseline r50 @401 (reference data_kits/datasets.py:14 default):
    upsample-to-mask-size pooling vs our adjoint form at the REAL 401
    grid (align_corners 400/50 scale factor), cosine matching, 401
    output resize."""
    from pemp_tpu.models.baseline import Baseline

    h = w = 401
    torch.manual_seed(20)
    rng = np.random.RandomState(20)
    ref = tm.TorchBaselineR50()
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
    model = Baseline(backbone="resnet50")
    params, stats = init_and_convert(
        model, "baseline", "resnet50", ref,
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (h, w)})

    with jax.default_matmul_precision("highest"):
        ours = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(h, w),
                           train=False)
    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    want = want.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    assert_logits_close(ours, want, 2e-3, 5e-4, "baseline@401")


def test_fullres_pemp_stage1_401():
    """Flagship PEMP-s1 r50 @401: dilated-conv borders, the 51x51
    nearest-downsampled mask grid (401 -> ceil((401-1)/8+1)), mpm over
    2601 positions, align-corners 401 resize (reference
    pemp_stage1.py:111-230)."""
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    h = w = 401
    torch.manual_seed(21)
    rng = np.random.RandomState(21)
    ref = tm.TorchPEMPStage1(protos=3)
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
    model = PEMPStage1(backbone="resnet50", protos=3)
    params, stats = init_and_convert(
        model, "pemp_stage1", "resnet50", ref,
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (h, w)})

    with jax.default_matmul_precision("highest"):
        ours = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(h, w),
                           train=False)
    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    want = want.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    assert_logits_close(ours, want, 2e-3, 5e-4, "pemp_stage1@401")


def test_fullres_pemp_stage2_401():
    """Stage 2 ResNetCM @401: 4-channel RGB+prior stem at the real
    resolution, episode communication pooling over 51x51 features
    (reference pemp_stage2.py:42-230)."""
    from pemp_tpu.models.pemp_stage2 import PEMPStage2

    h = w = 401
    torch.manual_seed(22)
    rng = np.random.RandomState(22)
    ref = tm.TorchPEMPStage2(protos=3, spq=S + Q)
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
    qry_prior = (rng.rand(B, Q, h, w) > 0.5).astype(np.float32)
    model = PEMPStage2(backbone="resnet50", protos=3, spq=S + Q)
    params, stats = init_and_convert(
        model, "pemp_stage2", "resnet50", ref,
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img), jnp.asarray(qry_prior)),
        {"out_hw": (h, w)})

    with jax.default_matmul_precision("highest"):
        ours = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), jnp.asarray(qry_prior),
                           out_hw=(h, w), train=False)
    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                   torch.from_numpy(qry_prior).view(B * Q, 1, h, w))
    want = want.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    assert_logits_close(ours, want, 2e-3, 5e-4, "pemp_stage2@401")


def test_fullres_panet_vgg16_401():
    """PANet vgg16 @401 (reference scripts/panet.sh): full-resolution
    early-conv stack, prototype pooling over 160k mask pixels, align
    loss at the real grid (reference panet.py:85-194)."""
    from pemp_tpu.models.panet import PANet
    from pemp_tpu.utils import torch_convert as tc

    h = w = 401
    torch.manual_seed(23)
    rng = np.random.RandomState(23)
    ref = tm.TorchPANet()
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
    model = PANet(backbone="vgg16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(h, w))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tc.convert_vgg16(tm.vgg16_torchvision_sd(ref.encoder), params)

    with jax.default_matmul_precision("highest"):
        ours, align = model.apply(
            {"params": params}, jnp.asarray(sup_img),
            jnp.asarray(sup_mask), jnp.asarray(qry_img),
            out_hw=(h, w), train=False)
    with torch.no_grad():
        want, want_align = ref(nchw(sup_img), nchw(sup_mask),
                               nchw(qry_img))
    want = want.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    assert_logits_close(ours, want, 2e-3, 5e-4, "panet@401")
    # the align loss pseudo-labels are an ARGMAX over the query
    # prediction: at random init the fg/bg cosine margins cluster near
    # zero, so across 160k pixels hundreds of near-tie pixels flip
    # between frameworks and the align CE legitimately moves ~0.8%
    # (measured 0.7042 vs 0.7101 at f32; the 49px suite pins the same
    # math at rtol 1e-4 where tie density is negligible, and the logits
    # gate above stays tight)
    np.testing.assert_allclose(float(align), float(want_align),
                               rtol=2e-2)


def test_fullres_canet_321():
    """CaNet @321 (reference scripts/canet.sh): 41x41 feature/history
    grid ((321-1)//8+1), dense comparison + ASPP at the real scale,
    321 output resize (reference canet.py:131-209)."""
    from pemp_tpu.models.canet import CaNet

    h = w = 321
    torch.manual_seed(24)
    rng = np.random.RandomState(24)
    ref = tm.TorchCaNet()
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
    h8 = (h - 1) // 8 + 1
    history = rng.rand(B, Q, h8, h8, 2).astype(np.float32)
    model = CaNet()
    params, stats = init_and_convert(
        model, "canet", "resnet50", ref,
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img), jnp.asarray(history)), {"out_hw": (h, w)})

    with jax.default_matmul_precision("highest"):
        ours = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), jnp.asarray(history),
                           out_hw=(h, w), train=False)
    with torch.no_grad():
        want = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                   torch.from_numpy(history).permute(0, 1, 4, 2, 3)
                   .contiguous())
    want = want.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    assert_logits_close(ours, want, 2e-3, 5e-4, "canet@321")


def test_fullres_rpmms_481():
    """RPMMs @481 (reference scripts/rpmms.sh): EM mixtures over the
    61x61 feature grid (3721 positions — ~30x the toy case), residual
    k=1/3/6 pyramid at the real scale (reference rpmms.py:144-287)."""
    from pemp_tpu.models.rpmms import RPMMs

    h = w = 481
    torch.manual_seed(25)
    rng = np.random.RandomState(25)
    mu_inits = []
    for k in (1, 3, 6):
        mu = (rng.randn(1, 256, k) * np.sqrt(2.0 / k)).astype(np.float32)
        mu = mu / (1e-6 + np.linalg.norm(mu, axis=1, keepdims=True))
        mu_inits.append(mu.astype(np.float32))
    ref = tm.TorchRPMMs([torch.from_numpy(m) for m in mu_inits])
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
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
    for i, (got_k, want_k) in enumerate(zip(ours, want)):
        got_k = np.asarray(got_k)
        b, q, hh, ww, _ = got_k.shape
        want_k = want_k.view(b, q, 2, hh, ww) \
            .permute(0, 1, 3, 4, 2).numpy()
        # EM amplifies f32 reassociation (iterated normalized softmax
        # assignments over 3721 positions): keep a rel gate with a
        # slightly looser atol than the single-pass families
        assert_logits_close(got_k, want_k, 3e-3, 2e-3,
                            f"rpmms@481 scale{i}")


def test_fullres_pfenet_473():
    """PFENet @473 (reference scripts/pfenet.sh): the production
    (60, 30, 15, 8) pyramid against its REAL 60x60 feature map — bin 60
    is the identity-size adaptive pool, 30/15/8 the non-divisible
    rounding paths VERDICT flagged — plus the training-free prior and
    473 aux/main resizes (reference pfenet.py:52-287)."""
    from pemp_tpu.models.pfenet import PFENet

    h = w = 473
    torch.manual_seed(26)
    rng = np.random.RandomState(26)
    bins = (60, 30, 15, 8)
    ref = tm.TorchPFENet(shot=1, pyramid_bins=bins)
    tm.randomize_all_bns(ref, rng)
    ref.eval()

    sup_img, sup_mask, qry_img = episode(rng, h, w)
    model = PFENet(shot=1, ppm_scales=bins)
    params, stats = init_and_convert(
        model, "pfenet", "resnet50v2", ref,
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (h, w)})

    with jax.default_matmul_precision("highest"):
        ours, aux = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(h, w), train=False)
    with torch.no_grad():
        want, want_aux = ref(nchw(sup_img), nchw(sup_mask),
                             nchw(qry_img))
    want = want.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    assert_logits_close(ours, want, 2e-3, 1e-3, "pfenet@473")

    assert len(aux) == len(want_aux) == len(bins)
    for i, (got_a, want_a) in enumerate(zip(aux, want_aux)):
        want_a = want_a.view(B, Q, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
        assert_logits_close(got_a, want_a, 2e-3, 1e-3,
                            f"pfenet@473 aux{i}")


def test_fullres_pemp_stage1_train_step_401():
    """Flagship TRAIN-step parity at the production shape (VERDICT r4
    next #1's second half): cedt gradients on EVERY leaf at 401 — the
    EDT weight grid, the align-corners 401 resize backward, and the
    51x51 mask downsample all at their real sizes — plus the BN
    running-stat update and one clipped SGD(momentum, wd) step. f64 on
    both sides (the f32 grad comparison floor is chaos, not semantics —
    see tests/test_train_parity.py module docstring); rel gate 1e-6
    (~10x the toy-resolution suite for the 65x larger reductions)."""
    from flax import traverse_util

    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    h = w = 401
    sigma, lr, rel = 5.0, 0.025, 1e-6
    jax.config.update("jax_enable_x64", True)
    try:
        torch.manual_seed(27)
        rng = np.random.RandomState(27)
        ref = tm.TorchPEMPStage1(protos=3)
        tm.randomize_all_bns(ref, rng)
        ref.train()

        sup_img, sup_mask, qry_img = episode(rng, h, w, np.float64)
        labels = rng.randint(0, 2, (B * Q, h, w)).astype(np.int32)
        labels[:, :40, :56] = 255
        model = PEMPStage1(backbone="resnet50", protos=3, drop_rate=0.0,
                           dtype=jnp.float64)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(sup_img),
            jnp.asarray(sup_mask), jnp.asarray(qry_img), out_hw=(h, w))
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        stats = jax.tree_util.tree_map(np.asarray,
                                       variables["batch_stats"])
        convert_trained("pemp_stage1", "resnet50", to_numpy_sd(ref),
                        params, stats)
        ref.double()
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), params)
        stats = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), stats)

        labels_j = jnp.asarray(labels)
        labels_t = torch.from_numpy(labels.astype(np.int64))

        def run_loss(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats},
                jnp.asarray(sup_img), jnp.asarray(sup_mask),
                jnp.asarray(qry_img), out_hw=(h, w), train=True,
                mutable=["batch_stats"])
            loss = loss_lib.cedt(out.reshape(B * Q, h, w, 2), labels_j,
                                 sigma)
            return loss, mut["batch_stats"]

        with jax.default_matmul_precision("highest"):
            (loss, new_stats), grads = jax.value_and_grad(
                run_loss, has_aux=True)(params)

        out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
        sd_after_fwd = to_numpy_sd(ref)

        from scipy.ndimage import distance_transform_edt
        pix = F.cross_entropy(out_t, labels_t, ignore_index=255,
                              reduction="none")
        mask = (labels_t == 1).double().unsqueeze(1)
        kernel = torch.ones(1, 1, 3, 3, dtype=torch.float64)
        conv = F.conv2d(mask, kernel, padding=1)
        boundary = (torch.clamp(conv, 0, 1) - mask
                    + mask - torch.clamp(conv - 8, 0, 1)).squeeze(1)
        bb = np.around(boundary.detach().numpy()).astype(bool)
        edt = np.stack([distance_transform_edt(~b) for b in bb])
        weight = torch.from_numpy(np.exp(-edt / sigma ** 2) + 1)
        tl = (pix * weight).sum() / weight.sum()
        tl.backward()
        np.testing.assert_allclose(float(loss), float(tl.detach()),
                                   rtol=1e-9)

        def torch_to_trees(sd):
            p64 = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, np.float64), params)
            s64 = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, np.float64), stats)
            convert_trained("pemp_stage1", "resnet50", sd, p64, s64)
            return p64, s64

        def grad_sd():
            out = {}
            named = dict(ref.named_parameters())
            for k, v in ref.state_dict().items():
                p = named.get(k)
                out[k] = (p.grad.detach().numpy()
                          if p is not None and p.grad is not None
                          else np.zeros(v.shape, np.float64))
            return out

        def assert_tree_close(got, want, what):
            gf = traverse_util.flatten_dict(got)
            wf = traverse_util.flatten_dict(want)
            assert set(gf) == set(wf)
            bad = []
            for k in sorted(wf):
                g = np.asarray(gf[k], np.float64)
                wv = np.asarray(wf[k], np.float64)
                scale = max(np.abs(wv).max(), np.abs(g).max(), 1e-10)
                err = np.abs(g - wv).max() / scale
                if err > rel:
                    bad.append(("/".join(map(str, k)), float(err)))
            assert not bad, \
                f"{what} mismatch on {len(bad)} leaves: {bad[:8]}"

        want_g, _ = torch_to_trees(grad_sd())
        assert_tree_close(grads, want_g, "cedt-grad@401")
        _, want_stats = torch_to_trees(sd_after_fwd)
        assert_tree_close(jax.tree_util.tree_map(np.asarray, new_stats),
                          want_stats, "batch-stats@401")

        # one clipped SGD step, reference semantics (torch clip eps)
        frozen = PEMPStage1.FROZEN["resnet50"]
        import re
        regs = [re.compile(p.replace("/", ".").replace(
            "^backbone.", r"encoder\.")) for p in frozen]
        for name, p in ref.named_parameters():
            tname = name.replace("encoder.backbone.", "backbone.") \
                .replace("downsample.1", "downsample_bn")
            if any(r.search(tname) for r in regs):
                p.requires_grad = False
        ref.zero_grad()
        out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
        pix = F.cross_entropy(out_t, labels_t, ignore_index=255,
                              reduction="none")
        ((pix * weight).sum() / weight.sum()).backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.1)
        opt = torch.optim.SGD(
            [p for p in ref.parameters() if p.requires_grad], lr,
            momentum=0.9, weight_decay=5e-4)
        opt.step()

        tr_cfg = SimpleNamespace(
            opt="sgd", sgd_momentum=0.9, sgd_nesterov=False,
            weight_decay=5e-4, grad_clip=1.1, adam_beta1=0.9,
            adam_beta2=0.999, adam_epsilon=1e-8)
        tx = solver.make_optimizer(
            tr_cfg, solver.trainable_mask(params, frozen))
        updates, _ = tx.update(grads, tx.init(params), params)
        new_params = solver.apply_updates(
            jax.tree_util.tree_map(jnp.asarray, params), updates, lr)
        want_p, _ = torch_to_trees(to_numpy_sd(ref))
        assert_tree_close(
            jax.tree_util.tree_map(np.asarray, new_params), want_p,
            "sgd-step@401")
    finally:
        jax.config.update("jax_enable_x64", False)
