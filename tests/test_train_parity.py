"""Whole-model TRAIN-mode gradient parity vs torch mirrors (round-2
VERDICT item 1): the reference's trickiest semantic is frozen BN using
*batch statistics in train mode* with frozen affine params (reference
networks/backbones.py:56-62,93-95) — forward-parity tests (eval mode,
no-grad) cannot catch a training-dynamics divergence.

Per family (flagship PEMP-s1 r50, stage-2 ResNetCM, PANet align loss,
RPMMs injected-mu EM): shared weights via the real checkpoint converter,
train-mode forward (DropBlock/Dropout rates set to 0 — the mirrors carry
Identity in those slots), loss = ce AND cedt (stage-1), then jax.grad
compared against torch autograd on EVERY leaf, the BN running-stat
update (torch momentum 0.1, unbiased batch var) checked against the
mutated batch_stats, and one full SGD step (momentum 0.9, wd 5e-4,
clip_grad_norm 1.1 over trainable grads — reference
core/base_trainer.py:58-63) compared on the updated params.

Both sides run in FLOAT64 (torch ``.double()``, jax x64 via an autouse
fixture; the models take ``dtype=jnp.float64`` and the compute path
preserves it through ``f32up``). This is deliberate: at f32 the
comparison floor is set by chaotic cancellation, not semantics — on this
very configuration torch's own f32 grads sit ~1e-2 (max-rel) away from
its f64 grads, and a batch permutation moves either framework's f32
grads by the same amount. At f64 the floor collapses to ~1e-10 and the
test becomes a real semantic-equivalence statement at rel 1e-7.

Torch grads are mapped into our tree layout by running the gradient
state_dict through the SAME converter that maps checkpoints: every
mapping is a pure layout permutation (transpose/reshape), which commutes
with d/dθ.
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
from flax import traverse_util

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
from convert_reference_ckpt import convert_trained  # noqa: E402

from pemp_tpu.core import losses as loss_lib  # noqa: E402
from pemp_tpu.core import solver  # noqa: E402
from tests import torch_mirrors as tm  # noqa: E402

H = W = 49
B, S, Q = 2, 1, 1
SIGMA = 5.0
LR = 0.025
REL = 1e-7

TR_CFG = SimpleNamespace(opt="sgd", sgd_momentum=0.9, sgd_nesterov=False,
                         weight_decay=5e-4, grad_clip=1.1,
                         adam_beta1=0.9, adam_beta2=0.999,
                         adam_epsilon=1e-8)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def episode(rng):
    sup_img = rng.randn(B, S, H, W, 3).astype(np.float64)
    fg = (rng.rand(B, S, H, W, 1) > 0.5).astype(np.float64)
    sup_mask = np.concatenate([fg, 1 - fg], -1)
    qry_img = rng.randn(B, Q, H, W, 3).astype(np.float64)
    return sup_img, sup_mask, qry_img


def make_labels(rng, ignore=True):
    labels = rng.randint(0, 2, (B * Q, H, W)).astype(np.int32)
    if ignore:
        labels[:, :5, :7] = 255
    return labels


def nchw(x):
    return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()


def to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def grad_sd(model):
    """state_dict-shaped dict of .grad (zeros where grad is None)."""
    out = {}
    params = dict(model.named_parameters())
    for k, v in model.state_dict().items():
        p = params.get(k)
        if p is not None and p.grad is not None:
            out[k] = p.grad.detach().numpy()
        else:
            out[k] = np.zeros(v.shape, np.float64)
    return out


def torch_to_trees(family, backbone, sd, params, stats):
    """Map a torch state_dict-shaped dict into (params, stats)-shaped
    trees via the checkpoint converter (pure layout permutation). The
    converter stores f32; recover f64 by re-running its transposes is
    unnecessary — instead keep f64 by patching the values back in."""
    p64 = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, np.float64), params)
    s64 = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, np.float64), stats)
    convert_trained(family, backbone, sd, p64, s64)
    return p64, s64


def torch_cedt(logits_nchw, labels_t, sigma=SIGMA):
    """Differentiable reference CELossDT (core/losses.py:17-44); the EDT
    weight is a constant wrt the logits on both sides."""
    from scipy.ndimage import distance_transform_edt
    pix = F.cross_entropy(logits_nchw, labels_t, ignore_index=255,
                          reduction="none")
    mask = (labels_t == 1).double().unsqueeze(1)
    kernel = torch.ones(1, 1, 3, 3, dtype=torch.float64)
    conv = F.conv2d(mask, kernel, padding=1)
    boundary = (torch.clamp(conv, 0, 1) - mask
                + mask - torch.clamp(conv - 8, 0, 1)).squeeze(1)
    bb = np.around(boundary.detach().numpy()).astype(bool)
    edt = np.stack([distance_transform_edt(~b) for b in bb])
    weight = torch.from_numpy(np.exp(-edt / sigma ** 2) + 1)
    return (pix * weight).sum() / weight.sum()


def assert_tree_close(got, want, rel=REL, what="grad"):
    """Per-leaf max-abs error relative to the leaf's scale."""
    gf = traverse_util.flatten_dict(got)
    wf = traverse_util.flatten_dict(want)
    assert set(gf) == set(wf)
    bad = []
    for k in sorted(wf):
        g, w = np.asarray(gf[k], np.float64), np.asarray(wf[k], np.float64)
        scale = max(np.abs(w).max(), np.abs(g).max(), 1e-10)
        err = np.abs(g - w).max() / scale
        if err > rel:
            bad.append(("/".join(map(str, k)), float(err)))
    assert not bad, f"{what} mismatch on {len(bad)} leaves: {bad[:8]}"


def freeze_torch(model, patterns):
    """requires_grad=False on params whose reference-layout name matches
    any of our FROZEN regexes translated to torch naming (dots)."""
    import re
    regs = [re.compile(p.replace("/", ".").replace("^backbone.",
                                                   r"encoder\."))
            for p in patterns]
    for name, p in model.named_parameters():
        tname = name.replace("encoder.backbone.", "backbone.")
        # reference downsample BNs live at Sequential index 1 ("no 'bn'
        # in the name") but ARE frozen (reference backbones.py:113-115)
        tname = tname.replace("downsample.1", "downsample_bn")
        if any(r.search(tname) for r in regs):
            p.requires_grad = False


def to_f64(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64), tree)


def jax_sgd_step(params, grads, mask_patterns):
    mask = solver.trainable_mask(params, mask_patterns)
    tx = solver.make_optimizer(TR_CFG, mask)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    return solver.apply_updates(
        jax.tree_util.tree_map(jnp.asarray, params), updates, LR)


def setup_trees(model, ref, family, backbone, init_args, init_kwargs):
    """Init our variables, load the torch mirror's (f32) weights through
    the converter, then promote BOTH sides to f64."""
    variables = model.init({"params": jax.random.PRNGKey(0)}, *init_args,
                           **init_kwargs)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    convert_trained(family, backbone, to_numpy_sd(ref), params, stats)
    ref.double()
    return to_f64(params), to_f64(stats)


def test_pemp_stage1_train_grad_and_step_parity():
    """PEMP-s1 r50: train-mode ce + cedt gradient parity on every leaf
    (frozen-BN batch statistics, purifier BNs, ctr, cosine matching,
    align_corners resize backward), BN running-stat update parity, and
    one clipped SGD(momentum, wd) step (reference base_trainer.py:55-66,
    solver.py:85-91)."""
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    torch.manual_seed(10)
    rng = np.random.RandomState(10)
    ref = tm.TorchPEMPStage1(protos=3)
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    labels = make_labels(rng)
    model = PEMPStage1(backbone="resnet50", protos=3, drop_rate=0.0,
                       dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "pemp_stage1", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (H, W)})

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p, kind):
        out, mut = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), train=True,
            mutable=["batch_stats"])
        lg = out.reshape(B * Q, H, W, 2)
        loss = (loss_lib.cross_entropy(lg, labels_j) if kind == "ce"
                else loss_lib.cedt(lg, labels_j, SIGMA))
        return loss, mut["batch_stats"]

    with jax.default_matmul_precision("highest"):
        (loss_ce, new_stats), grads_ce = jax.value_and_grad(
            run_loss, has_aux=True)(params, "ce")
        (loss_dt, _), grads_dt = jax.value_and_grad(
            run_loss, has_aux=True)(params, "cedt")

    # --- torch ce pass (also snapshots the BN running-stat update) ------
    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    sd_after_fwd = to_numpy_sd(ref)         # running stats updated once
    tl_ce = F.cross_entropy(out_t, labels_t, ignore_index=255)
    tl_ce.backward()
    np.testing.assert_allclose(float(loss_ce), float(tl_ce.detach()),
                               rtol=1e-9)
    want_ce, _ = torch_to_trees("pemp_stage1", "resnet50", grad_sd(ref),
                                params, stats)
    assert_tree_close(grads_ce, want_ce, what="ce-grad")

    # running stats: torch momentum 0.1 with UNBIASED batch var
    _, want_stats = torch_to_trees("pemp_stage1", "resnet50",
                                   sd_after_fwd, params, stats)
    assert_tree_close(jax.tree_util.tree_map(np.asarray, new_stats),
                      want_stats, what="batch-stats")

    # --- torch cedt pass ------------------------------------------------
    ref.zero_grad()
    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    tl_dt = torch_cedt(out_t, labels_t)
    tl_dt.backward()
    np.testing.assert_allclose(float(loss_dt), float(tl_dt.detach()),
                               rtol=1e-9)
    want_dt, _ = torch_to_trees("pemp_stage1", "resnet50", grad_sd(ref),
                                params, stats)
    assert_tree_close(grads_dt, want_dt, what="cedt-grad")

    # --- one SGD step, reference semantics ------------------------------
    # torch: freeze backbone BN affine, fresh cedt backward, clip over
    # trainable grads, SGD(momentum 0.9, wd 5e-4)
    frozen = PEMPStage1.FROZEN["resnet50"]
    freeze_torch(ref, frozen)
    ref.zero_grad()
    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    torch_cedt(out_t, labels_t).backward()
    torch.nn.utils.clip_grad_norm_(ref.parameters(), TR_CFG.grad_clip)
    opt = torch.optim.SGD(
        [p for p in ref.parameters() if p.requires_grad], LR,
        momentum=TR_CFG.sgd_momentum, weight_decay=TR_CFG.weight_decay)
    opt.step()

    new_params = jax_sgd_step(params, grads_dt, frozen)
    want_params, _ = torch_to_trees("pemp_stage1", "resnet50",
                                    to_numpy_sd(ref), params, stats)
    assert_tree_close(jax.tree_util.tree_map(np.asarray, new_params),
                      want_params, what="sgd-step")


def test_pemp_stage2_train_grad_parity():
    """Stage 2 ResNetCM: episode communication modules (pooled linears)
    and the 4-channel prior input on the cedt backward path (reference
    pemp_stage2.py:42-230, backbones.py:160-276)."""
    from pemp_tpu.models.pemp_stage2 import PEMPStage2

    torch.manual_seed(11)
    rng = np.random.RandomState(11)
    ref = tm.TorchPEMPStage2(protos=3, spq=S + Q)
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    qry_prior = (rng.rand(B, Q, H, W) > 0.5).astype(np.float64)
    labels = make_labels(rng)
    model = PEMPStage2(backbone="resnet50", protos=3, spq=S + Q,
                       drop_rate=0.0, dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "pemp_stage2", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img), jnp.asarray(qry_prior)),
        {"out_hw": (H, W)})

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), jnp.asarray(qry_prior),
            out_hw=(H, W), train=True, mutable=["batch_stats"])
        return loss_lib.cedt(out.reshape(B * Q, H, W, 2), labels_j, SIGMA)

    with jax.default_matmul_precision("highest"):
        loss, grads = jax.value_and_grad(run_loss)(params)

    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                torch.from_numpy(qry_prior).view(B * Q, 1, H, W))
    tl = torch_cedt(out_t, labels_t)
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)
    want, _ = torch_to_trees("pemp_stage2", "resnet50", grad_sd(ref),
                             params, stats)
    assert_tree_close(grads, want, what="cedt-grad")


def test_panet_train_grad_parity():
    """PANet: CE(ignore 255) + alignment-branch CE — the align loss
    backpropagates through BOTH episode directions (reference
    panet.py:112-194)."""
    from pemp_tpu.models.panet import PANet
    from pemp_tpu.utils import torch_convert as tc

    torch.manual_seed(12)
    rng = np.random.RandomState(12)
    ref = tm.TorchPANet()
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    labels = make_labels(rng)
    coef = 1.0
    model = PANet(backbone="vgg16", dtype=jnp.float64)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(sup_img), jnp.asarray(sup_mask),
                           jnp.asarray(qry_img), out_hw=(H, W))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tc.convert_vgg16(tm.vgg16_torchvision_sd(ref.encoder), params)
    params = to_f64(params)
    ref.double()

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        logits, align = model.apply(
            {"params": p}, jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), train=True)
        main = loss_lib.cross_entropy(logits.reshape(B * Q, H, W, 2),
                                      labels_j)
        return main + coef * align

    with jax.default_matmul_precision("highest"):
        loss, grads = jax.value_and_grad(run_loss)(params)

    out_t, align_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    tl = F.cross_entropy(out_t, labels_t, ignore_index=255) \
        + coef * align_t
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)

    # encoder-only param tree: map the vgg grads the same way the
    # weights were mapped
    conv_idx = [i for i, m in enumerate(ref.encoder)
                if isinstance(m, torch.nn.Conv2d)]
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    gsd = {}
    for tvi, i in zip(tv_idx, conv_idx):
        gsd[f"features.{tvi}.weight"] = \
            ref.encoder[i].weight.grad.detach().numpy()
        gsd[f"features.{tvi}.bias"] = \
            ref.encoder[i].bias.grad.detach().numpy()
    want = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, np.float64), params)
    tc.convert_vgg16(gsd, want)
    assert_tree_close(grads, want, what="panet-grad")


def test_rpmms_train_grad_parity():
    """RPMMs: gradients through 10 EM iterations (kappa-20 softmax),
    the residual pyramid, and the 3-term upsampled CE (reference
    rpmms.py:144-311); support/query encoded in separate train-mode BN
    batches."""
    from pemp_tpu.models.common import output_resize
    from pemp_tpu.models.rpmms import RPMMs

    torch.manual_seed(13)
    rng = np.random.RandomState(13)
    mu_inits = []
    for k in (1, 3, 6):
        mu = (rng.randn(1, 256, k) * np.sqrt(2.0 / k)).astype(np.float32)
        mu = mu / (1e-6 + np.linalg.norm(mu, axis=1, keepdims=True))
        mu_inits.append(mu.astype(np.float64))
    # plain-attribute mu tensors are not touched by .double(): pass f64
    ref = tm.TorchRPMMs([torch.from_numpy(m) for m in mu_inits])
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    labels = make_labels(rng, ignore=False)
    model = RPMMs(drop_rate=0.0, dtype=jnp.float64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "pmm": jax.random.PRNGKey(1)},
        jnp.asarray(sup_img), jnp.asarray(sup_mask), jnp.asarray(qry_img),
        out_hw=None)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    convert_trained("rpmms", "resnet50", to_numpy_sd(ref), params, stats)
    params, stats = to_f64(params), to_f64(stats)
    ref.double()

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        outs, mut = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=None, train=True,
            mu_init=[jnp.asarray(m) for m in mu_inits],
            rngs={"pmm": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        ups = [output_resize(o, (H, W)) for o in outs]
        total, _, _ = loss_lib.rpmms_loss(ups, labels_j)
        return total

    with jax.default_matmul_precision("highest"):
        loss, grads = jax.value_and_grad(run_loss)(params)

    outs_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    tl = sum(
        F.cross_entropy(
            F.interpolate(o, (H, W), mode="bilinear", align_corners=True),
            labels_t)
        for o in outs_t)
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)
    want, _ = torch_to_trees("rpmms", "resnet50", grad_sd(ref),
                             params, stats)
    assert_tree_close(grads, want, what="rpmms-grad")


def test_canet_train_grad_parity():
    """CaNet: dense-comparison head + history-residual refinement + ASPP
    on the CE(ignore 255) backward path, train-mode BN batch statistics
    throughout (reference canet.py:131-209)."""
    from pemp_tpu.models.canet import CaNet

    torch.manual_seed(14)
    rng = np.random.RandomState(14)
    ref = tm.TorchCaNet()
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    h8 = w8 = 7                                  # feature res for 49x49
    history = rng.rand(B, Q, h8, w8, 2).astype(np.float64)
    labels = make_labels(rng)
    model = CaNet(drop_rate=0.0, dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "canet", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img), jnp.asarray(history)), {"out_hw": (H, W)})

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), jnp.asarray(history),
            out_hw=(H, W), train=True, mutable=["batch_stats"])
        return loss_lib.cross_entropy(out.reshape(B * Q, H, W, 2),
                                      labels_j)

    with jax.default_matmul_precision("highest"):
        loss, grads = jax.value_and_grad(run_loss)(params)

    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                torch.from_numpy(history).permute(0, 1, 4, 2, 3)
                .contiguous())
    tl = F.cross_entropy(out_t, labels_t, ignore_index=255)
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)
    want, _ = torch_to_trees("canet", "resnet50", grad_sd(ref),
                             params, stats)
    assert_tree_close(grads, want, what="canet-grad")


def test_pfenet_train_grad_parity():
    """PFENet: stop-gradded frozen trunk (grads must be EXACTLY zero on
    every backbone leaf), training-free prior, enrichment pyramid, and
    main CE + mean per-scale aux CE backward (reference pfenet.py:169-174,
    :276-284)."""
    from flax import traverse_util as tu

    from pemp_tpu.models.pfenet import PFENet

    torch.manual_seed(15)
    rng = np.random.RandomState(15)
    bins = (8, 4, 3)
    ref = tm.TorchPFENet(shot=1, pyramid_bins=bins)
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    labels = make_labels(rng)
    model = PFENet(shot=1, ppm_scales=bins, drop_rates=(0.0, 0.0),
                   dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "pfenet", "resnet50v2",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (H, W)})

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        (out, aux), mut = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), train=True,
            mutable=["batch_stats"])
        main = loss_lib.cross_entropy(out.reshape(B * Q, H, W, 2),
                                      labels_j)
        aux_l = loss_lib.pfenet_aux_loss(list(aux), labels_j)
        return main + aux_l

    with jax.default_matmul_precision("highest"):
        loss, grads = jax.value_and_grad(run_loss)(params)

    out_t, aux_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    tl = F.cross_entropy(out_t, labels_t, ignore_index=255) \
        + sum(F.cross_entropy(a, labels_t, ignore_index=255)
              for a in aux_t) / len(aux_t)
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)

    # the stop_gradient trunk: backbone grads exactly zero
    for k, g in tu.flatten_dict(grads).items():
        if k[0] == "backbone":
            assert np.all(np.asarray(g) == 0.0), "/".join(map(str, k))

    want, _ = torch_to_trees("pfenet", "resnet50v2", grad_sd(ref),
                             params, stats)
    # 3e-7, not REL: the pyramid's inter-scale resizes (bins 8/4/3 over
    # 7x7 features) have non-dyadic ratios whose align-corners weights
    # are f32 constants in our matmul-form resize (ops/resize.py
    # _interp_matrix) vs torch's f64 interpolation — a deliberate shared
    # constant, bounded at ~1e-7. Every other family only hits exact
    # dyadic ratios (weights exact in f32), hence the tighter REL there.
    assert_tree_close(grads, want, rel=3e-7, what="pfenet-grad")


def test_baseline_train_grad_and_stats_parity():
    """Baseline r50 — the 7th family: the ADJOINT-form masked-average
    pooling (we contract original-resolution features against the
    down-projected mask; the reference upsamples features to mask size
    first, baseline.py:100) must be gradient-exact vs torch's literal
    upsample-then-pool, through frozen-BN batch statistics and the
    projection conv. Also checks the BN running-stat update and one
    clipped SGD step with the frozen-BN mask."""
    from pemp_tpu.models.baseline import Baseline

    torch.manual_seed(13)
    rng = np.random.RandomState(13)
    ref = tm.TorchBaselineR50()
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img, sup_mask, qry_img = episode(rng)
    labels = make_labels(rng)
    model = Baseline(backbone="resnet50", dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "baseline", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (H, W)})

    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        out, mut = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), train=True,
            mutable=["batch_stats"])
        loss = loss_lib.cross_entropy(out.reshape(B * Q, H, W, 2),
                                      labels_j)
        return loss, mut["batch_stats"]

    with jax.default_matmul_precision("highest"):
        (loss, new_stats), grads = jax.value_and_grad(
            run_loss, has_aux=True)(params)

    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    sd_after_fwd = to_numpy_sd(ref)
    tl = F.cross_entropy(out_t, labels_t, ignore_index=255)
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)
    want, _ = torch_to_trees("baseline", "resnet50", grad_sd(ref),
                             params, stats)
    assert_tree_close(grads, want, what="baseline-grad")

    _, want_stats = torch_to_trees("baseline", "resnet50", sd_after_fwd,
                                   params, stats)
    assert_tree_close(jax.tree_util.tree_map(np.asarray, new_stats),
                      want_stats, what="batch-stats")

    # one clipped SGD step under the frozen-BN mask
    frozen = Baseline.FROZEN["resnet50"]
    freeze_torch(ref, frozen)
    ref.zero_grad()
    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    F.cross_entropy(out_t, labels_t, ignore_index=255).backward()
    torch.nn.utils.clip_grad_norm_(ref.parameters(), TR_CFG.grad_clip)
    opt = torch.optim.SGD(
        [p for p in ref.parameters() if p.requires_grad], LR,
        momentum=TR_CFG.sgd_momentum, weight_decay=TR_CFG.weight_decay)
    opt.step()
    new_params = jax_sgd_step(params, grads, frozen)
    want_params, _ = torch_to_trees("baseline", "resnet50",
                                    to_numpy_sd(ref), params, stats)
    assert_tree_close(jax.tree_util.tree_map(np.asarray, new_params),
                      want_params, what="baseline-sgd-step")


def test_pemp_stage1_5shot_train_grad_parity():
    """5-shot (S=5) PEMP-s1 gradient parity: the shot-mean inside the
    meta-prototype extraction (reference pemp_stage1.py:208-211, mean
    over S AFTER the assignment-weighted average) backpropagates through
    every support image; the 1-shot tests never exercise that reduction.
    Closes the S=5 chain torch == jnp (here) == packed Pallas kernels
    (tests/test_pallas_kernels.py / on-chip suite tie pallas to jnp)."""
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    s = 5
    torch.manual_seed(11)
    rng = np.random.RandomState(11)
    ref = tm.TorchPEMPStage1(protos=3)
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img = rng.randn(B, s, H, W, 3).astype(np.float64)
    fg = (rng.rand(B, s, H, W, 1) > 0.5).astype(np.float64)
    sup_mask = np.concatenate([fg, 1 - fg], -1)
    qry_img = rng.randn(B, Q, H, W, 3).astype(np.float64)
    labels = make_labels(rng)

    model = PEMPStage1(backbone="resnet50", protos=3, drop_rate=0.0,
                       dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "pemp_stage1", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img)), {"out_hw": (H, W)})
    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), out_hw=(H, W), train=True,
            mutable=["batch_stats"])
        return loss_lib.cross_entropy(out.reshape(B * Q, H, W, 2),
                                      labels_j)

    with jax.default_matmul_precision("highest"):
        loss_ce, grads_ce = jax.value_and_grad(run_loss)(params)

    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img))
    tl_ce = F.cross_entropy(out_t, labels_t, ignore_index=255)
    tl_ce.backward()
    np.testing.assert_allclose(float(loss_ce), float(tl_ce.detach()),
                               rtol=1e-9)
    want_ce, _ = torch_to_trees("pemp_stage1", "resnet50", grad_sd(ref),
                                params, stats)
    assert_tree_close(grads_ce, want_ce, what="5shot-ce-grad")


def test_pemp_stage2_5shot_train_grad_parity():
    """5-shot stage 2 (spq=6): the communication modules pool
    prior-masked mean+max features over ALL S+Q=6 episode images
    (reference backbones.py:208-222) — at S=1 that mean couples only 2
    images, so the 6-image episode coupling and the per-support prior
    channels were untested in the backward. Every-leaf ce grads at f64."""
    from pemp_tpu.models.pemp_stage2 import PEMPStage2

    s = 5
    torch.manual_seed(12)
    rng = np.random.RandomState(12)
    ref = tm.TorchPEMPStage2(protos=3, spq=s + Q)
    tm.randomize_all_bns(ref, rng)
    ref.train()

    sup_img = rng.randn(B, s, H, W, 3).astype(np.float64)
    fg = (rng.rand(B, s, H, W, 1) > 0.5).astype(np.float64)
    sup_mask = np.concatenate([fg, 1 - fg], -1)
    qry_img = rng.randn(B, Q, H, W, 3).astype(np.float64)
    qry_prior = (rng.rand(B, Q, H, W) > 0.5).astype(np.float64)
    labels = make_labels(rng)

    model = PEMPStage2(backbone="resnet50", protos=3, spq=s + Q,
                       drop_rate=0.0, dtype=jnp.float64)
    params, stats = setup_trees(
        model, ref, "pemp_stage2", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img), jnp.asarray(qry_prior)),
        {"out_hw": (H, W)})
    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    def run_loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(sup_img), jnp.asarray(sup_mask),
            jnp.asarray(qry_img), jnp.asarray(qry_prior),
            out_hw=(H, W), train=True, mutable=["batch_stats"])
        return loss_lib.cross_entropy(out.reshape(B * Q, H, W, 2),
                                      labels_j)

    with jax.default_matmul_precision("highest"):
        loss, grads = jax.value_and_grad(run_loss)(params)

    out_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                torch.from_numpy(qry_prior).view(B * Q, 1, H, W))
    tl = F.cross_entropy(out_t, labels_t, ignore_index=255)
    tl.backward()
    np.testing.assert_allclose(float(loss), float(tl.detach()), rtol=1e-9)
    want, _ = torch_to_trees("pemp_stage2", "resnet50", grad_sd(ref),
                             params, stats)
    assert_tree_close(grads, want, what="5shot-ce-grad")


# ---------------------------------------------------------------------------
# N-step training-TRAJECTORY parity (VERDICT r3 #2): ~20 consecutive
# optimizer steps through BOTH full stacks — live LR schedule, BN running
# stats threading step to step, momentum buffers, cedt weights — then
# every leaf of params + momentum traces + batch_stats compared at the
# end. One-step parity (above) plus schedule unit tests made accumulated
# divergence unlikely; this demonstrates it absent.
# Reference loop semantics: core/base_trainer.py:183-234, solver.py:53-127.
# ---------------------------------------------------------------------------

N_STEPS = 20
TRAJ_REL = 1e-6


def _find_traces(opt_state):
    """Recursively collect optax TraceState.trace pytrees (the momentum
    buffers) from a (possibly multi_transform-nested) optimizer state."""
    import optax
    found = []

    def walk(s):
        if isinstance(s, optax.TraceState):
            found.append(s.trace)
            return
        if isinstance(s, dict):
            for v in s.values():
                walk(v)
            return
        if isinstance(s, (tuple, list)):
            for v in s:
                walk(v)
            return
        if hasattr(s, "_fields"):           # other NamedTuple states
            for f in s._fields:
                walk(getattr(s, f))
            return
        if hasattr(s, "inner_states"):      # MultiTransformState
            walk(s.inner_states)
            return
        if hasattr(s, "inner_state"):       # MaskedState
            walk(s.inner_state)

    walk(opt_state)
    assert len(found) == 1, f"expected one trace, found {len(found)}"
    return found[0]


def _torch_momentum_sd(ref, opt):
    """state_dict-shaped momentum buffers (zeros where absent)."""
    out = {}
    pdict = dict(ref.named_parameters())
    for k, v in ref.state_dict().items():
        p = pdict.get(k)
        buf = None
        if p is not None and p in opt.state:
            buf = opt.state[p].get("momentum_buffer")
        out[k] = (buf.detach().numpy() if buf is not None
                  else np.zeros(v.shape, np.float64))
    return out


def _assert_masked_close(got_tree, want_tree, mask, what):
    """Compare only trainable leaves (frozen params have no torch
    momentum buffer and optax stores MaskedNode there)."""
    gf = traverse_util.flatten_dict(got_tree)
    wf = traverse_util.flatten_dict(want_tree)
    mf = traverse_util.flatten_dict(mask)
    bad = []
    for k, trainable in mf.items():
        if not trainable:
            continue
        g = np.asarray(gf[k], np.float64)
        w = np.asarray(wf[k], np.float64)
        scale = max(np.abs(w).max(), np.abs(g).max(), 1e-10)
        err = np.abs(g - w).max() / scale
        if err > TRAJ_REL:
            bad.append(("/".join(map(str, k)), float(err)))
    assert not bad, f"{what} mismatch on {len(bad)} leaves: {bad[:8]}"


def _run_trajectory(model, ref, family, backbone, frozen, tr_cfg,
                    lr_fn, n_epochs, steps_per_epoch, loss_kind,
                    with_prior=False):
    """Drive N = n_epochs*steps_per_epoch consecutive steps through both
    stacks with fresh batches per step; returns everything needed for
    the end-state comparison. ``lr_fn(step, epoch)`` is the torch-side
    INDEPENDENT implementation of the reference schedule formula (our
    side uses the live LRPolicy)."""
    data_rng = np.random.RandomState(77)
    batches = []
    for _ in range(n_epochs * steps_per_epoch):
        sup_img, sup_mask, qry_img = episode(data_rng)
        prior = (data_rng.rand(B, Q, H, W) > 0.5).astype(np.float64)
        labels = make_labels(data_rng)
        batches.append((sup_img, sup_mask, qry_img, prior, labels))

    params, stats = setup_trees(
        model, ref, family, backbone,
        (jnp.asarray(batches[0][0]), jnp.asarray(batches[0][1]),
         jnp.asarray(batches[0][2]))
        + ((jnp.asarray(batches[0][3]),) if with_prior else ()),
        {"out_hw": (H, W)})

    tx, opt_state, lr_policy, mask = solver.get(
        tr_cfg, params, frozen, max_steps=len(batches))

    def loss_and_stats(p, st, sup, msk, qry, prior, labels_j):
        args = (jnp.asarray(sup), jnp.asarray(msk), jnp.asarray(qry)) \
            + ((jnp.asarray(prior),) if with_prior else ())
        out, mut = model.apply(
            {"params": p, "batch_stats": st}, *args, out_hw=(H, W),
            train=True, mutable=["batch_stats"])
        lg = out.reshape(B * Q, H, W, 2)
        loss = (loss_lib.cross_entropy(lg, labels_j)
                if loss_kind == "ce" else loss_lib.cedt(lg, labels_j,
                                                        SIGMA))
        return loss, mut["batch_stats"]

    grad_fn = jax.value_and_grad(loss_and_stats, has_aux=True)

    # --- torch mirror loop setup ---------------------------------------
    freeze_torch(ref, frozen)
    opt = torch.optim.SGD(
        [p for p in ref.parameters() if p.requires_grad], lr=1.0,
        momentum=tr_cfg.sgd_momentum, weight_decay=tr_cfg.weight_decay)

    our_losses, torch_losses = [], []
    step_i = 0
    with jax.default_matmul_precision("highest"):
        for epoch in range(n_epochs):
            for _ in range(steps_per_epoch):
                sup, msk, qry, prior, labels = batches[step_i]
                labels_j = jnp.asarray(labels)
                labels_t = torch.from_numpy(labels.astype(np.int64))

                # ours: the serial train-step composition (grad ->
                # tx.update -> apply_updates at the live schedule LR)
                (loss, new_stats), grads = grad_fn(
                    params, stats, sup, msk, qry, prior, labels_j)
                updates, opt_state = tx.update(updates=grads,
                                               state=opt_state,
                                               params=params)
                params = solver.apply_updates(params, updates,
                                              lr_policy.lr)
                stats = new_stats
                our_losses.append(float(loss))

                # torch: same batch, independent schedule formula
                opt.zero_grad(set_to_none=True)
                out_t = ref(*((nchw(sup), nchw(msk), nchw(qry))
                              + ((torch.from_numpy(prior)
                                  .view(B * Q, 1, H, W),)
                                 if with_prior else ())))
                tl = (F.cross_entropy(out_t, labels_t, ignore_index=255)
                      if loss_kind == "ce" else torch_cedt(out_t, labels_t))
                tl.backward()
                torch.nn.utils.clip_grad_norm_(ref.parameters(),
                                               tr_cfg.grad_clip)
                opt.param_groups[0]["lr"] = lr_fn(step_i, epoch)
                opt.step()
                torch_losses.append(float(tl.detach()))

                lr_policy.step_step()
                step_i += 1
            lr_policy.step_epoch()

    np.testing.assert_allclose(our_losses, torch_losses, rtol=TRAJ_REL)

    want_params, want_stats = torch_to_trees(
        family, backbone, to_numpy_sd(ref), params, stats)
    assert_tree_close(jax.tree_util.tree_map(np.asarray, params),
                      want_params, rel=TRAJ_REL,
                      what=f"{family}-trajectory-params")
    assert_tree_close(jax.tree_util.tree_map(np.asarray, stats),
                      want_stats, rel=TRAJ_REL,
                      what=f"{family}-trajectory-stats")
    want_mom, _ = torch_to_trees(
        family, backbone, _torch_momentum_sd(ref, opt), params, stats)
    _assert_masked_close(
        jax.tree_util.tree_map(np.asarray, _find_traces(opt_state)),
        want_mom, mask, what=f"{family}-trajectory-momentum")


@pytest.mark.slow
def test_pemp_stage1_20step_trajectory_parity():
    """PEMP-s1 r50, cedt, live POLY per-step schedule: 20 consecutive
    clipped SGD(momentum, wd) steps at f64 — final params, momentum
    buffers, BN running stats, and the per-step loss sequence all match
    torch at rel 1e-6 (reference base_trainer.py:183-234 loop with
    solver.py PolyLR :53-72)."""
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    torch.manual_seed(21)
    rng = np.random.RandomState(21)
    ref = tm.TorchPEMPStage1(protos=3)
    tm.randomize_all_bns(ref, rng)
    ref.train()
    model = PEMPStage1(backbone="resnet50", protos=3, drop_rate=0.0,
                       dtype=jnp.float64)

    tr_cfg = SimpleNamespace(
        opt="sgd", sgd_momentum=0.9, sgd_nesterov=False,
        weight_decay=5e-4, grad_clip=1.1, lr=LR, lrp="poly",
        power=0.9, lr_end=0.0,
        adam_beta1=0.9, adam_beta2=0.999, adam_epsilon=1e-8)

    def poly_lr(step, _epoch):
        # reference PolyLR (solver.py:53-72): step() at construction,
        # so the step-j LR uses t = j+1 (independent re-implementation)
        t = min(step + 1, N_STEPS)
        return (LR - 0.0) * (1 - t / N_STEPS) ** 0.9 + 0.0

    _run_trajectory(model, ref, "pemp_stage1", "resnet50",
                    PEMPStage1.FROZEN["resnet50"], tr_cfg, poly_lr,
                    n_epochs=1, steps_per_epoch=N_STEPS,
                    loss_kind="cedt")


@pytest.mark.slow
def test_canet_12step_history_feedback_trajectory_parity():
    """CaNet with the HISTORY FEEDBACK LOOP closed over steps: step j's
    feature-res softmax is step j+1's history input (the reference's
    write-back -> next-epoch read, entry/canet.py:77-80,137-140), with
    the trunk frozen (requires_grad=False vs our optax mask) while its
    BN running stats keep updating in train mode. 12 consecutive
    clipped SGD steps on one episode batch at f64; losses, final
    params, momentum, and batch stats at rel 1e-6 — a drift anywhere in
    the loop (softmax, resize, feedback plumbing) compounds through the
    history input and is amplified by the recurrence."""
    from pemp_tpu.models.canet import CaNet
    from pemp_tpu.models.common import output_resize

    torch.manual_seed(23)
    rng = np.random.RandomState(23)
    ref = tm.TorchCaNet()
    tm.randomize_all_bns(ref, rng)
    ref.train()
    model = CaNet(drop_rate=0.0, dtype=jnp.float64)

    sup_img, sup_mask, qry_img = episode(rng)
    labels = make_labels(rng)
    h8 = w8 = 7
    hist0 = np.zeros((B, Q, h8, w8, 2), np.float64)
    params, stats = setup_trees(
        model, ref, "canet", "resnet50",
        (jnp.asarray(sup_img), jnp.asarray(sup_mask),
         jnp.asarray(qry_img), jnp.asarray(hist0)), {"out_hw": (H, W)})
    labels_j = jnp.asarray(labels)
    labels_t = torch.from_numpy(labels.astype(np.int64))

    n = 12
    frozen = CaNet.FROZEN[True]      # reference default: frozen trunk
    tr_cfg = SimpleNamespace(
        opt="sgd", sgd_momentum=0.9, sgd_nesterov=False,
        weight_decay=5e-4, grad_clip=1.1, lr=LR, lrp="poly",
        power=0.9, lr_end=0.0,
        adam_beta1=0.9, adam_beta2=0.999, adam_epsilon=1e-8)
    tx, opt_state, lr_policy, mask = solver.get(tr_cfg, params, frozen,
                                                max_steps=n)

    def loss_and_aux(p, st, hist):
        feat, mut = model.apply(
            {"params": p, "batch_stats": st}, jnp.asarray(sup_img),
            jnp.asarray(sup_mask), jnp.asarray(qry_img), hist,
            out_hw=None, train=True, mutable=["batch_stats"])
        up = output_resize(feat, (H, W))
        loss = loss_lib.cross_entropy(up.reshape(B * Q, H, W, 2),
                                      labels_j)
        return loss, (mut["batch_stats"], feat)

    grad_fn = jax.value_and_grad(loss_and_aux, has_aux=True)

    freeze_torch(ref, frozen)
    opt = torch.optim.SGD(
        [p for p in ref.parameters() if p.requires_grad], lr=1.0,
        momentum=0.9, weight_decay=5e-4)

    hist_j = jnp.asarray(hist0)
    hist_t = torch.zeros(B, Q, 2, h8, w8, dtype=torch.float64)
    with jax.default_matmul_precision("highest"):
        for j in range(n):
            (loss, (new_stats, feat)), grads = grad_fn(params, stats,
                                                       hist_j)
            updates, opt_state = tx.update(updates=grads,
                                           state=opt_state,
                                           params=params)
            params = solver.apply_updates(params, updates, lr_policy.lr)
            stats = new_stats
            hist_j = jax.nn.softmax(feat, axis=-1)   # feedback (stored
            lr_policy.step_step()                    # value, no grad)

            opt.zero_grad(set_to_none=True)
            feat_t = ref(nchw(sup_img), nchw(sup_mask), nchw(qry_img),
                         hist_t, out_shape=False)
            out_t = F.interpolate(feat_t, (H, W), mode="bilinear",
                                  align_corners=True)
            tl = F.cross_entropy(out_t, labels_t, ignore_index=255)
            tl.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.1)
            t = min(j + 1, n)
            opt.param_groups[0]["lr"] = LR * (1 - t / n) ** 0.9
            opt.step()
            hist_t = F.softmax(feat_t.detach(), dim=1) \
                .view(B, Q, 2, h8, w8)

            np.testing.assert_allclose(float(loss), float(tl.detach()),
                                       rtol=TRAJ_REL,
                                       err_msg=f"step {j} loss")

    want_params, want_stats = torch_to_trees(
        "canet", "resnet50", to_numpy_sd(ref), params, stats)
    assert_tree_close(jax.tree_util.tree_map(np.asarray, params),
                      want_params, rel=TRAJ_REL,
                      what="canet-trajectory-params")
    assert_tree_close(jax.tree_util.tree_map(np.asarray, stats),
                      want_stats, rel=TRAJ_REL,
                      what="canet-trajectory-stats")
    want_mom, _ = torch_to_trees(
        "canet", "resnet50", _torch_momentum_sd(ref, opt), params, stats)
    _assert_masked_close(
        jax.tree_util.tree_map(np.asarray, _find_traces(opt_state)),
        want_mom, mask, what="canet-trajectory-momentum")


@pytest.mark.slow
def test_pemp_stage2_20step_trajectory_parity():
    """Stage-2 ResNetCM, cedt + prior channel, live PERIOD_STEP
    per-epoch schedule (StepLR: decay 0.1 every 2 epochs): 4 epochs x 5
    steps at f64 — the per-epoch LR sequencing interacts with momentum
    and BN running stats across boundaries exactly as in torch."""
    from pemp_tpu.models.pemp_stage2 import PEMPStage2

    torch.manual_seed(22)
    rng = np.random.RandomState(22)
    ref = tm.TorchPEMPStage2(protos=3, spq=S + Q)
    tm.randomize_all_bns(ref, rng)
    ref.train()
    model = PEMPStage2(backbone="resnet50", protos=3, spq=S + Q,
                       drop_rate=0.0, dtype=jnp.float64)

    tr_cfg = SimpleNamespace(
        opt="sgd", sgd_momentum=0.9, sgd_nesterov=False,
        weight_decay=5e-4, grad_clip=1.1, lr=LR, lrp="period_step",
        lr_step=2, lr_rate=0.1,
        adam_beta1=0.9, adam_beta2=0.999, adam_epsilon=1e-8)

    def step_lr(_step, epoch):
        # reference StepLR semantics (independent re-implementation)
        return LR * 0.1 ** (epoch // 2)

    _run_trajectory(model, ref, "pemp_stage2", "resnet50",
                    PEMPStage2.FROZEN["resnet50"], tr_cfg, step_lr,
                    n_epochs=4, steps_per_epoch=5, loss_kind="cedt",
                    with_prior=True)
