"""Init + forward shape contracts for the full model zoo (tiny inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pemp_tpu.models.baseline import Baseline
from pemp_tpu.models.canet import CaNet
from pemp_tpu.models.panet import PANet
from pemp_tpu.models.pemp_stage1 import PEMPStage1
from pemp_tpu.models.pemp_stage2 import PEMPStage2
from pemp_tpu.models.pfenet import PFENet
from pemp_tpu.models.rpmms import RPMMs

B, S, Q, H, W = 2, 1, 1, 33, 33   # (33-1) % 8 == 0 (PFENet constraint)
FEAT = 5                          # 33 -> 17 -> 9 -> 5 at stride 8


def episode(seed=0):
    rng = np.random.RandomState(seed)
    sup_img = jnp.asarray(rng.randn(B, S, H, W, 3).astype(np.float32))
    fg = (rng.rand(B, S, H, W, 1) > 0.5).astype(np.float32)
    sup_mask = jnp.asarray(np.concatenate([fg, 1 - fg], axis=-1))
    qry_img = jnp.asarray(rng.randn(B, Q, H, W, 3).astype(np.float32))
    return sup_img, sup_mask, qry_img


def init_and_apply(model, *args, rngs_extra=(), **kwargs):
    rngs = {"params": jax.random.PRNGKey(0)}
    for name in rngs_extra:
        rngs[name] = jax.random.PRNGKey(1)
    variables = model.init(rngs, *args, **kwargs)
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    out = model.apply(variables, *args, rngs=apply_rngs or None, **kwargs)
    return variables, out


@pytest.mark.parametrize("backbone", ["vgg16", "resnet50"])
def test_baseline_shapes(backbone):
    model = Baseline(backbone=backbone)
    _, out = init_and_apply(model, *episode(), out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("backbone", ["vgg16", "resnet50"])
def test_pemp_stage1_shapes(backbone):
    model = PEMPStage1(backbone=backbone)
    _, out = init_and_apply(model, *episode(), out_hw=(H, W), ret_ind=True)
    logits, resp = out
    assert logits.shape == (B, Q, H, W, 2)
    assert resp.shape == (B, Q, H, W)
    r = np.asarray(resp)
    assert r.min() >= 0 and r.max() <= 5  # bg 0-2 / fg 3-5 with protos=3
    # feature-res output for the host-resize eval path
    _, logits_f = init_and_apply(model, *episode(), out_hw=None)
    assert logits_f.shape == (B, Q, FEAT, FEAT, 2)


def test_pemp_stage1_protos0_fallback():
    model = PEMPStage1(backbone="vgg16", protos=0)
    variables, out = init_and_apply(model, *episode(), out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)
    assert "ctr" not in variables["params"]


def test_pemp_stage2_shapes():
    sup_img, sup_mask, qry_img = episode()
    prior = jnp.zeros((B, Q, H, W), jnp.float32).at[:, :, 8:20, 8:20].set(1.0)
    model = PEMPStage2(backbone="resnet50", spq=S + Q)
    _, out = init_and_apply(model, sup_img, sup_mask, qry_img, prior,
                            out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)


def test_pemp_stage2_vgg_cm():
    sup_img, sup_mask, qry_img = episode()
    prior = jnp.zeros((B, Q, H, W), jnp.float32)
    model = PEMPStage2(backbone="vgg16", spq=S + Q)
    _, out = init_and_apply(model, sup_img, sup_mask, qry_img, prior,
                            out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)


def test_panet_shapes():
    model = PANet(backbone="vgg16")
    _, (out, align_loss) = init_and_apply(model, *episode(), out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)
    assert align_loss.shape == ()
    assert np.isfinite(float(align_loss))


def test_canet_shapes():
    sup_img, sup_mask, qry_img = episode()
    history = jnp.zeros((B, Q, FEAT, FEAT, 2), jnp.float32)
    model = CaNet()
    _, out = init_and_apply(model, sup_img, sup_mask, qry_img, history,
                            out_hw=None)
    assert out.shape == (B, Q, FEAT, FEAT, 2)
    _, out = init_and_apply(model, sup_img, sup_mask, qry_img, history,
                            out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)


def test_rpmms_shapes():
    model = RPMMs()
    _, outs = init_and_apply(model, *episode(), out_hw=(H, W),
                             rngs_extra=("pmm",))
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (B, Q, H, W, 2)
        assert np.isfinite(np.asarray(o)).all()


def test_pfenet_shapes():
    model = PFENet(shot=S, ppm_scales=(5, 3, 2))
    _, (out, aux) = init_and_apply(model, *episode(), out_hw=(H, W))
    assert out.shape == (B, Q, H, W, 2)
    assert len(aux) == 3
    for a in aux:
        assert a.shape == (B, Q, H, W, 2)


def test_dropout_rngs_only_needed_in_train():
    # eval mode requires no dropout rng; train mode does
    model = PEMPStage1(backbone="resnet50")
    sup_img, sup_mask, qry_img = episode()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           sup_img, sup_mask, qry_img, out_hw=None)
    out = model.apply(variables, sup_img, sup_mask, qry_img, out_hw=None,
                      train=False)
    assert out.shape == (B, Q, FEAT, FEAT, 2)
    out2, mutated = model.apply(
        variables, sup_img, sup_mask, qry_img, out_hw=None, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert out2.shape == (B, Q, FEAT, FEAT, 2)
    assert "batch_stats" in mutated


def test_pemp_stage2_five_shot_cm():
    """5-shot episode: the CM pools over spq = shot + query = 6 images."""
    rng = np.random.RandomState(7)
    s = 5
    sup_img = jnp.asarray(rng.randn(1, s, H, W, 3).astype(np.float32))
    fg = (rng.rand(1, s, H, W, 1) > 0.5).astype(np.float32)
    sup_mask = jnp.asarray(np.concatenate([fg, 1 - fg], axis=-1))
    qry_img = jnp.asarray(rng.randn(1, Q, H, W, 3).astype(np.float32))
    prior = jnp.zeros((1, Q, H, W), jnp.float32)
    model = PEMPStage2(backbone="resnet50", spq=s + Q)
    _, out = init_and_apply(model, sup_img, sup_mask, qry_img, prior,
                            out_hw=(H, W))
    assert out.shape == (1, Q, H, W, 2)


def test_baseline_five_shot():
    rng = np.random.RandomState(8)
    s = 5
    sup_img = jnp.asarray(rng.randn(1, s, H, W, 3).astype(np.float32))
    fg = (rng.rand(1, s, H, W, 1) > 0.5).astype(np.float32)
    sup_mask = jnp.asarray(np.concatenate([fg, 1 - fg], axis=-1))
    qry_img = jnp.asarray(rng.randn(1, Q, H, W, 3).astype(np.float32))
    model = Baseline(backbone="vgg16")
    _, out = init_and_apply(model, sup_img, sup_mask, qry_img, out_hw=(H, W))
    assert out.shape == (1, Q, H, W, 2)
