"""Solver: torch-SGD-semantics updates, frozen masks, LR policies."""

import jax
import numpy as np
import torch

import jax.numpy as jnp

from pemp_tpu.config import TrainConfig
from pemp_tpu.core.solver import (
    LRPolicy, apply_updates, make_optimizer, trainable_mask,
)


def test_sgd_matches_torch_semantics():
    """wd -> momentum trace -> lr, exactly torch.optim.SGD."""
    cfg = TrainConfig(opt="sgd", lr=0.1, sgd_momentum=0.9,
                      weight_decay=0.01, grad_clip=0.0)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g0 = np.array([0.5, 0.1, -0.3], np.float32)
    g1 = np.array([-0.2, 0.4, 0.1], np.float32)

    params = {"w": jnp.asarray(w0)}
    mask = trainable_mask(params, [])
    tx = make_optimizer(cfg, mask)
    state = tx.init(params)
    for g in (g0, g1):
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = apply_updates(params, upd, cfg.lr)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in (g0, g1):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_frozen_mask_blocks_updates():
    params = {"backbone": {"bn1": {"scale": jnp.ones(3)},
                           "conv1": {"kernel": jnp.ones(3)}},
              "head": {"kernel": jnp.ones(3)}}
    mask = trainable_mask(params, [r"backbone/.*bn"])
    assert mask["backbone"]["bn1"]["scale"] is False
    assert mask["backbone"]["conv1"]["kernel"] is True
    assert mask["head"]["kernel"] is True

    cfg = TrainConfig(opt="sgd", weight_decay=0.01)
    tx = make_optimizer(cfg, mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    upd, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(upd["backbone"]["bn1"]["scale"]) == 0)
    assert np.all(np.asarray(upd["head"]["kernel"]) != 0)


def test_period_step_policy():
    cfg = TrainConfig(lrp="period_step", lr=1.0, lr_step=2, lr_rate=0.1)
    p = LRPolicy(cfg, max_steps=100)
    lrs = []
    for _ in range(6):       # epochs 1..6
        lrs.append(p.lr)
        p.step_epoch()
    np.testing.assert_allclose(lrs, [1, 1, 0.1, 0.1, 0.01, 0.01])


def test_custom_step_policy():
    cfg = TrainConfig(lrp="custom_step", lr=1.0, lr_boundaries=[2, 4],
                      lr_rate=0.5)
    p = LRPolicy(cfg, max_steps=100)
    lrs = []
    for _ in range(5):
        lrs.append(p.lr)
        p.step_epoch()
    np.testing.assert_allclose(lrs, [1, 1, 0.5, 0.5, 0.25])


def test_poly_policy_matches_reference_form():
    """PolyLR: lr = (base - end)(1 - t/T)^p + end, step called at init
    (reference core/solver.py:53-72)."""
    cfg = TrainConfig(lrp="poly", lr=1.0, lr_end=0.0, power=0.9)
    p = LRPolicy(cfg, max_steps=10)
    np.testing.assert_allclose(p.lr, (1 - 1 / 10) ** 0.9)
    p.step_step()
    np.testing.assert_allclose(p.lr, (1 - 2 / 10) ** 0.9)


def test_cosine_policy():
    cfg = TrainConfig(lrp="cosine", lr=1.0, lr_end=0.0)
    p = LRPolicy(cfg, max_steps=10)
    np.testing.assert_allclose(p.lr, 1.0)
    for _ in range(10):
        p.step_step()
    np.testing.assert_allclose(p.lr, 0.0, atol=1e-12)


def test_plateau_policy():
    cfg = TrainConfig(lrp="plateau", lr=1.0, lr_rate=0.1, lr_patience=1,
                      lr_min_delta=1e-4, cool_down=0, lr_end=0.0)
    p = LRPolicy(cfg, max_steps=100)
    p.step_epoch(1.0)    # improvement (best=inf -> 1.0)
    p.step_epoch(1.0)    # bad 1
    assert p.lr == 1.0
    p.step_epoch(1.0)    # bad 2 > patience -> decay
    np.testing.assert_allclose(p.lr, 0.1)





def test_frozen_subtree_backward_is_dce_eliminated():
    """The frozen-param story relies on XLA dead-code-eliminating the
    grads that multi_transform routes into set_to_zero (CaNet/PFENet
    frozen backbones; reference requires_grad=False never computes them
    at all). Pin it: a step with the heavy subtree frozen must compile
    to materially fewer FLOPs than the unfrozen step. This breaks if
    anything global (e.g. clip-by-global-norm) is ever applied to the
    grads BEFORE the mask partition."""
    from flax import linen as nn

    from pemp_tpu.config import TrainConfig
    from pemp_tpu.core.solver import apply_updates as apply_u

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(3):                      # heavy frozen trunk
                x = nn.relu(nn.Conv(64, (3, 3), name=f"backbone_c{i}")(x))
            return nn.Conv(2, (1, 1), name="head")(x)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 2),
                    jnp.float32)
    model = Net()
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    cfg = TrainConfig(opt="sgd", lr=0.1, sgd_momentum=0.9,
                      weight_decay=5e-4, grad_clip=1.1)

    def step_flops(frozen_patterns):
        mask = trainable_mask(params, frozen_patterns)
        tx = make_optimizer(cfg, mask)
        opt_state = tx.init(params)

        def step(p, s):
            def loss(p):
                return jnp.mean((model.apply({"params": p}, x) - y) ** 2)
            g = jax.grad(loss)(p)
            up, s = tx.update(g, s, p)
            return apply_u(p, up, 0.1), s

        cost = jax.jit(step).lower(params, opt_state).compile(
        ).cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        return float(cost["flops"])

    frozen = step_flops([r"^backbone_"])
    unfrozen = step_flops([])
    assert frozen < 0.75 * unfrozen, (frozen, unfrozen)
