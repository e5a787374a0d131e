"""Optimizers (optax) and learning-rate policies.

Counterpart of reference ``core/solver.py``:
- SGD (momentum/nesterov, torch semantics: weight decay added to the
  gradient before the momentum trace, learning rate applied after) and
  Adam;
- LR policies: period_step (StepLR), custom_step (MultiStepLR), plateau
  (ReduceLROnPlateau), cosine (CosineAnnealingLR over total steps), poly
  (reference PolyLR :53-72 including its step-at-init behavior);
- cosine/poly advance per training step, the others per epoch
  (reference base_trainer.py:217-234).

The current LR is computed host-side by :class:`LRPolicy` and fed to the
jitted train step as a scalar argument (no recompilation, and stateful
policies like plateau stay trivially host-driven). The transform chain
therefore *excludes* the LR: ``apply_updates`` uses ``params - lr * u``.

Frozen parameters (frozen BN / frozen backbones) are handled with an
optax mask built from regex patterns over parameter paths — the moral
equivalent of the reference's ``requires_grad=False``.
"""

from __future__ import annotations

import math
import re
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def clip_by_global_norm_torch(max_norm: float):
    """``torch.nn.utils.clip_grad_norm_`` semantics (the reference clips
    with it, base_trainer.py:58-63): scale by ``max_norm / (norm + 1e-6)``
    clamped to 1. ``optax.clip_by_global_norm`` omits the ``1e-6`` — a
    ~1e-6 relative difference on every CLIPPED update, invisible to
    one-step parity at param scale but amplified to 3e-3 over 20 steps
    by training chaos (caught by tests/test_train_parity.py's
    trajectory tests)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
        updates = jax.tree_util.tree_map(
            lambda u: (u * scale).astype(u.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def trainable_mask(params, frozen_patterns: Sequence[str]):
    """Pytree of bools: True = trainable. Paths are '/'-joined."""
    flat = traverse_util.flatten_dict(params)
    regs = [re.compile(p) for p in frozen_patterns]
    mask = {k: not any(r.search("/".join(map(str, k))) for r in regs)
            for k in flat}
    return traverse_util.unflatten_dict(mask)


def make_optimizer(tr_cfg, mask) -> optax.GradientTransformation:
    """LR-less update direction transform; sign-positive (caller applies
    ``params -= lr * updates``)."""
    chain = []
    if tr_cfg.grad_clip > 0:
        chain.append(clip_by_global_norm_torch(tr_cfg.grad_clip))
    if tr_cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(
            tr_cfg.weight_decay, mask=mask))

    if tr_cfg.opt == "sgd":
        chain.append(optax.trace(decay=tr_cfg.sgd_momentum,
                                 nesterov=tr_cfg.sgd_nesterov))
    elif tr_cfg.opt == "adam":
        chain.append(optax.scale_by_adam(
            b1=tr_cfg.adam_beta1, b2=tr_cfg.adam_beta2,
            eps=tr_cfg.adam_epsilon))
    else:
        raise ValueError("Not supported optimizer: " + tr_cfg.opt)

    tx = optax.chain(*chain)
    # zero out updates for frozen params entirely
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: "train" if m else "frozen", mask))


def apply_updates(params, updates, lr):
    return jax.tree_util.tree_map(
        lambda p, u: (p - lr * u).astype(p.dtype), params, updates)


class LRPolicy:
    """Host-side LR schedule state machine (reference policies)."""

    def __init__(self, tr_cfg, max_steps: int):
        self.cfg = tr_cfg
        self.base = tr_cfg.lr
        self.max_steps = max(max_steps, 1)
        self.policy = tr_cfg.lrp
        self.per_step = self.policy in ("cosine", "poly")
        self._epoch = 0
        self._step = 0
        self._lr = self.base
        # plateau state
        self._best = math.inf
        self._bad = 0
        self._cooldown = 0
        if self.policy == "poly":
            # reference PolyLR calls step() at construction (:62)
            self._step = 1
        self._recompute()

    @property
    def lr(self) -> float:
        return self._lr

    def _recompute(self):
        cfg = self.cfg
        if self.policy == "period_step":
            self._lr = self.base * cfg.lr_rate ** (self._epoch // cfg.lr_step)
        elif self.policy == "custom_step":
            n = sum(1 for b in cfg.lr_boundaries if b <= self._epoch)
            self._lr = self.base * cfg.lr_rate ** n
        elif self.policy == "cosine":
            t = min(self._step, self.max_steps)
            self._lr = cfg.lr_end + (self.base - cfg.lr_end) * (
                1 + math.cos(math.pi * t / self.max_steps)) / 2
        elif self.policy == "poly":
            # clamp like cosine: step_step() runs once more after the
            # final step, and a negative base with fractional power
            # evaluates to a COMPLEX lr in Python
            t = min(self._step, self.max_steps)
            self._lr = (self.base - cfg.lr_end) * (
                1 - t / self.max_steps) ** cfg.power + cfg.lr_end
        # plateau: handled in step_epoch

    # --- resume support -------------------------------------------------
    STATE_KEYS = ("_epoch", "_step", "_lr", "_best", "_bad", "_cooldown")

    def state_dict(self):
        """Schedule position for checkpointing (incl. plateau state,
        which cannot be replayed from the epoch count alone)."""
        return {k: getattr(self, k) for k in self.STATE_KEYS}

    def load_state_dict(self, state):
        for k in self.STATE_KEYS:
            if k in state:
                setattr(self, k, state[k])

    def step_step(self):
        """Advance per training step (cosine/poly only)."""
        if self.per_step:
            self._step += 1
            self._recompute()

    def step_epoch(self, monitor_value: Optional[float] = None):
        """Advance per epoch (all other policies)."""
        if self.per_step:
            return
        self._epoch += 1
        if self.policy == "plateau":
            cfg = self.cfg
            value = math.inf if monitor_value is None else monitor_value
            if self._cooldown > 0:
                self._cooldown -= 1
                self._bad = 0
            if value < self._best - cfg.lr_min_delta:
                self._best = value
                self._bad = 0
            elif self._cooldown == 0:
                self._bad += 1
                if self._bad > cfg.lr_patience:
                    self._lr = max(self._lr * cfg.lr_rate, cfg.lr_end)
                    self._cooldown = cfg.cool_down
                    self._bad = 0
        else:
            self._recompute()


def get(tr_cfg, params, frozen_patterns: Sequence[str], max_steps: int):
    """Build (transform, opt_state, lr_policy, mask) for a model.
    Mirrors reference solver.get (core/solver.py:75-127)."""
    mask = trainable_mask(params, frozen_patterns)
    tx = make_optimizer(tr_cfg, mask)
    opt_state = tx.init(params)
    policy = LRPolicy(tr_cfg, max_steps)
    return tx, opt_state, policy, mask
