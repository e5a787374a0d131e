"""Checkpoint save/load with the reference's discovery layout.

Counterpart of reference checkpointing (core/base_trainer.py:236-257,
:286-293; utils/misc.py:123-148): ``ckpt.msgpack`` every ``tr.ckpt_epoch``
epochs, ``bestckpt.msgpack`` on best val mIoU, a final snapshot always.
Improvement over the reference: the optimizer state and epoch counter are
saved too, so mid-run resume is possible (the reference stores weights
only — SURVEY.md section 5.4). Weights-only restore from a full checkpoint
works (stage-2 loading a frozen stage-1, test/visualize commands).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
from flax import serialization


def save(path: Path, variables: Dict[str, Any],
         opt_state: Any = None, epoch: int = 0,
         extra: Dict[str, Any] = None) -> Path:
    """``extra``: small msgpack-able dict of trainer state that must
    survive resume (best-mIoU tracking, LR-schedule position)."""
    payload = {
        "variables": serialization.to_bytes(jax.device_get(variables)),
        "opt_state": (b"" if opt_state is None else
                      serialization.to_bytes(jax.device_get(opt_state))),
        "epoch": epoch,
        "extra": extra or {},
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    tmp.replace(path)
    return path


def load(path: Path, target_variables: Dict[str, Any],
         target_opt_state: Any = None) -> Tuple[Any, Any, int, Dict]:
    """Restore into pytrees shaped like the targets. Returns
    (variables, opt_state or None, epoch, extra)."""
    return load_bytes(Path(path).read_bytes(), target_variables,
                      target_opt_state)


def load_bytes(data: bytes, target_variables: Dict[str, Any],
               target_opt_state: Any = None) -> Tuple[Any, Any, int, Dict]:
    """``load`` from an in-memory payload — multi-host runs broadcast
    rank 0's checkpoint bytes so every host restores the identical
    state without needing a shared filesystem."""
    payload = serialization.msgpack_restore(data)
    variables = serialization.from_bytes(target_variables,
                                         payload["variables"])
    opt_state = None
    if target_opt_state is not None and payload.get("opt_state"):
        opt_state = serialization.from_bytes(target_opt_state,
                                             payload["opt_state"])
    return (variables, opt_state, int(payload.get("epoch", 0)),
            payload.get("extra", {}) or {})


def load_variables(path: Path, target_variables: Dict[str, Any]):
    variables, _, _, _ = load(path, target_variables)
    return variables


def load_variables_bytes(data: bytes, target_variables: Dict[str, Any]):
    variables, _, _, _ = load_bytes(data, target_variables)
    return variables
