"""Dataclass configuration tree with dotted-override semantics.

Replaces the reference's Sacred ingredient system (reference:
``config.py:9-78``, ``core/solver.py:6-51``, ``data_kits/datasets.py:8-31``)
with a plain dataclass tree. The user surface is preserved:

- scoped namespaces ``g`` / ``tpu`` / ``data`` / ``net`` / ``tr`` / ``te``
  plus per-entry top-level keys,
- CLI overrides as dotted ``a.b=value`` assignments,
- a printable config (``print_config`` command).
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Tuple


def config_field(default):
    """Field helper that works for mutable defaults (lists/tuples/dicts)."""
    if isinstance(default, (list, dict, set)):
        return field(default_factory=lambda: type(default)(default))
    return field(default=default)


# ---------------------------------------------------------------------------
# Scoped config sections
# ---------------------------------------------------------------------------

@dataclass
class GlobalConfig:
    """Scope ``g``: experiment management. Reference: config.py:14-19."""
    model_dir: str = "model_dir"        # root dir for checkpoints
    fileStorage: bool = True            # record runs into model_dir/<tag>/<id>
    log_file: bool = True               # also write the console log to a file
    mongodb: bool = False               # Omniboard/Mongo-compatible sink
    #                                     (reference config.py:18; falls back
    #                                     to mongoimport-ready JSON files)
    mongo_port: int = 7000              # reference config.py:19


@dataclass
class DeviceConfig:
    """Scope ``tpu``: device/mesh options (replaces the reference's ``d``
    cuda scope, config.py:41-48, with TPU-native knobs)."""
    platform: str = ""                  # "", "tpu", "cpu" ("" = jax default)
    mesh: int = 0                       # data-parallel mesh size: N devices;
    #                                     -1 = all devices; 0 = auto (all
    #                                     devices when multi-process, else 1)
    precision: str = "bf16"             # backbone compute dtype: bf16 | f32
    prefetch: int = 2                   # device prefetch depth for the input pipeline
    use_pallas: bool = True             # use Pallas kernels for fused hot ops (TPU only)
    compact_wire: bool = True           # f16/uint8 host->device wire format
    #                                     (2.4x less PCIe/tunnel traffic)
    fuse_steps: int = 1                 # train steps per device launch: >1
    #                                     runs k steps as ONE jitted
    #                                     lax.scan over prefetched batches,
    #                                     amortizing per-launch dispatch
    #                                     (ignored by runtimes with
    #                                     per-step host hooks, e.g. CaNet)


@dataclass
class DataConfig:
    """Scope ``data``. Reference: data_kits/datasets.py:13-31."""
    dataset: str = "PASCAL"             # PASCAL | COCO | SYNTH
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    height: int = 401
    width: int = 401
    bs: int = 4
    test_bs: int = 1                    # >1 uses the bucketed on-device
                                        # eval (exact; lifts the
                                        # reference's test_bs=1 protocol
                                        # constraint on TPU)
    train_n: int = 5000                 # episodes per training epoch
    test_n: int = 1000                  # episodes per eval round
    seed: int = 1234
    test_seed: int = 5678
    one_cls: int = 0                    # restrict sampling to a single class id
    cache: bool = True                  # cache decoded images in host RAM
    num_workers: int = 4                # host decode worker threads
    base_dir: str = ""                  # dataset root (resolved per dataset)
    var_gt: bool = False                # SYNTH only: emulate PASCAL's
                                        # variable-size test-time query GT


@dataclass
class TrainConfig:
    """Scope ``tr``. Reference: core/solver.py:11-44."""
    epochs: int = 0
    total_epochs: int = 3
    lr: float = 1e-3
    lrp: str = "period_step"            # custom_step|period_step|plateau|cosine|poly
    lr_boundaries: List[int] = field(default_factory=list)   # [custom_step]
    lr_step: int = 999999999            # [period_step]
    lr_rate: float = 0.1                # decay rate
    lr_end: float = 0.0                 # [plateau, cosine, poly]
    lr_patience: int = 30               # [plateau]
    lr_min_delta: float = 1e-4          # [plateau]
    cool_down: int = 0                  # [plateau]
    monitor: str = "val_loss"           # [plateau]
    power: float = 0.9                  # [poly]
    opt: str = "sgd"                    # sgd | adam
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    sgd_momentum: float = 0.9
    sgd_nesterov: bool = False
    weight_decay: float = 0.0005
    ckpt_epoch: int = 1                 # checkpoint interval (0 disables)
    grad_clip: float = 0.0              # global-norm clip (0 disables)


@dataclass
class TestConfig:
    """Scope ``te``. Reference: core/solver.py:47-50."""
    epochs: int = 5                     # number of eval rounds (5-round mean)


@dataclass
class VizConfig:
    """Scope ``p``: single-episode visualization selector.
    Reference: entry/pemp_stage1.py:35-39."""
    cls: int = 0
    sup: str = ""
    qry: str = ""


@dataclass
class Stage1RefConfig:
    """Scope ``s1``: frozen stage-1 checkpoint for the stage-2 cascade.
    Reference: entry/pemp_stage2.py:39-42."""
    id: int = -1
    ckpt: str = ""
    tag: str = ""


@dataclass
class Config:
    """Top-level experiment config. Per-entry keys at top level mirror the
    reference's entry configs (entry/baseline.py:24-41)."""
    tag: str = "default"
    shot: int = 1
    query: int = 1                      # fixed to 1 in the reference protocol
    split: int = -1                     # REQUIRED for train/test
    seed: int = 1234
    ckpt: str = ""                      # checkpoint name/path for test/visualize
    exp_id: int = -1                    # experiment id for checkpoint discovery
    loss: str = "ce"                    # ce | cedt
    sigma: float = 5.0                  # cedt EDT bandwidth
    loss_coef: float = 1.0              # aux-loss coefficient (panet/rpmms/pfenet)
    resume: bool = False                # resume this run's ckpt.msgpack (params
    #                                     + optimizer state; the reference
    #                                     cannot mid-run resume)

    g: GlobalConfig = field(default_factory=GlobalConfig)
    tpu: DeviceConfig = field(default_factory=DeviceConfig)
    data: DataConfig = field(default_factory=DataConfig)
    tr: TrainConfig = field(default_factory=TrainConfig)
    te: TestConfig = field(default_factory=TestConfig)
    p: VizConfig = field(default_factory=VizConfig)
    s1: Stage1RefConfig = field(default_factory=Stage1RefConfig)
    # ``net`` is installed per-entry with the model's own dataclass.
    net: Any = None


# ---------------------------------------------------------------------------
# Override parsing / printing
# ---------------------------------------------------------------------------

def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        low = text.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("none", "null"):
            return None
        return text


def apply_overrides(cfg: Any, overrides: Dict[str, Any]) -> Any:
    """Apply ``{"a.b": value}`` assignments onto a (nested) dataclass."""
    for key, value in overrides.items():
        parts = key.split(".")
        obj = cfg
        for part in parts[:-1]:
            if not hasattr(obj, part):
                raise KeyError(f"Unknown config scope '{part}' in '{key}'")
            obj = getattr(obj, part)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise KeyError(f"Unknown config key '{key}'")
        current = getattr(obj, leaf)
        if isinstance(value, str):
            value = _parse_value(value)
        if current is not None and value is not None:
            if isinstance(current, bool):
                if isinstance(value, str):
                    # bool('off') is True — unparseable strings must
                    # raise, not silently invert the user's intent
                    low = value.strip().lower()
                    table = {"true": True, "1": True, "yes": True,
                             "on": True, "false": False, "0": False,
                             "no": False, "off": False}
                    if low not in table:
                        raise ValueError(
                            f"Cannot parse boolean for '{key}': {value!r}")
                    value = table[low]
                else:
                    value = bool(value)
            elif isinstance(current, int) and not isinstance(value, bool) \
                    and isinstance(value, (int, float)):
                value = int(value)
            elif isinstance(current, float) and isinstance(value, (int, float)):
                value = float(value)
            elif isinstance(current, tuple) and isinstance(value, (list, tuple)):
                value = tuple(value)
        setattr(obj, leaf, value)
    return cfg


def flatten_config(cfg: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for f in fields(cfg):
        value = getattr(cfg, f.name)
        key = f"{prefix}{f.name}"
        if is_dataclass(value) and not isinstance(value, type):
            out.update(flatten_config(value, prefix=f"{key}."))
        else:
            out[key] = value
    return out


def format_config(cfg: Any) -> str:
    """Human-readable config dump, grouped by scope (print_config surface)."""
    lines = ["Configuration:"]
    scoped: Dict[str, List[str]] = {}
    for key, value in flatten_config(cfg).items():
        scope = key.split(".")[0] if "." in key else ""
        scoped.setdefault(scope, []).append(f"  {key} = {value!r}")
    for scope in sorted(scoped, key=lambda s: (s != "", s)):
        lines.extend(sorted(scoped[scope]))
    return "\n".join(lines)


def as_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
