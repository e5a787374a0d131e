#!/usr/bin/env python
"""Compiled HBM footprint report for every model family (capacity
planning: what batch fits on a chip?).

For each zoo row this compiles (no execution) the eval step at its
preset resolution for two batch sizes and reads XLA's memory analysis:
parameter bytes, argument/output bytes, and temp (activation) bytes.
Temps scale ~linearly in the batch, so the two points give a
per-episode slope and a projected max batch under the device HBM
budget (v5e: 16 GiB). The flagship's train step is included — its
temps bound the training batch the same way.

The reference has no counterpart (torch OOMs are discovered by trial);
this is the TPU-native answer: the XLA compile is the ground truth for
peak reserved HBM before any step runs.

Usage:
  python tools/memory_report.py [row ...]     # default: all rows
Rows: baseline pemp_stage1 pemp_stage2 panet canet rpmms pfenet s1_train
Prints one JSON line per row (plus a readable table on stderr).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

HBM_BYTES = 16 * 1024**3        # v5e
GiB = 1024**3


def episode_spec(b, s, q, hw):
    sup = jax.ShapeDtypeStruct((b, s, hw, hw, 3), jnp.float32)
    msk = jax.ShapeDtypeStruct((b, s, hw, hw, 2), jnp.float32)
    qry = jax.ShapeDtypeStruct((b, q, hw, hw, 3), jnp.float32)
    return sup, msk, qry


def _zeros_like_spec(specs):
    return tuple(jnp.zeros(s.shape, s.dtype) for s in specs)


def build(name, hw, dtype, use_pallas):
    """Return (model, rngs, extra_spec_fn) for one family."""
    rngs = None
    extra = lambda b: ()                                 # noqa: E731
    if name == "baseline":
        from pemp_tpu.models.baseline import Baseline
        model = Baseline(backbone="resnet50", dtype=dtype)
    elif name == "pemp_stage1":
        from pemp_tpu.models.pemp_stage1 import PEMPStage1
        model = PEMPStage1(backbone="resnet50", dtype=dtype,
                           use_pallas=use_pallas)
    elif name == "pemp_stage2":
        from pemp_tpu.models.pemp_stage2 import PEMPStage2
        model = PEMPStage2(backbone="resnet50", dtype=dtype,
                           use_pallas=use_pallas)
        extra = lambda b: (                              # noqa: E731
            jax.ShapeDtypeStruct((b, 1, hw, hw), jnp.float32),)
    elif name == "panet":
        from pemp_tpu.models.panet import PANet
        model = PANet(dtype=dtype)
    elif name == "canet":
        from pemp_tpu.models.canet import CaNet
        model = CaNet(dtype=dtype)
        h8 = -(-hw // 8)
        extra = lambda b: (                              # noqa: E731
            jax.ShapeDtypeStruct((b, 1, h8, h8, 2), jnp.float32),)
    elif name == "rpmms":
        from pemp_tpu.models.rpmms import RPMMs
        model = RPMMs(dtype=dtype)
        rngs = {"pmm": jax.random.PRNGKey(0)}
    elif name == "pfenet":
        from pemp_tpu.models.pfenet import PFENet
        model = PFENet(shot=1, dtype=dtype)
    else:
        raise KeyError(name)
    return model, rngs, extra


def eval_mem(name, hw, b, dtype, use_pallas):
    """Compile the eval forward at batch ``b``; return memory analysis."""
    model, rngs, extra = build(name, hw, dtype, use_pallas)
    sup1, msk1, qry1 = _zeros_like_spec(episode_spec(1, 1, 1, hw))
    ex1 = _zeros_like_spec(extra(1))
    init_rngs = {"params": jax.random.PRNGKey(0)}
    if rngs:
        init_rngs.update(rngs)
    variables = jax.eval_shape(
        lambda a, m, q, *e: model.init(init_rngs, a, m, q, *e, out_hw=None),
        sup1, msk1, qry1, *ex1)
    variables = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype),
                             variables)

    def step(v, sup, msk, qry, *e):
        # out_hw=(hw, hw) matches the deployed eval protocol (bench.py
        # resizes logits to input resolution before argmax) — compiling
        # out_hw=None would omit the full-res logits/resize temps and
        # overstate the projected max batch
        out = model.apply(v, sup, msk, qry, *e, out_hw=(hw, hw),
                          train=False, rngs=rngs)
        if isinstance(out, (tuple, list)):
            out = out[-1] if name == "rpmms" else out[0]
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    specs = episode_spec(b, 1, 1, hw) + extra(b)
    compiled = jax.jit(step).lower(variables, *specs).compile()
    ma = compiled.memory_analysis()
    params = sum(np.prod(x.shape) * x.dtype.itemsize
                 for x in jax.tree.leaves(variables))
    return {
        "params_bytes": int(params),
        "arg_bytes": int(ma.argument_size_in_bytes),
        "out_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
    }


def train_mem(hw, b, dtype, use_pallas):
    """Flagship full train step (fwd+bwd+SGD+BN) memory at batch ``b``."""
    from pemp_tpu.models.pemp_stage1 import PEMPStage1
    from pemp_tpu.core.losses import cross_entropy
    import optax

    model = PEMPStage1(backbone="resnet50", dtype=dtype,
                       use_pallas=use_pallas)
    sup1, msk1, qry1 = _zeros_like_spec(episode_spec(1, 1, 1, hw))
    variables = jax.eval_shape(
        lambda a, m, q: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            a, m, q, out_hw=None, train=True),
        sup1, msk1, qry1)
    variables = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype),
                             variables)
    params = variables["params"]
    stats = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)
    loss_fn = cross_entropy

    def train_step(params, stats, opt_state, sup, msk, qry, ref, rng):
        def loss(p):
            out, new_stats = model.apply(
                {"params": p, **stats}, sup, msk, qry, out_hw=(hw, hw),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return loss_fn(out[:, 0], ref), new_stats
        (lv, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, lv

    specs = episode_spec(b, 1, 1, hw) + (
        jax.ShapeDtypeStruct((b, hw, hw), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    compiled = jax.jit(train_step, donate_argnums=(0, 1, 2)).lower(
        params, stats, opt_state, *specs).compile()
    ma = compiled.memory_analysis()
    pbytes = sum(np.prod(x.shape) * x.dtype.itemsize
                 for x in jax.tree.leaves((params, stats, opt_state)))
    return {
        "params_bytes": int(pbytes),
        "arg_bytes": int(ma.argument_size_in_bytes),
        "out_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
    }


# (name, hw at preset resolution, probe batches for the linear fit)
ROWS = {
    "baseline":    ("baseline", 401, (8, 16)),
    "pemp_stage1": ("pemp_stage1", 401, (8, 16)),
    "pemp_stage2": ("pemp_stage2", 401, (8, 16)),
    "panet":       ("panet", 401, (8, 16)),
    "canet":       ("canet", 321, (8, 16)),
    "rpmms":       ("rpmms", 481, (4, 8)),
    "pfenet":      ("pfenet", 473, (4, 8)),
    "s1_train":    (None, 401, (2, 4)),
}


def report_row(key, on_tpu, dtype):
    name, hw, (b1, b2) = ROWS[key]
    if not on_tpu:
        hw, b1, b2 = 33, 2, 4
    fn = (lambda b: train_mem(hw, b, dtype, on_tpu)) if key == "s1_train" \
        else (lambda b: eval_mem(name, hw, b, dtype, on_tpu))
    m1, m2 = fn(b1), fn(b2)
    # temps + args + outs all scale with batch; params are fixed
    var1 = m1["temp_bytes"] + m1["arg_bytes"] + m1["out_bytes"] \
        - m1["params_bytes"]
    var2 = m2["temp_bytes"] + m2["arg_bytes"] + m2["out_bytes"] \
        - m2["params_bytes"]
    per_ep = max((var2 - var1) / (b2 - b1), 1.0)
    fixed = m1["params_bytes"] + max(var1 - per_ep * b1, 0.0)
    max_b = int((HBM_BYTES - fixed) // per_ep)
    row = {
        "row": key, "hw": hw, "probe_batches": [b1, b2],
        "params_gib": round(m1["params_bytes"] / GiB, 3),
        "temp_gib_at_b%d" % b2: round(m2["temp_bytes"] / GiB, 3),
        "per_episode_mib": round(per_ep / 1024**2, 1),
        "projected_max_batch_16gib": max_b,
    }
    print(f"  {key:12s} hw={hw}  params {row['params_gib']:.3f} GiB  "
          f"per-episode {row['per_episode_mib']:.1f} MiB  "
          f"max B ~{max_b}", file=sys.stderr)
    return row


def main():
    rows = sys.argv[1:] or list(ROWS)
    unknown = [r for r in rows if r not in ROWS]
    if unknown:
        sys.exit(f"unknown row(s) {unknown}; valid: {sorted(ROWS)}")
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    for r in rows:
        print(json.dumps(report_row(r, on_tpu, dtype)), flush=True)


if __name__ == "__main__":
    main()
