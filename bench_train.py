#!/usr/bin/env python
"""Train-step benchmark + MFU estimate (STATUS.md evidence; the driver
contract benchmark stays bench.py).

Measures the PEMP stage-1 ResNet-50 1-shot TRAINING step — forward +
backward + SGD update + BN stats, the reference's expensive loop
(SURVEY §3.1) — with device-resident batches so the tunneled link
doesn't pollute the kernel numbers, and reports:

- episodes/s for the jnp path and the fused Pallas custom-VJP path
  (pemp_tpu/ops/pallas/mpm_vjp.py),
- an MFU estimate: XLA cost-analysis FLOPs of the compiled step divided
  by (measured step time x chip peak bf16 FLOP/s).

Usage: python bench_train.py [--hw 401] [--bs 4] [--loss cedt]
"""

import argparse
import json
import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# arm BEFORE the jax import: a tunnel outage can wedge the first device
# touch forever; pemp_tpu.utils.benchtime is jax-free. Only when run as
# the benchmark itself — importers (tools/profile_train.py,
# tools/exp_xla_flags.py) never call _progress, and an armed
# never-refreshed watchdog would os._exit their healthy runs mid-trace.
from pemp_tpu.utils.benchtime import arm_watchdog

if __name__ == "__main__":
    _progress, _disarm = arm_watchdog("bench_train")
else:
    _progress = _disarm = lambda: None

import jax
import jax.numpy as jnp
import numpy as np

# peak bf16 FLOP/s per chip by device kind (public spec sheets)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _bench_loss_fn(model, loss_obj):
    """One loss closure for BOTH the serial and fused arms — a drift
    between them would make fused_speedup compare different programs."""

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(
            variables, batch["sup_rgb"], batch["sup_mask"], batch["qry_rgb"],
            out_hw=tuple(batch["qry_rgb"].shape[2:4]), train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        labels = batch["qry_msk"].reshape(-1, *batch["qry_msk"].shape[-2:])
        logits = logits.reshape(-1, *logits.shape[-3:])
        return loss_obj(logits, labels), mutated["batch_stats"]

    return loss_fn


def build_step(model, loss_obj, lr=1e-3):
    import optax

    tx = optax.sgd(lr, momentum=0.9)
    loss_fn = _bench_loss_fn(model, loss_obj)

    # donate like the production step (parallel/step.py donates the whole
    # state tuple): without donation XLA emits copy fusions for every
    # updated param/momentum buffer, which the real trainer never pays
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, batch, rng):
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    return tx, step


def make_bench_setup(args, use_pallas, fuse=0):
    """PEMP-s1 train-step setup shared by bench_one and
    tools/profile_train (one copy of the synthetic batch, the
    loss-config shim, jit-init and optimizer wiring, so the profiler
    cannot desynchronize from the benchmark it explains).

    args needs .hw/.bs/.loss; off-chip the shapes shrink to 33²/bs=2.
    Returns (step, tx, params, batch_stats, opt_state, batch, bs, hw).
    """
    from pemp_tpu.core import losses as loss_lib
    from pemp_tpu.models.pemp_stage1 import PEMPStage1

    on_tpu = jax.devices()[0].platform == "tpu"
    hw, bs = (args.hw, args.bs) if on_tpu else (33, 2)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    use_pallas = bool(use_pallas and on_tpu)

    model = PEMPStage1(backbone="resnet50", dtype=dtype,
                       use_pallas=use_pallas)

    rng = np.random.RandomState(0)
    fg = (rng.rand(bs, 1, hw, hw, 1) > 0.5).astype(np.float32)
    batch = {
        "sup_rgb": jnp.asarray(rng.randn(bs, 1, hw, hw, 3), jnp.float32),
        "sup_mask": jnp.asarray(np.concatenate([fg, 1 - fg], -1)),
        "qry_rgb": jnp.asarray(rng.randn(bs, 1, hw, hw, 3), jnp.float32),
        "qry_msk": jnp.asarray(
            rng.randint(0, 2, (bs, 1, hw, hw)), jnp.int32),
    }

    class _TpuCfg:           # EDT backend follows the benched arm, so
        pass                 # the "jnp" arm is a FULL jnp step

    _TpuCfg.use_pallas = use_pallas

    class _LossCfg:          # loss config surface loss_lib.get expects
        loss = args.loss
        sigma = 5.0
        tpu = _TpuCfg()

    loss_obj = loss_lib.get(_LossCfg())

    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)},
                             b["sup_rgb"][:1], b["sup_mask"][:1],
                             b["qry_rgb"][:1]))(batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if fuse > 1:
        tx, step = build_fused_step(model, loss_obj, fuse)
    else:
        tx, step = build_step(model, loss_obj)
    opt_state = tx.init(params)
    return step, tx, params, batch_stats, opt_state, batch, bs, hw


def build_fused_step(model, loss_obj, fuse, lr=1e-3):
    """k train steps per launch via lax.scan (the production
    tpu.fuse_steps path, parallel/step.py make_train_step_fused) —
    measures how much of the per-launch dispatch gap the fused loop
    recovers (device 199 vs wall 170 eps/s serial, docs/DESIGN.md)."""
    import optax

    tx = optax.sgd(lr, momentum=0.9)
    loss_fn = _bench_loss_fn(model, loss_obj)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def fused(params, batch_stats, opt_state, batch, rng):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, batch,
                                       jax.random.fold_in(rng, i))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state),
            jnp.arange(fuse, dtype=jnp.int32))
        return params, batch_stats, opt_state, losses[-1]

    return tx, fused


def bench_one(use_pallas, args, launches=10, rounds=12, budget_s=240,
              fuse=0):
    on_tpu = jax.devices()[0].platform == "tpu"
    step, tx, params, batch_stats, opt_state, batch, bs, hw = (
        make_bench_setup(args, use_pallas, fuse))
    if fuse > 1:
        bs = bs * fuse      # episodes per launch
    key = jax.random.PRNGKey(1)

    lowered = step.lower(params, batch_stats, opt_state, batch, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    if fuse > 1:
        # XLA cost analysis counts the scan body ONCE (measured: the
        # fused program reports the same flops as one step) — a launch
        # executes fuse steps
        flops *= fuse

    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, batch, key)
    float(loss)     # value fetch: block_until_ready alone can return
    #                 early through the tunneled backend (observed)
    _progress()

    best, rates = 0.0, []
    deadline = time.time() + (budget_s if on_tpu else 20)
    for _ in range(rounds):
        tic = time.perf_counter()
        for i in range(launches):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, batch,
                jax.random.fold_in(key, i))
        float(loss)     # hard host sync closes the timing window
        _progress()     # a completed round = the link is alive
        dt = time.perf_counter() - tic
        rates.append(round(launches * bs / dt, 2))
        best = max(best, rates[-1])
        if time.time() > deadline:
            break

    step_s = bs / best if best else float("inf")
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_BF16.items() if k in kind), None)
    mfu = flops / (step_s * peak) if (peak and best) else None
    return {
        "path": ("pallas-vjp" if use_pallas else "jnp")
                + (f"+fuse{fuse}" if fuse > 1 else ""),
        "episodes_per_s": round(best, 2),
        # optimizer steps/s (a fused launch is `fuse` steps)
        "it_per_s": round(best / bs * max(fuse, 1), 2),
        "step_flops": flops,
        "device": kind,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "round_rates": rates,
        "loss_final": float(loss),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--loss", default="cedt")
    ap.add_argument("--fuse", type=int, default=0,
                    help="also bench k fused steps/launch (tpu.fuse_steps)")
    args = ap.parse_args()

    results = [bench_one(False, args), bench_one(True, args)]
    if args.fuse > 1:
        results.append(bench_one(True, args, fuse=args.fuse))
    _disarm()
    for r in results:
        print(json.dumps(r))
    if results[0]["episodes_per_s"]:
        print(json.dumps({
            "pallas_vjp_speedup": round(
                results[1]["episodes_per_s"] / results[0]["episodes_per_s"],
                3)}))
    if args.fuse > 1 and results[1]["episodes_per_s"]:
        print(json.dumps({
            "fused_speedup": round(
                results[2]["episodes_per_s"] / results[1]["episodes_per_s"],
                3)}))


if __name__ == "__main__":
    main()
