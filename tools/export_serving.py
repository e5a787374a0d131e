#!/usr/bin/env python
"""Export a trained model's eval forward as a serialized StableHLO
serving artifact (jax.export).

The artifact is fully self-contained — weights are baked in as
constants — and runs anywhere a compatible XLA runtime exists (TPU
serving, CPU, PJRT plugins) without this framework, Python model code,
or Flax on the serving side. Complements the two checkpoint converters
(tools/convert_reference_ckpt.py / export_reference_ckpt.py) as the
deployment path.

Usage:
  python tools/export_serving.py --model pemp_stage1 --backbone resnet50 \
      --ckpt model_dir/pemp_stage1/1/bestckpt.msgpack \
      --out pemp_s1.stablehlo --batch 8 --hw 401 \
      --platforms tpu,cpu

``--batch poly`` exports a single BATCH-POLYMORPHIC artifact
(jax.export symbolic dimension): the serving side calls it at any
episode batch size without re-exporting — one artifact covers the
B=1 low-latency path and large-B batch serving. Spatial dims stay
static (the resize-as-matmul interpolants are baked per resolution).

The exported callable maps (sup_rgb [B,S,H,W,3], sup_mask [B,S,H,W,2],
qry_rgb [B,Q,H,W,3]) -> logits [B,Q,H,W,2] (input-resolution logits,
argmax = prediction). pemp_stage2 additionally takes the stage-1 prior
[B,Q,H,W]; canet takes the history mask [B,Q,H/8,W/8,2].
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def build_serving_fn(model_name: str, model, variables, batch, shot,
                     query, hw):
    """Jitted eval forward with baked-in weights + its input specs.

    ``batch`` may be an int or a ``jax.export`` symbolic dimension
    (batch-polymorphic artifact; every op in the eval forward is
    batch-elementwise or batch-contracted, so one trace serves all B).
    """
    import jax
    import jax.numpy as jnp

    specs = [
        jax.ShapeDtypeStruct((batch, shot, hw, hw, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, shot, hw, hw, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, query, hw, hw, 3), jnp.float32),
    ]
    if model_name == "pemp_stage2":
        specs.append(jax.ShapeDtypeStruct((batch, query, hw, hw),
                                          jnp.float32))
    elif model_name == "canet":
        h8 = -(-hw // 8)
        specs.append(jax.ShapeDtypeStruct((batch, query, h8, h8, 2),
                                          jnp.float32))
    rngs = {"pmm": jax.random.PRNGKey(0)} if model_name == "rpmms" else None

    @jax.jit
    def serve(*inputs):
        out = model.apply(variables, *inputs, out_hw=(hw, hw),
                          train=False, rngs=rngs)
        if isinstance(out, (tuple, list)):
            # rpmms: the FINAL pyramid output drives the prediction
            # (entry/rpmms.py apply_eval, reference rpmms.py get_pred);
            # pfenet (main, aux) / panet (logits, align): the first
            out = out[-1] if model_name == "rpmms" else out[0]
        return out

    return serve, specs


def build_cascade_serving_fn(s1_model, v1, s2_model, v2, batch, shot,
                             query, hw):
    """The DEPLOYED PEMP path as ONE artifact: frozen stage-1 forward ->
    on-device argmax prior -> stage-2 forward (reference
    entry/pemp_stage2.py:58-65). Inputs are stage-1's (no prior input —
    the artifact derives it), weights of BOTH models baked in; the
    serving side gets the headline two-stage prediction from a single
    call instead of orchestrating two artifacts plus an argmax."""
    import jax
    import jax.numpy as jnp

    specs = [
        jax.ShapeDtypeStruct((batch, shot, hw, hw, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, shot, hw, hw, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, query, hw, hw, 3), jnp.float32),
    ]

    @jax.jit
    def serve(sup_rgb, sup_mask, qry_rgb):
        lg1 = s1_model.apply(v1, sup_rgb, sup_mask, qry_rgb,
                             out_hw=(hw, hw), train=False)
        prior = jnp.argmax(lg1, axis=-1).astype(jnp.float32)  # [B,Q,H,W]
        return s2_model.apply(v2, sup_rgb, sup_mask, qry_rgb, prior,
                              out_hw=(hw, hw), train=False)

    return serve, specs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["baseline", "pemp_stage1", "pemp_stage2",
                             "panet", "canet", "rpmms", "pfenet",
                             "cascade"])
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--s1-ckpt", default="",
                    help="stage-1 checkpoint for --model cascade "
                         "(--ckpt is then the stage-2 checkpoint)")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", default="8",
                    help="episode batch size, or 'poly' for a "
                         "batch-polymorphic artifact (symbolic B)")
    ap.add_argument("--shot", type=int, default=1)
    ap.add_argument("--query", type=int, default=1)
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--platforms", default="",
                    help="comma list (e.g. 'tpu,cpu'); default = current")
    args = ap.parse_args()

    from jax import export
    from pemp_tpu.core import checkpoint as ckpt_lib
    from tools.convert_reference_ckpt import build_init_trees

    if args.batch in ("poly", "sym"):
        batch, = export.symbolic_shape("b")
    else:
        batch = int(args.batch)

    if args.model == "cascade":
        if not args.s1_ckpt:
            ap.error("--model cascade needs --s1-ckpt (stage-1 weights)")
        s1, p1, st1 = build_init_trees("pemp_stage1", args.backbone,
                                       args.shot)
        v1 = ckpt_lib.load_variables(
            Path(args.s1_ckpt), {"params": p1, "batch_stats": st1})
        s2, p2, st2 = build_init_trees("pemp_stage2", args.backbone,
                                       args.shot)
        v2 = ckpt_lib.load_variables(
            Path(args.ckpt), {"params": p2, "batch_stats": st2})
        serve, specs = build_cascade_serving_fn(
            s1, v1, s2, v2, batch, args.shot, args.query, args.hw)
    else:
        model, params, stats = build_init_trees(args.model, args.backbone,
                                                args.shot)
        variables = ckpt_lib.load_variables(
            Path(args.ckpt), {"params": params, "batch_stats": stats})
        serve, specs = build_serving_fn(args.model, model, variables,
                                        batch, args.shot, args.query,
                                        args.hw)
    kwargs = {}
    if args.platforms:
        kwargs["platforms"] = tuple(args.platforms.split(","))
    exported = export.export(serve, **kwargs)(*specs)
    data = exported.serialize()
    Path(args.out).write_bytes(data)
    manifest = {
        "model": args.model, "backbone": args.backbone,
        "batch": batch if isinstance(batch, int) else str(batch),
        "shot": args.shot, "query": args.query,
        "hw": args.hw, "platforms": list(exported.platforms),
        "bytes": len(data),
        "inputs": [[d if isinstance(d, int) else str(d) for d in s.shape]
                   for s in specs],
        "output": "[B,Q,H,W,2] input-resolution logits (argmax=pred)",
    }
    Path(args.out + ".json").write_text(json.dumps(manifest, indent=2))
    print(f"exported {args.model}/{args.backbone} -> {args.out} "
          f"({len(data) / 1e6:.1f} MB, platforms={exported.platforms})")


if __name__ == "__main__":
    main()
