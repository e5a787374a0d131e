#!/usr/bin/env python
"""A/B the two remaining named train-MFU levers (VERDICT r4 next #2).

docs/DESIGN.md's train profile ends: "further MFU would have to come
from bf16 conv weight grads or a different dilated-conv schedule". This
tool measures both on the flagship train step (same harness as
bench_train.py — the measurement cannot desynchronize from the benchmark
it informs), with a parity gate before any timing:

- Lever (a), weight-grad dtype. Fact first (checkable in the jaxpr, see
  ``show_wgrad_dtypes``): with the models' bf16 compute dtype the
  autodiff weight-grad convs ALREADY take bf16 operands and produce
  bf16 outputs — the "bf16 conv weight grads" lever is the default
  lowering, not an available change. The measurable arm is therefore
  the inverse, ``wgrad32``: a custom-VJP conv whose weight grads run
  with f32 operands (2x the HBM bytes, f32 accumulate). Its delta
  quantifies what the already-captured lever is worth.
- Lever (b), dilated-conv schedule. ``s2b``: every 3x3 stride-1
  dilation-d (pad=d) conv — layer3 (d=2), layer4 (d=4), the ASPPV2
  branches (d=6,12) — is rewritten as a space-to-batch decomposition:
  d^2 phase-shifted subgrids, one dense padding-1 3x3 conv over the
  [d^2*N, ceil(H/d), ceil(W/d), C] batch, interleave back. Identical
  math up to f32/bf16 reassociation (the verify gate pins it); whether
  XLA's native dilated lowering or the explicit dense-batch schedule
  tiles the MXU better at 51 px is exactly the open question.

Usage:
  python tools/exp_train_levers.py verify            # CPU or chip
  python tools/exp_train_levers.py measure [--fuse 8] [--arms ...]
  python tools/exp_train_levers.py show_wgrad_dtypes
"""

import argparse
import json
import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pemp_tpu.models import layers

DN = ("NHWC", "HWIO", "NHWC")


def native_impl(x, w, strides, padding, dilation):
    return lax.conv_general_dilated(x, w, strides, padding,
                                    rhs_dilation=dilation,
                                    dimension_numbers=DN)


# ---- lever (b): space-to-batch dilated schedule -------------------------

def s2b_impl(x, w, strides, padding, dilation):
    """Dilated 3x3 (stride 1, pad=d) as d^2 phase-subgrid dense convs.

    x[n, q*d+a, r*d+b, c] -> phase (a, b) grid; a padding-1 3x3 conv on
    each phase reads rows q-1/q/q+1 = original i-d/i/i+d, so the result
    interleaves back to the dilated conv exactly (zero padding matches:
    pad=d is one phase row, and the pad-up-to-multiple-of-d tail rows
    are zeros the original zero padding would also have produced)."""
    d = dilation[0]
    kh, kw = w.shape[0], w.shape[1]
    if (d == 1 or strides != (1, 1) or (kh, kw) != (3, 3)
            or padding != ((d, d), (d, d)) or dilation != (d, d)):
        return native_impl(x, w, strides, padding, dilation)
    n, h, wd, c = x.shape
    hp = -(-h // d) * d
    wp = -(-wd // d) * d
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
    xr = xp.reshape(n, hp // d, d, wp // d, d, c) \
        .transpose(2, 4, 0, 1, 3, 5) \
        .reshape(d * d * n, hp // d, wp // d, c)
    y = lax.conv_general_dilated(xr, w, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=DN)
    co = y.shape[-1]
    yo = y.reshape(d, d, n, hp // d, wp // d, co) \
        .transpose(2, 3, 0, 4, 1, 5) \
        .reshape(n, hp, wp, co)
    return yo[:, :h, :wd, :]


# ---- lever (a): weight-grad operand dtype -------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _wgrad32_conv(x, w, strides, padding, dilation):
    return native_impl(x, w, strides, padding, dilation)


def _wgrad32_fwd(x, w, strides, padding, dilation):
    return _wgrad32_conv(x, w, strides, padding, dilation), (x, w)


def _wgrad32_bwd(strides, padding, dilation, res, g):
    x, w = res
    # dx: jax's own conv transpose rule (bf16, untouched)
    dx = jax.linear_transpose(
        lambda xx: native_impl(xx, w, strides, padding, dilation), x)(g)[0]
    # dw: same transpose rule but with f32 operands — the A/B arm
    xf = x.astype(jnp.float32)
    dw = jax.linear_transpose(
        lambda ww: native_impl(xf, ww, strides, padding, dilation),
        w.astype(jnp.float32))(g.astype(jnp.float32))[0]
    return dx, dw.astype(w.dtype)


_wgrad32_conv.defvjp(_wgrad32_fwd, _wgrad32_bwd)


def wgrad32_impl(x, w, strides, padding, dilation):
    return _wgrad32_conv(x, w, strides, padding, dilation)


ARMS = {"native": None, "s2b": s2b_impl, "wgrad32": wgrad32_impl}


def _run_one_step(impl, args):
    """Fresh setup under the given CONV_IMPL; one step from the shared
    seed; returns (loss, params, new_stats) as host trees."""
    from bench_train import make_bench_setup
    layers.CONV_IMPL = impl
    try:
        step, _tx, params, batch_stats, opt_state, batch, _bs, _hw = (
            make_bench_setup(args, use_pallas=True))
        params, new_bs, _opt, loss = step(params, batch_stats, opt_state,
                                          batch, jax.random.PRNGKey(1))
        return (float(loss),
                jax.tree_util.tree_map(np.asarray, params),
                jax.tree_util.tree_map(np.asarray, new_bs))
    finally:
        layers.CONV_IMPL = None


def verify(args):
    """Every arm must reproduce the native step: loss and EVERY updated
    param leaf within the platform's reassociation tolerance. Gates
    timing. On CPU (f32 compute) the gate is tight (5e-3 per-leaf
    max-rel); on TPU (bf16 compute) per-leaf rel on near-zero leaves
    just measures bf16 rounding noise through the clipped update
    (observed 2e-1 on a ~1e-6-scale leaf for a CORRECT arm), so the
    gate there is a GLOBAL-scale absolute bound plus the loss — which
    still catches real math errors (mis-indexed phases produce O(1)
    divergence), not rounding."""
    base_loss, base_p, base_s = _run_one_step(None, args)
    from flax import traverse_util
    on_tpu = jax.devices()[0].platform == "tpu"
    for name in args.arms:
        if name == "native":
            continue
        loss, p, s = _run_one_step(ARMS[name], args)
        np.testing.assert_allclose(loss, base_loss,
                                   rtol=(2e-2 if on_tpu else 2e-3),
                                   err_msg=f"{name}: loss diverged")
        bf = traverse_util.flatten_dict(base_p)
        af = traverse_util.flatten_dict(p)
        assert set(bf) == set(af), f"{name}: param tree changed"
        gscale = max(float(np.abs(np.asarray(v)).max())
                     for v in bf.values())
        worst = 0.0
        for k in bf:
            a = np.asarray(af[k], np.float64)
            b = np.asarray(bf[k], np.float64)
            scale = max(np.abs(b).max(), (1e-2 * gscale if on_tpu
                                          else 1e-8))
            worst = max(worst, np.abs(a - b).max() / scale)
        tol = 2e-2 if on_tpu else 5e-3
        assert worst < tol, f"{name}: post-step params off by {worst:.2e}"
        print(f"verify {name}: ok (loss {loss:.6f} vs {base_loss:.6f}, "
              f"worst param rel {worst:.2e})", file=sys.stderr)
    print(json.dumps({"verify": "ok", "arms": args.arms,
                      "platform": "tpu" if on_tpu else "cpu"}))


def measure(args):
    from bench_train import bench_one
    out = []
    for name in args.arms:
        layers.CONV_IMPL = ARMS[name]
        try:
            r = bench_one(True, args, fuse=args.fuse)
        finally:
            layers.CONV_IMPL = None
        r["arm"] = name
        out.append(r)
        print(json.dumps(r))
    base = next((r for r in out if r["arm"] == "native"), None)
    if base and base["episodes_per_s"]:
        for r in out:
            if r is not base:
                print(json.dumps({
                    "arm": r["arm"],
                    "speedup_vs_native": round(
                        r["episodes_per_s"] / base["episodes_per_s"], 3)}))


def show_wgrad_dtypes(args):
    """Jaxpr evidence for the lever-(a) fact: the production (native)
    backward convs already run bf16->bf16."""
    def f(w, x):
        y = native_impl(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        (1, 1), ((2, 2), (2, 2)), (2, 2))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    w = jnp.zeros((3, 3, 8, 16), jnp.float32)
    x = jnp.zeros((2, 16, 16, 8), jnp.float32)
    for eqn in jax.make_jaxpr(jax.grad(f))(w, x).eqns:
        if eqn.primitive.name == "conv_general_dilated":
            print("conv:", [str(v.aval.dtype) for v in eqn.invars], "->",
                  str(eqn.outvars[0].aval.dtype), "preferred:",
                  eqn.params.get("preferred_element_type"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["verify", "measure",
                                     "show_wgrad_dtypes"])
    ap.add_argument("--hw", type=int, default=401)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--loss", default="cedt")
    ap.add_argument("--fuse", type=int, default=0)
    ap.add_argument("--arms", default="native,s2b,wgrad32")
    args = ap.parse_args()
    args.arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    bad = [a for a in args.arms if a not in ARMS]
    if bad:
        ap.error(f"unknown arms {bad}; choose from {sorted(ARMS)}")
    sys.path.insert(0, str(Path(__file__).parents[1]))
    {"verify": verify, "measure": measure,
     "show_wgrad_dtypes": show_wgrad_dtypes}[args.mode](args)


if __name__ == "__main__":
    main()
