#!/usr/bin/env python
"""Microbenchmark: can int8 convolutions beat bf16 on this chip?

v5e's MXU peaks at 394 TOPS int8 vs 197 TFLOP/s bf16 — IF XLA lowers an
int8 `conv_general_dilated` onto the int8 MXU path. This measures the
model's two dominant conv shapes (the dilated 3x3 ASPP conv and a
ResNet 1x1) in bf16 vs int8(+int32 accum) to decide whether a quantized
serving mode is worth building. One JSON line per case.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(fn, args, iters=30, rounds=5):
    """Best-of-rounds per-call seconds for a jitted fn (shared with
    exp_int8_blend.py). Window closed by a value fetch (CLAUDE.md:
    block_until_ready can return early through the tunnel)."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    np.asarray(out[0, 0, 0, 0])          # value fetch closes the window
    best = float("inf")
    for _ in range(rounds):
        tic = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        np.asarray(out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - tic) / iters)
    return best


def main():
    rng = np.random.RandomState(0)
    # (name, N,H,W,Cin,Cout, k, dilation) — B=32 eval-ish batch of S+Q=2
    cases = [
        ("aspp_3x3_d6", 64, 51, 51, 256, 256, 3, 6),
        ("res_1x1", 64, 51, 51, 1024, 256, 1, 1),
        ("res_3x3_d2", 64, 51, 51, 256, 256, 3, 2),
    ]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    for name, n, h, w, ci, co, k, d in cases:
        x = rng.randn(n, h, w, ci).astype(np.float32)
        wgt = rng.randn(k, k, ci, co).astype(np.float32) * 0.05
        pad = d * (k - 1) // 2
        flops = 2 * n * h * w * ci * co * k * k

        def conv_bf16(x, wgt):
            return lax.conv_general_dilated(
                x.astype(jnp.bfloat16), wgt.astype(jnp.bfloat16),
                (1, 1), [(pad, pad), (pad, pad)],
                rhs_dilation=(d, d), dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        def conv_int8(x, wgt):
            xq = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
            wq = jnp.clip(jnp.round(wgt * 512), -127, 127).astype(jnp.int8)
            return lax.conv_general_dilated(
                xq, wq, (1, 1), [(pad, pad), (pad, pad)],
                rhs_dilation=(d, d), dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        row = {"case": name, "flops": flops}
        for label, fn in (("bf16", conv_bf16), ("int8", conv_int8)):
            try:
                t = bench(fn, (jnp.asarray(x), jnp.asarray(wgt)))
                row[label + "_ms"] = round(t * 1e3, 3)
                row[label + "_tflops"] = round(flops / t / 1e12, 1)
            except Exception as e:  # int8 conv may not lower on all gens
                row[label + "_error"] = repr(e)[:120]
        print(json.dumps(row))


if __name__ == "__main__":
    main()
