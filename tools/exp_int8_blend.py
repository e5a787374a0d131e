#!/usr/bin/env python
"""Blended int8-vs-bf16 estimate over the flagship eval conv inventory.

exp_int8_conv.py showed int8 wins on dilated 3x3 convs (~1.3x) but LOSES
on the memory-bound 1x1 (0.8x). Whether a quantized serving mode pays
end-to-end depends on the blend, so this enumerates every conv shape in
the PEMP-s1 r50 eval path (ResNet-50 dilated OS8 + purifier + ASPPV2,
401^2 input, B=64 images = 32 episodes of S+Q=2 — bench.py's protocol)
and times each in bf16 vs int8 with DYNAMIC activation quantization
(amax + scale inside the timed region, i.e. what a real serving mode
would pay; weights quantized outside — they are static at serving time).

Prints one JSON line per shape and a blended summary.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_int8_conv import bench  # noqa: E402  (shared timing harness)

B = 64  # S+Q=2 images per episode x 32 episodes

# (name, count, H, W, Cin, Cout, k, stride, dilation)
# ResNet-50 dilated (output stride 8, 3 stages) at 401^2:
# stem 401->201, maxpool 201->101, layer2 downsamples 101->51,
# layer3 dilation 2 keeps 51. Then purifier + ASPPV2 at 51^2.
CASES = [
    ("stem_7x7_s2",       1, 401, 401,    3,   64, 7, 2, 1),
    ("l1_in_1x1",         1, 101, 101,   64,   64, 1, 1, 1),
    ("l1_3x3",            3, 101, 101,   64,   64, 3, 1, 1),
    ("l1_out_1x1",        3, 101, 101,   64,  256, 1, 1, 1),
    ("l1_mid_1x1",        2, 101, 101,  256,   64, 1, 1, 1),
    ("l1_down_1x1",       1, 101, 101,   64,  256, 1, 1, 1),
    ("l2_in_1x1_s2",      1, 101, 101,  256,  128, 1, 2, 1),
    ("l2_3x3",            4,  51,  51,  128,  128, 3, 1, 1),
    ("l2_out_1x1",        4,  51,  51,  128,  512, 1, 1, 1),
    ("l2_mid_1x1",        3,  51,  51,  512,  128, 1, 1, 1),
    ("l2_down_1x1_s2",    1, 101, 101,  256,  512, 1, 2, 1),
    ("l3_in0_1x1",        1,  51,  51,  512,  256, 1, 1, 1),
    ("l3_in_1x1",         5,  51,  51, 1024,  256, 1, 1, 1),
    ("l3_3x3_d2",         6,  51,  51,  256,  256, 3, 1, 2),
    ("l3_out_1x1",        6,  51,  51,  256, 1024, 1, 1, 1),
    ("l3_down_1x1",       1,  51,  51,  512, 1024, 1, 1, 1),
    ("pur_1x1",           1,  51,  51, 1024,  256, 1, 1, 1),
    ("pur_3x3",           1,  51,  51,  256,  256, 3, 1, 1),
    ("aspp_1x1",          2,  51,  51,  256,  256, 1, 1, 1),
    ("aspp_3x3_d6",       1,  51,  51,  256,  256, 3, 1, 6),
    ("aspp_3x3_d12",      1,  51,  51,  256,  256, 3, 1, 12),
    ("aspp_3x3_d18",      1,  51,  51,  256,  256, 3, 1, 18),
    ("aspp_out_1x1",      1,  51,  51, 1280,  512, 1, 1, 1),
]

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)
    tot = {"bf16_ms": 0.0, "int8_ms": 0.0, "flops": 0}
    errors = []
    for name, cnt, h, w, ci, co, k, s, d in CASES:
        x = rng.randn(B, h, w, ci).astype(np.float32)
        wgt = (rng.randn(k, k, ci, co) * 0.05).astype(np.float32)
        pad = d * (k - 1) // 2
        oh = (h + 2 * pad - d * (k - 1) - 1) // s + 1
        flops = 2 * B * oh * oh * ci * co * k * k

        def conv_bf16(x, wgt):
            return lax.conv_general_dilated(
                x.astype(jnp.bfloat16), wgt.astype(jnp.bfloat16),
                (s, s), [(pad, pad), (pad, pad)], rhs_dilation=(d, d),
                dimension_numbers=DN, preferred_element_type=jnp.float32)

        # weights pre-quantized (static at serving time); activation scale
        # computed dynamically inside the timed region.
        wscale = np.abs(wgt).max(axis=(0, 1, 2)) / 127.0 + 1e-12
        wq = jnp.asarray(np.clip(np.round(wgt / wscale), -127, 127)
                         .astype(np.int8))
        wscale = jnp.asarray(wscale.astype(np.float32))

        def conv_int8(x, wq):
            xscale = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
            xq = jnp.clip(jnp.round(x / xscale), -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xq, wq, (s, s), [(pad, pad), (pad, pad)], rhs_dilation=(d, d),
                dimension_numbers=DN, preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (xscale * wscale)

        row = {"case": name, "count": cnt, "gflops": round(flops / 1e9, 1)}
        for label, fn, a in (("bf16", conv_bf16, (jnp.asarray(x), jnp.asarray(wgt))),
                             ("int8", conv_int8, (jnp.asarray(x), wq))):
            try:
                t = bench(fn, a, iters=20, rounds=4)
                row[label + "_ms"] = round(t * 1e3, 3)
                row[label + "_tflops"] = round(flops / t / 1e12, 1)
                tot[label + "_ms"] += t * 1e3 * cnt
            except Exception as e:
                row[label + "_error"] = repr(e)[:120]
                errors.append(f"{name}:{label}")
        tot["flops"] += flops * cnt
        print(json.dumps(row), flush=True)

    summary = {
        "blend_bf16_ms": round(tot["bf16_ms"], 2),
        "blend_int8_ms": round(tot["int8_ms"], 2),
        "total_gflops": round(tot["flops"] / 1e9, 1),
    }
    if errors:
        # a partial blend compares mismatched inventories — don't print a
        # go/no-go number computed from it
        summary["errors"] = errors
    else:
        summary["speedup"] = round(tot["bf16_ms"] / tot["int8_ms"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
