"""StableHLO serving export: the serialized artifact must round-trip
through jax.export and reproduce the live model's logits exactly."""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parents[1]))

from tools.convert_reference_ckpt import build_init_trees
from tools.export_serving import build_serving_fn


def test_serving_export_roundtrip_baseline():
    from jax import export

    model, params, stats = build_init_trees("baseline", "vgg16", shot=1)
    variables = {"params": params, "batch_stats": stats}
    b, hw = 2, 33
    serve, specs = build_serving_fn("baseline", model, variables,
                                    b, 1, 1, hw)

    exported = export.export(serve)(*specs)
    data = exported.serialize()
    assert len(data) > 1000
    restored = export.deserialize(data)

    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.randn(b, 1, hw, hw, 3).astype(np.float32))
    fg = (rng.rand(b, 1, hw, hw, 1) > 0.5).astype(np.float32)
    msk = jnp.asarray(np.concatenate([fg, 1 - fg], -1))
    qry = jnp.asarray(rng.randn(b, 1, hw, hw, 3).astype(np.float32))

    want = np.asarray(serve(sup, msk, qry))
    got = np.asarray(restored.call(sup, msk, qry))
    assert want.shape == (b, 1, hw, hw, 2)
    np.testing.assert_array_equal(got, want)


def test_serving_export_stage2_extra_input():
    from jax import export

    model, params, stats = build_init_trees("pemp_stage2", "resnet50",
                                            shot=1)
    variables = {"params": params, "batch_stats": stats}
    b, hw = 1, 33
    serve, specs = build_serving_fn("pemp_stage2", model, variables,
                                    b, 1, 1, hw)
    assert len(specs) == 4                      # + stage-1 prior channel
    exported = export.export(serve)(*specs)
    restored = export.deserialize(exported.serialize())

    rng = np.random.RandomState(1)
    sup = jnp.asarray(rng.randn(b, 1, hw, hw, 3).astype(np.float32))
    fg = (rng.rand(b, 1, hw, hw, 1) > 0.5).astype(np.float32)
    msk = jnp.asarray(np.concatenate([fg, 1 - fg], -1))
    qry = jnp.asarray(rng.randn(b, 1, hw, hw, 3).astype(np.float32))
    prior = jnp.asarray((rng.rand(b, 1, hw, hw) > 0.5).astype(np.float32))

    want = np.asarray(serve(sup, msk, qry, prior))
    got = np.asarray(restored.call(sup, msk, qry, prior))
    np.testing.assert_array_equal(got, want)
