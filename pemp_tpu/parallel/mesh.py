"""Device mesh and sharding rules.

The reference is single-process / single-GPU (SURVEY.md section 2.4); the
TPU-native scaling axis is **data-parallel episodes** over a 1-D mesh:

- mesh: ``Mesh(devices, ("data",))`` — ICI within a slice, DCN across
  hosts transparently (``jax.distributed`` for multi-host pods),
- batch arrays shard their leading (episode) axis over ``data``; params
  and optimizer state are replicated,
- WHOLE EPISODES STAY DEVICE-LOCAL: the stage-2 communication modules
  pool over all S+Q images of an episode (reference backbones.py:208-222),
  so the S/Q axes are never sharded — only the batch-of-episodes axis is,
- gradient / metric reductions are XLA collectives inserted by GSPMD from
  the sharding annotations (no hand-written psum needed in the step).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (0 = all local)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Episodes sharded on the data axis (leading dim only)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(cfg=None):
    """Multi-host initialization (no-op when single-process).

    On TPU pods, launch one process per host and call this before any jax
    op; episode loaders then shard the pre-sampled task list per process
    (globally reproducible because sampling is a seeded host-side numpy
    stream — see pemp_tpu/data/sampler.py)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        import os
        if "COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception:
        pass


def process_episode_range(n_episodes: int):
    """[start, stop) slice of the global episode list owned by this
    process (host-sharded input pipeline)."""
    rank, world = jax.process_index(), jax.process_count()
    per = -(-n_episodes // world)
    return rank * per, min((rank + 1) * per, n_episodes)
