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


def _launch_env():
    """Detect a multi-process launcher environment.

    Returns ``"explicit"`` (COORDINATOR_ADDRESS + NUM_PROCESSES +
    PROCESS_ID set by a generic launcher), ``"auto"`` (a Cloud TPU pod
    slice / Slurm / GKE environment that ``jax.distributed.initialize()``
    auto-detects), or ``None`` (single process)."""
    import os
    if "COORDINATOR_ADDRESS" in os.environ:
        missing = [k for k in ("NUM_PROCESSES", "PROCESS_ID")
                   if k not in os.environ]
        if missing:
            raise RuntimeError(
                f"COORDINATOR_ADDRESS is set but {missing} are not; a "
                "multi-process launch needs all three")
        return "explicit"
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h]) > 1:
        return "auto"   # TPU pod slice: one process per host
    if "SLURM_JOB_NUM_NODES" in os.environ \
            and int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        return "auto"
    return None


def initialize_distributed() -> bool:
    """Multi-host ``jax.distributed`` initialization.

    Call before the first jax backend touch (the entry CLI does). The
    episode loaders then shard the pre-sampled task list per process
    (globally reproducible because sampling is a seeded host-side numpy
    stream — see pemp_tpu/data/sampler.py). Misconfiguration raises —
    a broken world must fail loudly, not degrade to single-process.

    Returns True when running multi-process (freshly or already
    initialized), False for a plain single-process run."""
    import os
    if jax.distributed.is_initialized():
        return True   # already initialized by the launcher
    env = _launch_env()
    if env is None:
        return False
    if env == "explicit":
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]))
    else:
        jax.distributed.initialize()   # auto-detect (TPU pod / Slurm)
    return True


def process_episode_range(n_episodes: int, rank=None, world=None):
    """[start, stop) slice of the global episode list owned by process
    ``rank`` of ``world`` (host-sharded input pipeline). Defaults to the
    live jax process topology."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    per = -(-n_episodes // world)
    return min(rank * per, n_episodes), min((rank + 1) * per, n_episodes)
