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


def resolve_mesh(n: int):
    """``cfg.tpu.mesh`` -> Mesh or None.

    - ``n > 1``: data mesh over the first ``n`` global devices,
    - ``n == -1``: all global devices,
    - ``n == 0`` (auto): all global devices under a multi-process
      launch; no mesh (single device) otherwise — the conservative
      single-host default keeps small runs off the GSPMD path,
    - ``n == 1``: no mesh.

    Under multi-host the mesh MUST span every process's devices: a
    process-local (or absent) mesh would silently train one divergent
    replica per host with no gradient sync — the world fails loudly
    instead."""
    world = jax.process_count()
    if n == 0:
        n = jax.device_count() if world > 1 else 1
    elif n == -1:
        n = jax.device_count()
    mesh = data_mesh(n) if n > 1 else None
    if world > 1 and (mesh is None or mesh.size != jax.device_count()):
        raise ValueError(
            f"multi-process launch ({world} processes) requires the data "
            f"mesh to cover all {jax.device_count()} global devices; got "
            f"tpu.mesh={n}. Leave tpu.mesh=0 (auto) or set it to the "
            "global device count.")
    return mesh


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
        _warm_collective_context()
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
    _warm_collective_context()
    return True


_collectives_warmed = False


def _warm_collective_context() -> None:
    """Build the backend's cross-host collective context NOW, while every
    rank is aligned from the coordinator rendezvous.

    The context is otherwise built lazily by the first real collective —
    which may come after minutes of per-rank compile/load skew, and on
    the CPU backend the Gloo context rendezvous has a hard 30s
    key-value-store timeout (no knob: ``make_gloo_tcp_collectives``
    takes none). Observed live under host load: rank 1 still compiling
    when rank 0 hit its first collective → "Gloo context initialization
    failed: DEADLINE_EXCEEDED" → world dead. A trivial allgather here
    pins context creation to the one moment ranks are guaranteed close
    together; real TPU pods get an ICI warmup for free."""
    global _collectives_warmed
    if _collectives_warmed:
        return
    _collectives_warmed = True
    from jax.experimental import multihost_utils
    np.asarray(multihost_utils.process_allgather(np.int32(0)))


def process_episode_range(n_episodes: int, rank=None, world=None):
    """[start, stop) slice of the global episode list owned by process
    ``rank`` of ``world`` (host-sharded input pipeline). Defaults to the
    live jax process topology."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    per = -(-n_episodes // world)
    return min(rank * per, n_episodes), min((rank + 1) * per, n_episodes)


def process_episode_indices(n_episodes: int, rank=None, world=None):
    """EQUAL-length per-process episode index lists, rank-STRIDED and
    wrap-around padded (torch DistributedSampler semantics).

    - Equal length: every process must run the same number of steps per
      epoch — the GSPMD collectives inside the sharded train step are
      synchronous across the whole world, so an uneven tail rank with
      fewer batches would deadlock the pod; the shortfall wraps around
      the global list.
    - Strided (rank r owns episodes r, r+world, ...): step ``s``'s global
      batch is then episodes [s*B_global, (s+1)*B_global) of the seeded
      sampler stream — the SAME set a single process with the global
      batch size would draw, so multi-host training reproduces the
      single-host trajectory (up to f32 reassociation)."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    if n_episodes == 0:
        return []
    per = -(-n_episodes // world)
    return [(rank + i * world) % n_episodes for i in range(per)]


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of other processes (a real
    multi-host world): host-local numpy batches are then per-process
    SHARDS of the global batch, not the global value itself."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_global(v, sharding: NamedSharding, *,
               broadcast_replicated: bool = False):
    """``device_put`` onto a (possibly process-spanning) sharding WITHOUT
    jax's cross-process value-equality check.

    ``broadcast_replicated=True`` declares that the host value may DIFFER
    across processes (train batches whose augmentation draws from the
    python-global ``random`` stream — reference parity — with an
    unsharded loader, i.e. ``shard_train_loader=False``): a replicated
    put then ships rank 0's bytes to every process first. Stamping
    per-host-different data as "replicated" would make GSPMD insert no
    sync at all — every device computes on its own bytes and the
    "replicated" parameters silently diverge for the rest of the run.
    Batch-SHARDED puts need no broadcast even with divergent hosts: each
    global row is owned by exactly one device, so the global array is
    consistent (each row is that owner host's validly-augmented version
    of the right episode).

    ``jax.device_put`` of a host array onto a sharding that spans every
    process runs ``multihost_utils.assert_equal`` — a full Gloo/ICI
    allgather of the value on EVERY call (jax dispatch.py
    ``_device_put_sharding_impl``). That is O(bytes) cross-host traffic
    per eval batch, and on the CPU backend its 30s key-value-store
    timeout kills a rank whenever a peer is >30s behind (observed live:
    "Gloo context initialization failed: DEADLINE_EXCEEDED" when rank 0
    reached ``replicate_state`` while rank 1 was still compiling under
    host load). The multi-host invariants here guarantee value equality
    by construction — seeded loaders replay the same episode stream on
    every host, and checkpoints/snapshots are byte-broadcast from rank 0
    (core/checkpoint.py) — so build the global array directly from this
    process's addressable shards instead.

    Debugging net: ``PEMP_VERIFY_GLOBAL_PUTS=1`` re-enables an explicit
    cross-host equality check (an 8-byte digest allgather per put, not
    jax's full-value one) — use it when chasing a suspected divergence,
    e.g. CaNet's mutable history stream, whose cross-host equality rests
    on python-global-``random`` lockstep rather than a seed."""
    import os
    if not spans_processes(sharding.mesh):
        return jax.device_put(v, sharding)
    v = np.asarray(v)
    v = v.astype(jax.dtypes.canonicalize_dtype(v.dtype), copy=False)
    if broadcast_replicated and sharding.is_fully_replicated:
        from jax.experimental import multihost_utils
        v = np.asarray(multihost_utils.broadcast_one_to_all(v))
        return jax.make_array_from_callback(v.shape, sharding,
                                            lambda idx: v[idx])
    # the digest check asserts cross-host byte equality, which a
    # DECLARED-divergent put (broadcast_replicated, e.g. multi-host
    # CaNet train batches with global-``random`` augmentation) does not
    # promise for its batch-sharded placements — each global row is
    # owned by exactly one device, so per-host bytes legitimately differ
    if os.environ.get("PEMP_VERIFY_GLOBAL_PUTS") \
            and not broadcast_replicated:
        import hashlib
        from jax.experimental import multihost_utils
        d = hashlib.blake2b(v.tobytes(), digest_size=8).digest()
        digests = np.asarray(multihost_utils.process_allgather(
            np.frombuffer(d, dtype=np.int64)[0]))
        if len(set(digests.reshape(-1).tolist())) > 1:
            raise ValueError(
                "put_global: host value differs across processes "
                f"(shape {v.shape} {v.dtype}, per-rank digests "
                f"{digests.reshape(-1).tolist()}) — the replicated-put "
                "invariant is broken; the worlds would silently diverge")
    return jax.make_array_from_callback(v.shape, sharding,
                                        lambda idx: v[idx])


_GATHER_PROGRAMS = {}


def _gather_identity(x):
    return x


def fetch_global(x) -> np.ndarray:
    """Device->host fetch of a possibly globally-sharded array.

    Under multi-host a jitted eval step returns jax.Arrays whose shards
    live on other processes' devices; ``jax.device_get`` refuses those.
    The replicating identity program below reassembles the global value
    on every host (what ``multihost_utils.process_allgather`` compiles
    for global arrays; the eval outputs are tiny: per-episode counts /
    losses / logits). Fully addressable arrays (single-host, or
    replicated scalars) take the cheap direct path.

    Each distinct (shape, dtype, sharding) is a NEW collective program,
    and a new program creates its Gloo communicator context on its
    FIRST execution with a hard 30s rendezvous window (Parallelism
    semantic 8, docs/DESIGN.md) — first executed mid-run (e.g. CaNet's
    [k]-stacked fused-chunk aux gather, the fast-eval logits gather),
    cross-rank compile skew can exceed that window. So the first use of
    every gather shape follows the same compile-then-barrier discipline
    as the fused train program: lower+compile locally, barrier on the
    init-warmed context, only then execute. Safe because fetch_global
    of a non-addressable array is itself a collective — every rank
    already reaches this call in lockstep."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        key = (x.shape, x.dtype, x.sharding)
        prog = _GATHER_PROGRAMS.get(key)
        if prog is None:
            prog = jax.jit(
                _gather_identity,
                out_shardings=NamedSharding(x.sharding.mesh, P()),
            ).lower(x).compile()
            any_process_flag(False)     # semantic-8 barrier
            _GATHER_PROGRAMS[key] = prog
        return np.asarray(prog(x).addressable_data(0))
    return np.asarray(jax.device_get(x))


def local_rows(x) -> np.ndarray:
    """THIS process's rows (leading axis) of a globally-sharded array,
    in global index order — e.g. the rows that came from this host's
    rank-sharded loader batch. Fully-addressable arrays (single-host or
    replicated) come back whole. Raises when the layout is not
    row-sharded (e.g. replicated-but-non-addressable, which would
    silently duplicate rows)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        starts = [s.index[0].start or 0 for s in shards]
        if len(set(starts)) != len(starts):
            raise ValueError(
                "local_rows needs a batch-row-sharded array; got "
                f"duplicate leading-axis shard offsets {starts} "
                f"(sharding {x.sharding}) — the rows would duplicate")
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def broadcast_scalar_from_rank0(value: int) -> int:
    """Agree on a host-side integer across the world (e.g. the run id
    rank 0 allocated). No-op single-process."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils
    return int(np.asarray(
        multihost_utils.broadcast_one_to_all(np.int64(value))))


def any_process_flag(flag: bool) -> bool:
    """World-OR of a host-side boolean (e.g. "this rank was told to
    stop"). Synchronous across the world — every process must call it
    the same number of times (the trainer does so on a fixed step
    schedule). No-op single-process."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(np.asarray(multihost_utils.process_allgather(
        np.int32(bool(flag)))).max())


def broadcast_bytes_from_rank0(data) -> bytes:
    """Ship rank 0's byte payload (checkpoint files) to every process.

    Rank 0 passes the bytes or ``None``; other ranks' argument is
    ignored. Everyone returns rank 0's bytes, or ``b""`` when rank 0
    had none — the empty result doubles as rank 0's failure signal, so
    a missing checkpoint raises on EVERY rank instead of wedging the
    others inside the broadcast collective. No-op single-process."""
    if jax.process_count() == 1:
        return data or b""
    import struct
    from jax.experimental import multihost_utils
    is_src = jax.process_index() == 0
    # length header as 8 raw uint8 bytes: an int scalar would be
    # canonicalized to int32 on device (x64 disabled) and overflow for
    # >=2 GiB payloads (resume checkpoints carry optimizer moments)
    n = len(data) if (is_src and data is not None) else 0
    hdr = np.frombuffer(struct.pack("<q", n), np.uint8)
    n = struct.unpack("<q", np.asarray(
        multihost_utils.broadcast_one_to_all(hdr)).tobytes())[0]
    if n == 0:
        return b""
    # chunked: broadcast_one_to_all stages its payload through device
    # HBM, and a whole multi-GiB resume checkpoint (params + optimizer
    # moments) would contend with the already-resident replicated train
    # state — bound each collective at 256 MiB instead. Chunk count is
    # derived from the already-agreed length, so every rank issues the
    # same sequence of collectives.
    chunk = 1 << 28
    src = np.frombuffer(data, np.uint8) if is_src else None
    pieces = []
    for off in range(0, n, chunk):
        m = min(chunk, n - off)
        part = src[off:off + m] if is_src else np.zeros(m, np.uint8)
        pieces.append(np.asarray(
            multihost_utils.broadcast_one_to_all(part)).tobytes())
    return b"".join(pieces)
