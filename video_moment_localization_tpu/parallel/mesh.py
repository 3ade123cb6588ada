"""Device mesh + sharding utilities.

The reference is strictly single-process/single-device (reference
main.py:287; SURVEY.md §2.10). Here data parallelism is first-class and
TPU-native: a 1-D ``data`` mesh over the slice, batches sharded along axis 0
across ICI, parameters/optimizer state replicated. Gradients are averaged by
the all-reduce XLA inserts when a jitted step consumes a data-sharded batch
against replicated parameters — no hand-written communication backend
(SURVEY.md §5.8 disposition).

Multi-host: `initialize_distributed()` gates `jax.distributed.initialize`
(one JAX process per host); `jax.devices()` then lists every chip in the
job, process-major. The data axis spans hosts — its gradient all-reduce
rides ICI within a slice and DCN across slices — while `arrange_2d` keeps
the seq axis inside one host so sequence-parallel collectives (the
latency-sensitive per-layer halo/psum traffic) never cross DCN. Per-host
input feeding uses `jax.make_array_from_process_local_data`: each process
loads only its shard of the global batch (`BatchLoader(shard_id=...,
num_shards=...)`) and `put_batch` assembles the global sharded array.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_moment_localization_tpu.data.datasets import TENSOR_KEYS

DATA_AXIS = "data"


_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX when configured; no-op otherwise.

    Configuration comes from the arguments or, when they are None, the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) or JAX's cluster auto-detection (Cloud TPU / SLURM /
    GKE). Returns True when running multi-process. Safe to call twice
    (second call is a no-op). Single-host hardware with no cluster config
    (this environment) returns False.

    `jax.distributed.initialize` must run before anything touches the XLA
    backend, so this must be the process's first JAX-facing call — it is
    tracked with a module flag rather than `jax.process_count()` (which
    would itself initialize the backend and poison the real init).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return jax.process_count() > 1
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # JAX's own cluster auto-detection covers SLURM/OpenMPI/GKE/Cloud TPU
    # but has no plain-env-var cluster, so honor the documented
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID here (tests/test_multiprocess.py
    # launches real 2-process CPU jobs through exactly this path).
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    explicit = addr is not None or num_processes is not None
    try:
        if explicit:
            plats = str(getattr(jax.config, "jax_platforms", None)
                        or os.environ.get("JAX_PLATFORMS", ""))
            if "cpu" in plats:
                # Cross-process collectives on the CPU backend need the
                # gloo implementation (TPU uses ICI/DCN natively); must be
                # configured before the backend initializes.
                try:
                    jax.config.update(
                        "jax_cpu_collectives_implementation", "gloo")
                except Exception:  # older jax: option absent
                    pass
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()  # cluster auto-detection
    except (ValueError, RuntimeError):
        if explicit:
            # Explicitly configured multi-process launch that cannot init
            # (bad config, or JAX already used) must fail loudly.
            raise
        return False  # nothing auto-detected: ordinary single-process run
    _distributed_initialized = True
    if jax.process_count() > 1:
        # First cross-process collective NOW, while the processes are
        # perfectly synchronized by the init barrier: gloo's first
        # connectFullMesh rendezvous has a hard ~30 s window, and anything
        # later (imports, dataset loads, compiles) can skew processes past
        # it on contended hosts. This all-device psum also acts as a
        # barrier, re-synchronizing the processes for the per-axis clique
        # warmups in Trainer.__init__ (see warmup_collectives).
        warmup_collectives(Mesh(np.asarray(jax.devices()), ("all",)))
    return jax.process_count() > 1


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices.

    Multi-host: `jax.devices()` is process-major, so each host's chips are
    a contiguous block of the data axis — per-host batch shards are
    contiguous row ranges and the all-reduce tree keeps intra-host traffic
    on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def arrange_2d(devices: Sequence[Any], seq: int) -> np.ndarray:
    """(data, seq) device grid with the seq axis confined to one host.

    Sequence-parallel collectives run once per SMI layer (latency-bound);
    the data-axis gradient all-reduce runs once per step. So the seq axis
    must stay on ICI while the data axis may span DCN. `jax.devices()` is
    process-major: reshaping to (nd, seq) keeps each seq row within one
    process iff seq divides the per-process device count — validated here.
    """
    devices = list(devices)
    total = len(devices)
    if total % seq != 0:
        raise ValueError(f"device count ({total}) not divisible by seq ({seq})")
    grid = np.asarray(devices).reshape(total // seq, seq)
    for row in grid:
        procs = {getattr(d, "process_index", 0) for d in row}
        if len(procs) > 1:
            raise ValueError(
                "seq axis would span hosts (processes "
                f"{sorted(procs)}): sequence-parallel collectives must stay "
                "on ICI. Use seq_devices that divides the per-host chip "
                "count ({} per host here).".format(
                    sum(1 for d in devices
                        if getattr(d, "process_index", 0)
                        == getattr(devices[0], "process_index", 0)))
            )
    return grid


def warmup_collectives(mesh: Mesh) -> None:
    """Establish every cross-process communicator clique NOW, while the
    processes are still time-synchronized from jax.distributed.initialize.

    Root cause of the round-3 multiprocess flake: gloo (XLA:CPU's
    cross-process collective backend) gives the FIRST collective's
    connectFullMesh rendezvous a hard ~30 s window. When the first
    collective only runs inside the train step, each process must first
    finish the heavyweight step compile — and compile-time skew between
    processes (cold caches, contended hosts) blows the window ('Gloo
    context initialization failed'). A one-element-per-device psum
    compiles in milliseconds on every process, so running it here bounds
    the rendezvous skew by the init barrier itself; all later collectives
    reuse the established contexts. Cliques warmed: the full mesh (the
    gradient/metric all-reduce) and, on multi-axis meshes, each axis's
    subsets (batch-axis reduces; seq-axis collectives are intra-host by
    arrange_2d and need no gloo, but warming them is ~free).

    TPU backends (ICI/DCN) have no such rendezvous; single-process runs
    return immediately.
    """
    if jax.process_count() <= 1:
        return
    from jax import shard_map
    import jax.numpy as jnp  # noqa: F401  (traced psum below)

    names = tuple(mesh.axis_names)
    shape = tuple(mesh.shape[a] for a in names)
    sharding = NamedSharding(mesh, P(*names))
    arr = jax.make_array_from_callback(
        shape, sharding, lambda idx: np.ones([1] * len(shape), np.float32))
    reduce_sets = [names] if len(names) == 1 else [names, *[(a,) for a in names]]
    for axes in reduce_sets:
        out_spec = P(*[None if n in axes else n for n in names])
        out = jax.jit(shard_map(
            lambda x, axes=axes: jax.lax.psum(x, axes), mesh=mesh,
            in_specs=P(*names), out_specs=out_spec))(arr)
        jax.block_until_ready(out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_BATCH_ARRAY_KEYS = TENSOR_KEYS + ("sample_mask",)


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip host-only metadata, keeping the fixed-shape arrays."""
    return {k: batch[k] for k in _BATCH_ARRAY_KEYS if k in batch}


def put_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Host batch -> device arrays sharded along the batch axis.

    Single-process: one sharded device_put. Multi-host: `batch` holds only
    this process's rows (a contiguous slice of the global batch, from
    `BatchLoader(shard_id=process_index, num_shards=process_count)`);
    `jax.make_array_from_process_local_data` assembles the global array
    without any cross-host copy.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in device_batch(batch).items()
        }
    return {k: jax.device_put(v, sharding) for k, v in device_batch(batch).items()}


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
