"""Multi-host (multi-process) mesh initialization — SURVEY §5.8's
`jax.distributed` design point.

The reference never leaves one box (rayon shared memory,
halo2_middleware/src/multicore.rs); the TPU-native framework scales past a
host by letting GSPMD span processes: each host runs the SAME prover
script, `jax.distributed.initialize` wires the PJRT clients into one
global device list, and every `Mesh` built from `jax.devices()` (the
GLOBAL list) makes XLA insert cross-host collectives over DCN exactly
where the single-host mesh used ICI.  No prover code changes: the
engine/mesh objects (dist/mesh.py, dist/msm.py, dist/ntt.py) are already
written against global meshes.

Axis layout guidance (the scaling-book recipe): put the host/DCN axis
OUTERMOST and shard the row dimension over (hosts, local_chips) jointly —
the four-step NTT's all-to-alls then decompose into chip-local exchanges
plus one host-boundary exchange, and MSM bucket reductions psum over the
whole axis (one DCN hop, bandwidth-bound on the small bucket space, not
the points).

On a real TPU pod slice `initialize()` autodetects everything from the
TPU environment; for tests (and the no-cluster CI analog — SURVEY §4.3
item 4) the coordinator/process args are explicit and the platform is
CPU, giving REAL multi-process collectives over the gloo/grpc backend:
tests/test_multihost.py runs the sharded NTT across 2 processes x 4
virtual devices and asserts bit-identity with the single-process result.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Join (or create) the cross-process JAX runtime.

    On TPU pods call with no args (env autodetection).  For CPU-based
    multi-process tests pass all three explicitly BEFORE any jax device
    use."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "rows"):
    """1-D mesh over the GLOBAL device list (all hosts).  Device order
    groups each process's local devices contiguously, so a row-sharded
    array keeps intra-host neighbors on ICI and crosses DCN only at
    process boundaries."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def hybrid_mesh(dcn_axis: str = "hosts", ici_axis: str = "rows"):
    """2-D (hosts, local_devices) mesh: shard the outer loop of a
    decomposition over `hosts` (DCN) and the inner over `rows` (ICI) so
    all-to-alls within a stage stay on ICI.  Uses
    `mesh_utils.create_hybrid_device_mesh` when the topology exposes DCN
    granules; falls back to a (num_processes, local) reshape."""
    import jax
    from jax.sharding import Mesh
    try:
        from jax.experimental import mesh_utils
        devices = mesh_utils.create_hybrid_device_mesh(
            (1, jax.local_device_count()),
            (jax.process_count(), 1))
        return Mesh(devices, (dcn_axis, ici_axis))
    except Exception:
        devs = np.array(jax.devices()).reshape(
            jax.process_count(), jax.local_device_count())
        return Mesh(devs, (dcn_axis, ici_axis))


def put_replicated(mesh, arr):
    """Host data -> globally-replicated device array (every process calls
    this with the SAME host value)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(arr, NamedSharding(mesh, P()))


def put_row_sharded(mesh, arr, axis: str = "rows"):
    """Host data (full array, same on every process) -> row-sharded global
    array; each process materializes only its addressable shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = [None] * arr.ndim
    spec[0] = axis
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: np.asarray(arr)[idx])


def allgather_rows(x):
    """Global array -> full host value on every process (test helper)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x, tiled=True)
