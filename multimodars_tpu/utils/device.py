"""Host→device transfer helpers.

Over a tunneled/remote backend every *eager* op dispatch costs a full
round-trip (~30–140 ms measured on the axon tunnel), while plain array
transfers are ~1 ms/MB.  ``jnp.asarray(x, dtype=...)`` on a host array whose
dtype differs dispatches an eager ``convert_element_type`` on the device —
the single most expensive innocent-looking line in a host/device pipeline.

Rule: cast on the host with numpy, then transfer; never let an eager device
op sneak into the boundary.
"""

from __future__ import annotations

import contextlib
import contextvars

import numpy as np

# Active multi-chip layout for the CCTA device waves (None = single device).
# When a mesh is active, ``to_device`` places arrays tagged kind="rows"
# sharded over their leading axis and everything else replicated, so the
# UNCHANGED orchestration (label waves, NN passes, morph chains) runs as an
# SPMD program over the mesh.  Integer count/argmin outputs are exact under
# any row partition (per-row arithmetic never crosses the shard boundary and
# the column reductions stay device-local), so results are bit-identical to
# the single-device and host paths — certified in tests/test_parallel.py and
# the driver dry run.
_rows_mesh: contextvars.ContextVar = contextvars.ContextVar(
    "mmtpu_rows_mesh", default=None
)


@contextlib.contextmanager
def shard_rows_over(mesh):
    """Run CCTA device waves row-sharded over ``mesh`` (1-D, any axis name).

    The multi-chip layout of the labeling/scaling stage: query rows split
    across the mesh (pure data parallelism), target clouds replicate (a few
    MB at clinical sizes), no collectives in the hot loops.  Analog of the
    reference letting rayon split its row loops over cores
    (label_coronary.rs:89-175, scale_coronary.rs:188-243)."""
    token = _rows_mesh.set(mesh)
    try:
        yield mesh
    finally:
        _rows_mesh.reset(token)


def active_rows_mesh():
    return _rows_mesh.get()


def _mesh_sharding(mesh, arr, kind):
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    if (
        kind == "rows"
        and arr.ndim >= 1
        and arr.shape[0] >= n_dev
        and arr.shape[0] % n_dev == 0
    ):
        return NamedSharding(mesh, PartitionSpec(axis))
    return NamedSharding(mesh, PartitionSpec())


def to_device(x, dtype=None, sharding=None, kind=None):
    """Host-cast ``x`` to ``dtype`` (numpy), then transfer in one hop.

    ``sharding``: optional jax sharding — uses ``jax.device_put`` onto it.
    ``kind``: multi-chip placement tag, honored only inside a
    :func:`shard_rows_over` context — "rows" shards the leading axis over
    the active mesh (when divisible; falls back to replicated), anything
    else replicates.
    """
    import jax
    import jax.numpy as jnp

    arr = np.asarray(x)
    if dtype is not None and arr.dtype != np.dtype(dtype):
        arr = arr.astype(dtype)
    if sharding is None:
        mesh = _rows_mesh.get()
        if mesh is not None:
            sharding = _mesh_sharding(mesh, arr, kind)
    if sharding is not None:
        return jax.device_put(arr, sharding)
    return jnp.asarray(arr)
