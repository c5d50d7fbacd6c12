"""Multi-chip CCTA neighbour counting: rows sharded over a device mesh.

The CCTA labeling kernels' hottest primitive is the radius neighbour count
(the R-tree ``locate_within_distance`` analog of
``label_coronary.rs:195-225`` / ``scale_coronary.rs:263-420``).  Its row
axis is embarrassingly parallel, so the multi-chip layout is pure data
parallelism: the query rows split across the mesh, the target cloud is
replicated (it is a few MB at clinical sizes), and the scan-tiled
diff-form count from ``ccta.kernels`` runs unchanged on every shard — no
collectives at all.  Per-row arithmetic is independent of the partition,
so counts are bit-identical across mesh sizes, and the same
dual-threshold certification routes rounding-band rows to the exact f64
host recount, keeping results identical to the host grid path for every
input.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ccta.kernels import (
    _COUNT_B_SLICE,
    _FAR,
    _count_band_window_block,
    _count_rows_exact_host,
    _pow2_at_least,
)
from ..config import config


def rows_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the query-row axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), ("rows",))


def sharded_count_within_radius(
    a: np.ndarray,
    b: np.ndarray,
    radius: float,
    mesh: Optional[Mesh] = None,
    dtype=None,
) -> np.ndarray:
    """Radius neighbour count with the query rows sharded over ``mesh``.

    Semantics: for each row of ``a``, the number of rows of ``b`` with
    squared distance <= radius^2 (inclusive) — identical to
    ``ccta.kernels.count_within_radius`` for every input, certified by the
    same rounding-band + exact-recount construction.
    """
    a64 = np.ascontiguousarray(a, dtype=np.float64).reshape(-1, 3)
    b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(-1, 3)
    if len(a64) == 0 or len(b64) == 0:
        return np.zeros(len(a64), dtype=np.int64)
    if mesh is None:
        mesh = rows_mesh()
    if dtype is None:
        dtype = config.compute_dtype
    n_dev = int(mesh.devices.size)

    # same centering + rigorous rounding band as _count_device_dispatch
    r2 = radius * radius
    mid = 0.5 * (
        np.minimum(a64.min(axis=0), b64.min(axis=0))
        + np.maximum(a64.max(axis=0), b64.max(axis=0))
    )
    ac = a64 - mid
    bc = b64 - mid
    maxc = float(max(np.abs(ac).max(), np.abs(bc).max(), 1e-30))
    eps = float(np.finfo(np.dtype(dtype)).eps)
    band = (24.0 * radius * maxc + 10.0 * r2) * eps
    import jax.numpy as jnp

    r2lo = jnp.asarray(r2 - band, dtype)
    r2hi = jnp.asarray(r2 + band, dtype)

    # pad rows to a device multiple (pad rows live at the _FAR sentinel and
    # count zero), pad columns to the scan tile
    n_pad = max(_pow2_at_least(len(ac), 1024), n_dev)
    n_pad += (-n_pad) % n_dev
    a_pad = np.full((n_pad, 3), _FAR)
    a_pad[: len(ac)] = ac
    m_pad = _pow2_at_least(len(bc), 1024)
    b_pad = np.full((m_pad, 3), _FAR)
    b_pad[: len(bc)] = bc

    row_sharding = NamedSharding(mesh, P("rows"))
    rep_sharding = NamedSharding(mesh, P())
    a_d = jax.device_put(a_pad.astype(np.dtype(dtype).name), row_sharding)
    b_d = jax.device_put(b_pad.astype(np.dtype(dtype).name), rep_sharding)

    ch = min(_COUNT_B_SLICE, m_pad)
    out = np.asarray(
        _count_band_window_block(a_d, b_d, jnp.asarray(0), r2lo, r2hi, ch, m_pad)
    )  # sign-bit-packed int32: near = sign, count = low 31 bits
    counts = (out[: len(a64)].astype(np.int64)) & 0x7FFFFFFF
    near = out[: len(a64)] < 0
    if near.any():
        counts[near] = _count_rows_exact_host(
            np.ascontiguousarray(a64[near]), b64, r2
        )
    return counts
