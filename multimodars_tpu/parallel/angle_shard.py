"""Angle-axis sharding: one pullback's rotation search over a device mesh.

The cohort path (``parallel.cohort``) scales by data-parallelism over frame
pairs.  When a *single* pullback must use the whole mesh — few pairs, huge
candidate grids (fine steps / brute force) — the other parallel axis is the
candidate-angle grid itself (SURVEY §2.5: the reference's rayon
``par_iter`` over angles, process_utils.rs:69-74).

Layout: every device holds the full (replicated) point sets and a 1/D slice
of each stage's candidate grid; it evaluates its slice's masked-Hausdorff
costs and reduces its local argmin.  One ``all_gather`` of D (cost, index)
scalars per pair — the pmin-style argmin — recovers the exact global
first-wins argmin, because global candidate indices are device-major and
ties resolve to the smallest global index.  ICI traffic is D scalars per
pair per stage; the [F, K/D, N, M] cost evaluation never crosses devices.

Results are bit-identical across mesh sizes (the argmin reduction is
exact); versus the fused single-device jit the eager grid construction can
differ by one ulp of angle (asserted in tests/test_parallel.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..config import config
from ..ops.rotation_search import (
    _normalize_angle,
    ladder_stages,
    rotation_cost_table,
)
from ..utils.device import to_device


def angle_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the candidate-angle axis.  The no-argument
    default honors a CPU-pinned process (config.default_devices)."""
    if devices is None:
        from ..config import default_devices

        devices = default_devices()
    return Mesh(np.array(devices), ("angles",))


def _candidate_grid_padded(centers, step_deg, range_deg, limes_deg, n_dev):
    """The exact candidate grid of ops.rotation_search.candidate_angles,
    padded along K to a multiple of the device count (padding invalid)."""
    step = math.radians(step_deg)
    rng = math.radians(range_deg)
    limes = math.radians(limes_deg)
    K = int(math.ceil(2.0 * rng / step)) + 2 if step > 0 else 1
    K_pad = ((K + n_dev - 1) // n_dev) * n_dev

    start = jnp.maximum(centers - rng, -limes)
    stop = jnp.minimum(centers + rng, limes)
    span_ok = stop >= start
    steps = jnp.maximum(jnp.ceil((stop - start) / step), 1.0)

    i = jnp.arange(K_pad, dtype=centers.dtype)
    raw = start[:, None] + i[None, :] * step
    valid = (
        (i[None, :] <= steps[:, None])
        & (raw <= stop[:, None])
        & span_ok[:, None]
        & (i[None, :] < K)
    )
    return _normalize_angle(raw), valid, K_pad


def _sharded_stage(test, ref, tmask, rmask, angles, valid, mesh: Mesh):
    """One search stage with the K axis sharded over the mesh; returns the
    global best candidate index [F] (first-wins over the full grid)."""
    n_dev = mesh.devices.size
    K_pad = angles.shape[1]
    k_local = K_pad // n_dev

    # the all_gather makes the output value identical on every device, but
    # the static replication checker can't prove it — disable the check
    # (kwarg name varies across jax versions)
    specs = dict(
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, "angles"), P(None, "angles")),
        out_specs=P(),
    )

    def _wrap(fn):
        try:
            return shard_map(fn, check_vma=False, **specs)
        except TypeError:  # pragma: no cover - older jax
            return shard_map(fn, check_rep=False, **specs)

    @_wrap
    def stage(test, ref, tm, rm, ang, val):
        costs = rotation_cost_table(test, ref, tm, rm, ang, val)  # [F, K/D]
        loc_k = jnp.argmin(costs, axis=1)
        loc_c = jnp.take_along_axis(costs, loc_k[:, None], axis=1)[:, 0]
        dev = lax.axis_index("angles")
        glob_k = dev * k_local + loc_k
        all_c = lax.all_gather(loc_c, "angles")  # [D, F]
        all_k = lax.all_gather(glob_k, "angles")
        m = all_c.min(axis=0)
        big = jnp.asarray(K_pad, all_k.dtype)
        best = jnp.where(all_c == m[None, :], all_k, big).min(axis=0)
        # all-invalid rows (cost +inf everywhere): slot 0, like the
        # single-device path's degenerate-grid clamp
        return jnp.where(jnp.isinf(m), jnp.zeros_like(best), best)

    return stage(test, ref, tmask, rmask, angles, valid)


def sharded_multires_search(
    test: np.ndarray,
    ref: np.ndarray,
    test_mask: np.ndarray,
    ref_mask: np.ndarray,
    step_deg: float,
    range_deg: float,
    mesh: Optional[Mesh] = None,
    bruteforce: bool = False,
) -> np.ndarray:
    """The full multi-resolution ladder (or brute-force sweep) with each
    stage's candidate grid sharded over the mesh's angle axis.

    Bit-identical across mesh sizes and within one ulp of
    ``ops.rotation_search.multires_rotation_search``; use when one
    pullback's search must span several chips.
    """
    if mesh is None:
        mesh = angle_mesh()
    n_dev = mesh.devices.size
    dtype = config.compute_dtype
    F = test.shape[0]

    rep = NamedSharding(mesh, P())
    test_d = to_device(test, dtype, rep)
    ref_d = to_device(ref, dtype, rep)
    tm_d = to_device(test_mask, sharding=rep)
    rm_d = to_device(ref_mask, sharding=rep)

    centers = jnp.zeros((F,), dtype=dtype)
    stages = (
        [(float(step_deg), float(range_deg), False)]
        if bruteforce
        else ladder_stages(float(step_deg), float(range_deg))
    )
    best = centers
    for stage_step, stage_range, centered in stages:
        stage_centers = best if centered else centers
        if stage_step <= 0.0:
            best = stage_centers
            continue
        angles, valid, _ = _candidate_grid_padded(
            stage_centers, stage_step, stage_range, float(range_deg), n_dev
        )
        sharding = NamedSharding(mesh, P(None, "angles"))
        k_best = _sharded_stage(
            test_d,
            ref_d,
            tm_d,
            rm_d,
            jax.device_put(angles, sharding),
            jax.device_put(valid, sharding),
            mesh,
        )
        any_valid = valid.any(axis=1)
        picked = jnp.take_along_axis(angles, k_best[:, None], axis=1)[:, 0]
        best = jnp.where(any_valid, picked, angles[:, 0])
    return np.asarray(best)
