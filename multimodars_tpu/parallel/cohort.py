"""Batched multi-patient registration over a device mesh.

The registration workload's parallel axes are (patients, frame pairs,
angle candidates).  Frame pairs are independent (see align_within), so the
natural multi-chip layout is data parallelism over the concatenated
patients x frame-pairs axis: each chip owns a contiguous slab of pairs and
runs the identical multi-resolution sweep; no collectives are needed in the
hot loop (the argmin is per-pair), so ICI traffic is zero and scaling is
linear until the per-chip pair count stops saturating the VPU.

The reference's analog is ``RAYON_NUM_THREADS`` work-stealing on one CPU
(SURVEY.md §2.5); here the mesh axis *is* the thread pool.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import config
from ..models.geometry import PyGeometry
from ..utils.device import to_device
from ..ops.rotation_search import (
    multires_rotation_search_packed3,
)


def cohort_mesh(devices: Optional[Sequence] = None, axis: str = "pairs") -> Mesh:
    """1-D device mesh over the pair axis.  The no-argument default honors
    a CPU-pinned process (config.default_devices), so pinned subprocess
    tiers never open the single-client accelerator tunnel."""
    if devices is None:
        from ..config import default_devices

        devices = default_devices()
    return Mesh(np.array(devices), (axis,))


def batched_pairs_from_geometries(
    geometries: List[PyGeometry],
    sample_size: int,
    pad_pairs_to: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[int]]:
    """Concatenate every geometry's consecutive-frame pairs into one batch:
    (test, ref, test_mask, ref_mask, pair_counts)."""
    import math

    from ..pipelines.align_within import _pack_centered_sets

    packed = []
    pair_counts = []
    for geometry in geometries:
        if not geometry.frames:
            raise ValueError("Geometry contains no frames")
        if geometry.frames[0].lumen.n_points == 0:
            raise ValueError("Lumen contours have no points")
        ratio = sample_size / len(geometry.frames[0].lumen.points)
        catheter0 = geometry.frames[0].extras.get("Catheter")
        ssc = (
            int(math.ceil(len(catheter0.points) * ratio)) if catheter0 is not None else None
        )
        pts, mask = _pack_centered_sets(geometry, sample_size, ssc)
        packed.append((pts, mask))
        pair_counts.append(pts.shape[0] - 1)

    S = max(p.shape[1] for p, _ in packed)
    tests, refs, tmasks, rmasks = [], [], [], []
    for pts, mask in packed:
        F, s = pts.shape[:2]
        pp = np.zeros((F, S, 2))
        pp[:, :s] = pts
        mm = np.zeros((F, S), dtype=bool)
        mm[:, :s] = mask
        tests.append(pp[1:])
        refs.append(pp[:-1])
        tmasks.append(mm[1:])
        rmasks.append(mm[:-1])

    test = np.concatenate(tests)
    ref = np.concatenate(refs)
    tmask = np.concatenate(tmasks)
    rmask = np.concatenate(rmasks)

    if pad_pairs_to is not None and test.shape[0] < pad_pairs_to:
        extra = pad_pairs_to - test.shape[0]
        test = np.concatenate([test, np.zeros((extra,) + test.shape[1:])])
        ref = np.concatenate([ref, np.zeros((extra,) + ref.shape[1:])])
        tmask = np.concatenate([tmask, np.zeros((extra,) + tmask.shape[1:], dtype=bool)])
        rmask = np.concatenate([rmask, np.zeros((extra,) + rmask.shape[1:], dtype=bool)])
    return test, ref, tmask, rmask, pair_counts


# Peak sweep throughput on v5e lands at ~1100 pairs per dispatch: XLA's
# tiling of the batched cost reduction degrades past ~2000 pairs (measured
# 35.5 -> 48.6 pullbacks/s on a 16x279-pair cohort when split), and because
# dispatch is asynchronous the waves pipeline — each wave's h2d transfer and
# launch hide behind the previous wave's compute, so splitting costs no
# extra round-trips.  The cap is a per-device pair count; multi-device
# meshes split at the same per-device granularity.
_MAX_PAIRS_PER_WAVE = 1116


def cohort_relative_rotations(
    test: np.ndarray,
    ref: np.ndarray,
    test_mask: np.ndarray,
    ref_mask: np.ndarray,
    step_deg: float,
    range_deg: float,
    mesh: Optional[Mesh] = None,
    bruteforce: bool = False,
) -> np.ndarray:
    """Run the multi-resolution rotation sweep for a batch of frame pairs,
    sharded over the mesh's pair axis.  The pair count must divide the mesh
    size (pad with masked-out pairs otherwise).

    Large cohorts are dispatched in pipelined waves of
    ``_MAX_PAIRS_PER_WAVE`` pairs per device: every wave is enqueued before
    any result is pulled, so the device never idles between waves while the
    per-dispatch batch stays in the sweep kernel's peak-throughput regime.
    Host (numpy) inputs are transferred wave by wave, overlapping each h2d
    with the previous wave's compute; ``jax.Array`` inputs skip the host
    round-trip but are still cast to the compute dtype and re-laid onto the
    mesh sharding device-side (a no-op when they already match), so the
    sharded contract holds for both input kinds."""
    if mesh is None:
        mesh = cohort_mesh()
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    dtype = config.compute_dtype
    n_dev = mesh.devices.size
    F = test.shape[0]
    wave = _MAX_PAIRS_PER_WAVE * n_dev

    def _slab(x, start, end, cast_dtype=None):
        sl = x[start:end]
        if isinstance(x, jax.Array):
            if cast_dtype is not None and sl.dtype != jnp.dtype(cast_dtype):
                sl = sl.astype(cast_dtype)
            return jax.device_put(sl, sharding)
        return to_device(sl, cast_dtype, sharding)

    handles = []
    for start in range(0, F, wave):
        end = min(start + wave, F)
        handles.append(
            multires_rotation_search_packed3(
                _slab(test, start, end, dtype),
                _slab(ref, start, end, dtype),
                _slab(test_mask, start, end),
                _slab(ref_mask, start, end),
                float(step_deg), float(range_deg), bool(bruteforce),
            )
        )
    for h in handles:
        try:
            h.copy_to_host_async()
        except Exception:
            pass
    flats = [np.asarray(h, dtype=np.float64) for h in handles]
    best = np.concatenate([f[: len(f) // 3] for f in flats])
    codes = np.concatenate(
        [np.rint(f[len(f) // 3 : 2 * (len(f) // 3)]).astype(np.int64) for f in flats]
    )
    centers = np.concatenate([f[2 * (len(f) // 3) :] for f in flats])
    if (codes > 0).any():
        # tiered re-decision of certification-flagged pairs in ONE batch
        # (stage-attributed f64 device re-sweep + exact host residue —
        # ops.argmin_repair)
        from ..ops.argmin_repair import certify_enabled, repair_pairs, stats

        flagged = np.nonzero(codes > 0)[0]
        if certify_enabled():
            best = np.array(best, dtype=np.float64, copy=True)
            t_h = np.asarray(test, dtype=np.float64)
            r_h = np.asarray(ref, dtype=np.float64)
            tm_h = np.asarray(test_mask)
            rm_h = np.asarray(ref_mask)
            best[flagged] = repair_pairs(
                [t_h[j][tm_h[j]] for j in flagged],
                [r_h[j][rm_h[j]] for j in flagged],
                float(step_deg), float(range_deg), bool(bruteforce),
                codes=[codes[j] for j in flagged],
                centers=[centers[j] for j in flagged],
            )
        else:
            stats["flagged"] += len(flagged)
    return best
