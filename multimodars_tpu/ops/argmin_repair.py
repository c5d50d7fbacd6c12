"""Exact host repair of certification-flagged rotation argmins.

The device sweeps compute squared-Hausdorff costs in the compute dtype
(f32 on TPU; even "f64" on TPU is software-emulated and ulp-differs from
XLA:CPU).  When two candidate angles' costs lie within the rounding band,
the argmin can flip between backends — moving the output geometry by a
whole grid step (the flat-landscape failure observed in
benchmarks/results/tpu_parity.json round 5: an 11-degree flip in the
ivus_full systolic within-chain, 0.585 mm of output delta).

The sweeps therefore return a tie flag per search
(ops.rotation_search._tie_flags), and the orchestration re-decides every
FLAGGED search here in exact f64 numpy — the same grid expressions, the
full ladder, first-wins argmin (process_utils.rs:33-75 +
align_within.rs:193-247 semantics).  Min/max reductions are exactly
associative and every d2 element is a fixed f64 expression, so the host
answer is backend-independent; with certification on, CPU and TPU
pipelines converge to the same angles.  Flags are rare (near-circular
contours only), so the repair costs nothing on typical data.

Disable with MMTPU_CERTIFY_ARGMIN=0 (flags still computed, repairs
skipped — the pre-round-5 behavior).
"""

from __future__ import annotations

import math
import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from .rotation_search import ladder_stages, plan_is_bruteforce

TWO_PI = 2.0 * math.pi

#: process-wide repair counters (observability + tests)
stats = {"flagged": 0, "repaired": 0, "changed": 0}


def certify_enabled() -> bool:
    return os.environ.get("MMTPU_CERTIFY_ARGMIN", "1") != "0"


def _note(msg: str) -> None:
    if os.environ.get("MMTPU_TRACE", "0") == "1":
        print(f"[mmtpu] argmin_repair: {msg}", file=sys.stderr, flush=True)


def hausdorff_sq_host(test: np.ndarray, ref: np.ndarray, theta: float) -> float:
    """Exact f64 squared symmetric Hausdorff of ``rotate(test, theta)`` vs
    ``ref`` (2-D, empty -> 0.0; process_utils.rs:78-121 semantics)."""
    if len(test) == 0 or len(ref) == 0:
        return 0.0
    c, s = math.cos(theta), math.sin(theta)
    rx = test[:, 0] * c - test[:, 1] * s
    ry = test[:, 0] * s + test[:, 1] * c
    dx = rx[:, None] - ref[None, :, 0]
    dy = ry[:, None] - ref[None, :, 1]
    d2 = dx * dx + dy * dy
    return float(max(d2.min(axis=1).max(), d2.min(axis=0).max()))


def _grid(center: float, step_deg: float, range_deg: float, limes_deg: float):
    """The exact candidate grid of rotation_search.candidate_angles for one
    frame (f64 numpy twin of the device expressions)."""
    step = math.radians(step_deg)
    rng = math.radians(range_deg)
    limes = math.radians(limes_deg)
    K = int(math.ceil(2.0 * rng / step)) + 2 if step > 0 else 1
    start = max(center - rng, -limes)
    stop = min(center + rng, limes)
    span_ok = stop >= start
    steps = max(math.ceil((stop - start) / step), 1.0)
    i = np.arange(K, dtype=np.float64)
    raw = start + i * step
    valid = (i <= steps) & (raw <= stop) & span_ok
    return np.mod(raw + math.pi, TWO_PI) - math.pi, valid


def exact_search_range(
    test: np.ndarray,
    ref: np.ndarray,
    step_deg: float,
    range_deg: float,
    center: float,
    limes_deg: float,
) -> float:
    """One exact search stage: first-wins argmin over the grid."""
    if step_deg <= 0.0:
        return center
    angles, valid = _grid(center, step_deg, range_deg, limes_deg)
    best_cost = math.inf
    best = float(angles[0])
    for k in np.nonzero(valid)[0]:
        cost = hausdorff_sq_host(test, ref, float(angles[k]))
        if cost < best_cost:
            best_cost = cost
            best = float(angles[k])
    return best if best_cost < math.inf else float(angles[0])


def exact_ladder(
    test: np.ndarray,
    ref: np.ndarray,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
) -> float:
    """The full multi-resolution ladder (or single brute-force sweep) in
    exact f64 — the backend-independent spec of the device search.  Inputs
    are the CENTERED f64 sample sets the device sweep used (uncast)."""
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True  # same plan collapse as chain/multires dispatch
    if bruteforce:
        return exact_search_range(
            test, ref, float(step_deg), float(range_deg), 0.0, float(range_deg)
        )
    best = 0.0
    for stage_step, stage_range, centered in ladder_stages(
        float(step_deg), float(range_deg)
    ):
        center = best if centered else 0.0
        best = exact_search_range(
            test, ref, stage_step, stage_range, center, float(range_deg)
        )
    return best


def split_packed(flat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a packed ``[2n]`` pull (angles | tie flags) into
    ``(angles [n], ties bool[n])``."""
    n = flat.shape[0] // 2
    return flat[:n], flat[n:] > 0.5


def repair_chain_deltas(
    delta: np.ndarray,
    ties: np.ndarray,
    pts: np.ndarray,
    mask: Optional[np.ndarray],
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
) -> np.ndarray:
    """Re-decide flagged pairs of a within-chain search exactly.

    ``pts``: the f64 ``[F, S, 2]`` centered sample sets the sweep used
    (pair i = test ``pts[i+1]`` vs ref ``pts[i]``); ``mask``: [F, S] or
    None (dense).  Returns ``delta`` with flagged entries replaced."""
    flagged = np.nonzero(ties)[0]
    if len(flagged) == 0:
        return delta
    stats["flagged"] += len(flagged)
    if not certify_enabled():
        return delta
    delta = np.array(delta, dtype=np.float64, copy=True)
    for i in flagged:
        t = pts[i + 1] if mask is None else pts[i + 1][mask[i + 1]]
        r = pts[i] if mask is None else pts[i][mask[i]]
        exact = exact_ladder(
            np.asarray(t, np.float64), np.asarray(r, np.float64),
            step_deg, range_deg, bruteforce,
        )
        stats["repaired"] += 1
        if exact != delta[i]:
            stats["changed"] += 1
            _note(
                f"chain pair {i}: {math.degrees(delta[i]):+.4f} deg -> "
                f"{math.degrees(exact):+.4f} deg (exact f64)"
            )
        delta[i] = exact
    return delta


def repair_between(
    rotations: np.ndarray,
    ties: np.ndarray,
    clouds: List[Tuple[np.ndarray, np.ndarray]],
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
) -> np.ndarray:
    """Re-decide flagged between-geometry searches exactly.

    ``clouds``: [(reference_xy, target_xy)] raw (uncentered) f64 clouds per
    slot — the pivot (reference mean) and centering replicate
    align_between.find_best_rotation_between."""
    flagged = np.nonzero(ties)[0]
    if len(flagged) == 0:
        return rotations
    stats["flagged"] += len(flagged)
    if not certify_enabled():
        return rotations
    rotations = np.array(rotations, dtype=np.float64, copy=True)
    for k in flagged:
        reference_xy, target_xy = clouds[k]
        pivot = reference_xy.mean(axis=0)
        exact = exact_ladder(
            np.asarray(target_xy - pivot, np.float64),
            np.asarray(reference_xy - pivot, np.float64),
            step_deg, range_deg, bruteforce,
        )
        stats["repaired"] += 1
        if exact != rotations[k]:
            stats["changed"] += 1
            _note(
                f"between slot {k}: {math.degrees(rotations[k]):+.4f} deg "
                f"-> {math.degrees(exact):+.4f} deg (exact f64)"
            )
        rotations[k] = exact
    return rotations
