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
    """One exact search stage: first-wins argmin over the grid.

    Deliberately a scalar per-angle loop: an angle-chunked [G, N, M]
    vectorization measured 6x SLOWER on this host (three ~100 MB
    temporaries fault fresh pages per chunk, while the per-angle [N, M]
    temporaries stay page-warm)."""
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


def split_chain_packed(
    flat: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a chain pull ``[3n]`` (angles | tie codes | final-stage
    centers) into ``(angles [n], codes int[n], centers [n])``.  Code 0 =
    certified, 1 = final-stage tie only, 2/3 = earlier stage tied."""
    n = flat.shape[0] // 3
    return (
        flat[:n],
        np.rint(flat[n : 2 * n]).astype(np.int64),
        flat[2 * n :],
    )


def _device_f64_retier(
    test_sets: List[np.ndarray],
    ref_sets: List[np.ndarray],
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
):
    """Tier-2 repair: re-run the flagged searches' full ladder in f64 ON
    DEVICE as one batched dispatch (the same sweep kernels, f64 inputs —
    on TPU this is emulated f64, matching XLA:CPU f64 to ~1e-14).
    Returns ``(angles [T], still_tied bool[T])`` — residual ties inside
    the f64 band fall through to the exact host tier.  Returns None when
    the original sweep already ran in f64 (a re-run adds nothing) or the
    batch fails to build."""
    from ..config import config

    if np.dtype(config.compute_dtype) == np.float64:
        return None
    try:
        from ..utils.device import to_device
        from .rotation_search import multires_rotation_search_packed

        T = len(test_sets)
        S = max(max(len(t) for t in test_sets), max(len(r) for r in ref_sets))
        # pad the batch width to a small bucket so recompiles are bounded
        # across varying flag counts
        T_pad = max(8, 1 << (T - 1).bit_length())
        test = np.zeros((T_pad, S, 2))
        ref = np.zeros((T_pad, S, 2))
        tmask = np.zeros((T_pad, S), dtype=bool)
        rmask = np.zeros((T_pad, S), dtype=bool)
        for k, (t, r) in enumerate(zip(test_sets, ref_sets)):
            test[k, : len(t)] = t
            ref[k, : len(r)] = r
            tmask[k, : len(t)] = True
            rmask[k, : len(r)] = True
        flat = np.asarray(
            multires_rotation_search_packed(
                to_device(test, np.float64),
                to_device(ref, np.float64),
                to_device(tmask),
                to_device(rmask),
                float(step_deg), float(range_deg), bool(bruteforce),
            ),
            dtype=np.float64,
        )
        best, tie = split_packed(flat)
        return best[:T], tie[:T]
    except Exception:  # pragma: no cover - backend without f64 support
        return None


def repair_chain_deltas(
    delta: np.ndarray,
    ties: np.ndarray,
    pts: np.ndarray,
    mask: Optional[np.ndarray],
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
) -> np.ndarray:
    """Re-decide flagged pairs of a within-chain search.

    Tiered: flagged pairs first re-sweep in f64 on device (one batched
    dispatch — on flat clinical/fine-step landscapes a quarter of the
    pairs can flag in f32, and a per-pair host ladder would cost ~0.3 s
    each); pairs still tied within the f64 band then re-decide in exact
    host f64.  ``pts``: the f64 ``[F, S, 2]`` centered sample sets the
    sweep used (pair i = test ``pts[i+1]`` vs ref ``pts[i]``); ``mask``:
    [F, S] or None (dense).  Returns ``delta`` with flagged entries
    replaced."""
    flagged = np.nonzero(ties)[0]
    if len(flagged) == 0:
        return delta
    stats["flagged"] += len(flagged)
    if not certify_enabled():
        return delta
    delta = np.array(delta, dtype=np.float64, copy=True)

    def sets(i):
        t = pts[i + 1] if mask is None else pts[i + 1][mask[i + 1]]
        r = pts[i] if mask is None else pts[i][mask[i]]
        return np.asarray(t, np.float64), np.asarray(r, np.float64)

    pair_sets = [sets(i) for i in flagged]
    tier2 = _device_f64_retier(
        [t for t, _ in pair_sets], [r for _, r in pair_sets],
        step_deg, range_deg, bruteforce,
    )
    host_idx = range(len(flagged))
    if tier2 is not None:
        best64, tie64 = tier2
        for k, i in enumerate(flagged):
            if not tie64[k]:
                stats["repaired"] += 1
                if best64[k] != delta[i]:
                    stats["changed"] += 1
                delta[i] = best64[k]
        host_idx = [k for k in range(len(flagged)) if tie64[k]]
    for k in host_idx:
        i = flagged[k]
        t, r = pair_sets[k]
        exact = exact_ladder(t, r, step_deg, range_deg, bruteforce)
        stats["repaired"] += 1
        stats["host_exact"] = stats.get("host_exact", 0) + 1
        if exact != delta[i]:
            stats["changed"] += 1
            _note(
                f"chain pair {i}: {math.degrees(delta[i]):+.4f} deg -> "
                f"{math.degrees(exact):+.4f} deg (exact f64)"
            )
        delta[i] = exact
    return delta


def repair_pairs(
    test_sets: List[np.ndarray],
    ref_sets: List[np.ndarray],
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    codes=None,
    centers=None,
) -> np.ndarray:
    """Fully re-decide a batch of flagged (test, ref) searches: tier-2 f64
    device re-sweep in ONE dispatch, exact host f64 for the residual
    f64-band ties.  The batch may span several geometries — the
    orchestrators merge their flagged pairs so a multi-geometry pipeline
    pays one repair round-trip, not one per geometry.

    With ``codes``/``centers`` (stage attribution from the packed chain
    pull), code-1 pairs re-run ONLY the final ladder window around their
    centers — ~7x less emulated-f64 work than the full ladder."""
    out = np.zeros(len(test_sets), dtype=np.float64)
    if codes is not None and centers is not None:
        from .rotation_search import ladder_stages, plan_is_bruteforce

        brute_eff = bruteforce or plan_is_bruteforce(
            float(step_deg), float(range_deg)
        )
        final_idx = [] if brute_eff else [
            k for k in range(len(test_sets)) if codes[k] == 1
        ]
        full_idx = [k for k in range(len(test_sets)) if k not in final_idx]
        if final_idx:
            fs, fr, _ = ladder_stages(float(step_deg), float(range_deg))[-1]
            tier2 = _device_f64_final_stage(
                [test_sets[k] for k in final_idx],
                [ref_sets[k] for k in final_idx],
                np.asarray([centers[k] for k in final_idx], np.float64),
                fs, fr, float(range_deg),
            )
            if tier2 is None:
                full_idx = list(range(len(test_sets)))
            else:
                best64, tie64 = tier2
                for j, k in enumerate(final_idx):
                    out[k] = best64[j]
                    if tie64[j]:
                        full_idx.append(k)
        if full_idx:
            out2 = repair_pairs(
                [test_sets[k] for k in full_idx],
                [ref_sets[k] for k in full_idx],
                step_deg, range_deg, bruteforce,
            )
            for j, k in enumerate(full_idx):
                out[k] = out2[j]
            stats["flagged"] -= len(full_idx)  # recursion re-counts
            stats["repaired"] -= len(full_idx)
        stats["flagged"] += len(test_sets)
        stats["repaired"] += len(test_sets)
        return out
    tier2 = _device_f64_retier(
        test_sets, ref_sets, step_deg, range_deg, bruteforce
    )
    host_idx = range(len(test_sets))
    if tier2 is not None:
        best64, tie64 = tier2
        out[:] = best64
        host_idx = [k for k in range(len(test_sets)) if tie64[k]]
    for k in host_idx:
        out[k] = exact_ladder(
            test_sets[k], ref_sets[k], step_deg, range_deg, bruteforce
        )
        stats["host_exact"] = stats.get("host_exact", 0) + 1
    stats["flagged"] += len(test_sets)
    stats["repaired"] += len(test_sets)
    return out


def _device_f64_final_stage(
    test_sets, ref_sets, centers, final_step, final_range, limes_deg
):
    """Tier-2 final-window re-decision for a padded+masked pair batch."""
    from ..config import config

    if np.dtype(config.compute_dtype) == np.float64:
        return None
    try:
        from ..utils.device import to_device
        from .rotation_search import _final_stage_packed_impl

        T = len(test_sets)
        T_pad = max(8, 1 << (T - 1).bit_length())
        S = max(max(len(t) for t in test_sets), max(len(r) for r in ref_sets))
        test = np.zeros((T_pad, S, 2))
        ref = np.zeros((T_pad, S, 2))
        tmask = np.zeros((T_pad, S), dtype=bool)
        rmask = np.zeros((T_pad, S), dtype=bool)
        cen = np.zeros(T_pad, dtype=np.float64)
        cen[:T] = centers
        for k, (t, r) in enumerate(zip(test_sets, ref_sets)):
            test[k, : len(t)] = t
            ref[k, : len(r)] = r
            tmask[k, : len(t)] = True
            rmask[k, : len(r)] = True
        import jax.numpy as jnp

        flat = np.asarray(
            _final_stage_packed_impl(
                to_device(test, np.float64), to_device(ref, np.float64),
                to_device(tmask), to_device(rmask),
                to_device(cen, np.float64),
                float(final_step), float(final_range), float(limes_deg),
            ),
            dtype=np.float64,
        )
        return flat[:T_pad][:T], flat[T_pad:][:T] > 0.5
    except Exception:  # pragma: no cover
        return None


def repair_chain_sets64(
    delta: np.ndarray,
    codes: np.ndarray,
    centers: Optional[np.ndarray],
    sets64,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    host_sets,
) -> np.ndarray:
    """Tier-2 chain repair gathering from staged, already-composed f64
    sample sets (the sorted-prefetch path's staging — see
    io.build._prefetch_sweep_sorted); same tiering/attribution semantics
    as :func:`repair_chain_staged64`."""
    codes = np.asarray(codes)
    if codes.dtype == bool:
        codes = np.where(codes, 2, 0)
    flagged = np.nonzero(codes > 0)[0]
    if len(flagged) == 0:
        return delta
    stats["flagged"] += len(flagged)
    if not certify_enabled():
        return delta
    from .rotation_search import chain_pairs_sets64

    delta = np.array(delta, dtype=np.float64, copy=True)
    final_only = (
        [int(i) for i in flagged if codes[i] == 1]
        if centers is not None
        else []
    )
    full = [int(i) for i in flagged if centers is None or codes[i] >= 2]
    residual = []
    try:
        if final_only:
            best64, tie64 = chain_pairs_sets64(
                sets64, final_only, step_deg, range_deg, bruteforce,
                centers=centers[final_only], final_only=True,
            )
            for k, i in enumerate(final_only):
                if tie64[k]:
                    residual.append(i)
                else:
                    stats["repaired"] += 1
                    if best64[k] != delta[i]:
                        stats["changed"] += 1
                    delta[i] = best64[k]
        if full:
            best64, tie64 = chain_pairs_sets64(
                sets64, full, step_deg, range_deg, bruteforce
            )
            for k, i in enumerate(full):
                if tie64[k]:
                    residual.append(i)
                else:
                    stats["repaired"] += 1
                    if best64[k] != delta[i]:
                        stats["changed"] += 1
                    delta[i] = best64[k]
    except Exception:  # pragma: no cover - fall back to the h2d tier
        pts = host_sets()
        stats["flagged"] -= len(flagged)
        return repair_chain_deltas(
            delta, codes > 0, pts, None, step_deg, range_deg, bruteforce
        )
    if residual:
        pts = host_sets()
        for i in residual:
            exact = exact_ladder(
                np.asarray(pts[i + 1], np.float64),
                np.asarray(pts[i], np.float64),
                step_deg, range_deg, bruteforce,
            )
            stats["repaired"] += 1
            stats["host_exact"] = stats.get("host_exact", 0) + 1
            if exact != delta[i]:
                stats["changed"] += 1
            delta[i] = exact
    return delta


def repair_chain_staged64(
    delta: np.ndarray,
    codes: np.ndarray,
    centers: Optional[np.ndarray],
    staged64: dict,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    host_sets,
) -> np.ndarray:
    """Tier-2 chain repair from the staged f64 device twin: flagged pairs
    re-sweep in f64 by GATHERING from the input buffer uploaded at
    construction time — only int32 indices travel, so the repair adds one
    round-trip and a small f64 sweep, no transfers.

    ``codes`` attributes each flag to its ladder stage: code 1 (final
    stage only — by far the common plateau case) re-runs JUST the final
    window around the packed ``centers``, ~7x less emulated-f64 work than
    the full ladder; code >= 2 re-runs the full ladder.  Residual f64-band
    ties re-decide exactly on the host via ``host_sets()`` (a lazy builder
    of the [F, S, 2] sample sets)."""
    codes = np.asarray(codes)
    if codes.dtype == bool:
        codes = np.where(codes, 2, 0)
    flagged = np.nonzero(codes > 0)[0]
    if len(flagged) == 0:
        return delta
    stats["flagged"] += len(flagged)
    if not certify_enabled():
        return delta
    from .rotation_search import chain_pairs_staged64

    delta = np.array(delta, dtype=np.float64, copy=True)
    final_only = (
        [int(i) for i in flagged if codes[i] == 1]
        if centers is not None
        else []
    )
    full = [int(i) for i in flagged if centers is None or codes[i] >= 2]
    residual = []
    try:
        if final_only:
            best64, tie64 = chain_pairs_staged64(
                staged64, final_only, step_deg, range_deg, bruteforce,
                centers=centers[final_only], final_only=True,
            )
            for k, i in enumerate(final_only):
                if tie64[k]:
                    residual.append(i)
                else:
                    stats["repaired"] += 1
                    if best64[k] != delta[i]:
                        stats["changed"] += 1
                    delta[i] = best64[k]
        if full:
            best64, tie64 = chain_pairs_staged64(
                staged64, full, step_deg, range_deg, bruteforce
            )
            for k, i in enumerate(full):
                if tie64[k]:
                    residual.append(i)
                else:
                    stats["repaired"] += 1
                    if best64[k] != delta[i]:
                        stats["changed"] += 1
                    delta[i] = best64[k]
    except Exception:  # pragma: no cover - fall back to the h2d tier
        pts = host_sets()
        stats["flagged"] -= len(flagged)  # repair_chain_deltas re-counts
        return repair_chain_deltas(
            delta, codes > 0, pts, None, step_deg, range_deg, bruteforce
        )
    if residual:
        pts = host_sets()
        for i in residual:
            exact = exact_ladder(
                np.asarray(pts[i + 1], np.float64),
                np.asarray(pts[i], np.float64),
                step_deg, range_deg, bruteforce,
            )
            stats["repaired"] += 1
            stats["host_exact"] = stats.get("host_exact", 0) + 1
            if exact != delta[i]:
                stats["changed"] += 1
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
    cent = []
    for k in flagged:
        reference_xy, target_xy = clouds[k]
        pivot = reference_xy.mean(axis=0)
        cent.append(
            (
                np.asarray(target_xy - pivot, np.float64),
                np.asarray(reference_xy - pivot, np.float64),
            )
        )
    tier2 = _device_f64_retier(
        [t for t, _ in cent], [r for _, r in cent],
        step_deg, range_deg, bruteforce,
    )
    host_idx = range(len(flagged))
    if tier2 is not None:
        best64, tie64 = tier2
        for j, k in enumerate(flagged):
            if not tie64[j]:
                stats["repaired"] += 1
                if best64[j] != rotations[k]:
                    stats["changed"] += 1
                rotations[k] = best64[j]
        host_idx = [j for j in range(len(flagged)) if tie64[j]]
    for j in host_idx:
        k = flagged[j]
        t, r = cent[j]
        exact = exact_ladder(t, r, step_deg, range_deg, bruteforce)
        stats["repaired"] += 1
        stats["host_exact"] = stats.get("host_exact", 0) + 1
        if exact != rotations[k]:
            stats["changed"] += 1
            _note(
                f"between slot {k}: {math.degrees(rotations[k]):+.4f} deg "
                f"-> {math.degrees(exact):+.4f} deg (exact f64)"
            )
        rotations[k] = exact
    return rotations
