"""Entry orchestrators for the four processing modes.

Parity: ``src/intravascular/binding/entry.rs`` and
``src/intravascular/processing/preprocessing.rs`` of the reference.

The reference's crossbeam scoped threads (4-way align-within, 2-way
align-between) become batched device sweeps: all geometries' frame pairs run
through one fused rotation search (see align_within.align_frames_in_geometries).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.build import build_any_from_inputdata, build_geometry_from_inputdata
from ..io.csv_io import InputData
from ..models.geometry import PyGeometry, PyGeometryPair
from ..utils.logs import AlignLog
from ..utils.trace import trace
from . import to_object
from .align_between import align_between_geometries, align_between_geometries_batch
from .align_within import align_frames_in_geometries, align_frames_in_geometry
from .postprocess import postprocess_geom_pair

# tolerance of distance between frames [mm] that counts as 0 (entry.rs:21)
TOLERANCE = 0.03

_CHAIN_WARNED = False


def _path_basename(path) -> str:
    name = Path(path).name
    return name if name else "unknown"


def _prefetch_dir_reads(paths_phases) -> None:
    """Queue background CSV parses for every (directory, phase) about to be
    built — the native parser releases the GIL, so later directories parse
    while the funnel builds the first (io.csv_io read-ahead)."""
    from ..io.csv_io import prefetch_contour_files

    cands = []
    for path, dia in paths_phases:
        phase = "diastolic" if dia else "systolic"
        d = Path(path)
        cands.append(d / f"{phase}_contours.csv")
        for prefix in ("eem", "calcium", "branch"):
            cands.append(d / f"{prefix}_{phase}_contours.csv")
    prefetch_contour_files(cands)


@trace("entry.prepare_n_geometries")
def prepare_n_geometries(
    labels: Sequence[str],
    image_center,
    radius: float,
    n_points: int,
    input_data: Optional[List[InputData]],
    diastole: bool,
    path_a,
    path_b,
    mode: str,
    verbose: bool = True,
    prefetch=None,
) -> List[PyGeometry]:
    """Prepare 1/2/4 geometries for Single/Pair/Full processing.
    Parity: preprocessing.rs:27-203."""
    if mode == "single":
        if input_data:
            inp = input_data[0]
            return [
                build_any_from_inputdata(
                    inp, None, inp.label, inp.diastole, image_center, radius, n_points,
                    verbose=verbose, prefetch=prefetch,
                )
            ]
        path = path_a or path_b
        if path is None:
            raise ValueError(
                "Single processing requires at least one InputData or one path"
            )
        label = labels[0] if len(labels) == 1 else _path_basename(path)
        return [
            build_any_from_inputdata(
                None, path, label, diastole, image_center, radius, n_points,
                verbose=verbose, prefetch=prefetch,
            )
        ]

    if mode == "pair":
        if input_data and len(input_data) >= 2:
            return [
                build_any_from_inputdata(
                    inp, None, inp.label, inp.diastole, image_center, radius, n_points,
                    verbose=verbose, prefetch=prefetch,
                )
                for inp in input_data[:2]
            ]
        path = path_a or path_b
        if path is None:
            raise ValueError(
                "Pair processing requires at least two InputData or one path"
            )
        use_labels = len(labels) == 2
        basename = _path_basename(path)
        _prefetch_dir_reads([(path, True), (path, False)])
        return [
            build_any_from_inputdata(
                None,
                path,
                labels[idx] if use_labels else basename,
                dia,
                image_center,
                radius,
                n_points,
                verbose=verbose,
                prefetch=prefetch,
            )
            for idx, dia in enumerate((True, False))
        ]

    if mode == "full":
        if input_data and len(input_data) >= 4:
            return [
                build_any_from_inputdata(
                    inp, None, inp.label, inp.diastole, image_center, radius, n_points,
                    verbose=verbose, prefetch=prefetch,
                )
                for inp in input_data[:4]
            ]
        if path_a is None or path_b is None:
            raise ValueError(
                "Full processing requires either at least 4 InputData or both paths"
            )
        use_labels = len(labels) == 4
        _prefetch_dir_reads(
            [(p, dia) for p in (path_a, path_b) for dia in (True, False)]
        )
        out = []
        idx = 0
        for path in (path_a, path_b):
            basename = _path_basename(path)
            for dia in (True, False):
                out.append(
                    build_any_from_inputdata(
                        None,
                        path,
                        labels[idx] if use_labels else basename,
                        dia,
                        image_center,
                        radius,
                        n_points,
                        verbose=verbose,
                        prefetch=prefetch,
                    )
                )
                idx += 1
        return out

    raise ValueError(f"unknown processing mode: {mode}")


def _between_stage_deferred(
    pairs_defs, step_deg: float, range_deg: float, sample_size: int,
    verbose: bool, build_pairs: bool = True,
):
    """One batched between-geometry stage over deferred within-align
    results: dispatch the search from the post-finish tensors (initial
    translation applied to the search cloud only), materialise the
    geometries inside the round-trip, then run the mutating epilogue and
    build the pairs.  Bit-identical to the eager
    align_between_geometries_batch sequence — only independent work moves
    into the tunnel latency."""
    from .align_between import (
        apply_between_epilogue,
        build_pair,
        dispatch_between_search,
        extract_geometry_points,
        extract_stack_points,
    )

    between_sample = max(sample_size, 500)

    def _cloud(d):
        lum = d.lumen_coords()
        if lum is not None:
            return extract_stack_points(lum, between_sample)
        return extract_geometry_points(d.materialize(), between_sample)

    preps, clouds = [], []
    for A, B in pairs_defs:
        ca = A.ref_centroid()
        cb = B.ref_centroid()
        t0 = tuple(ca[k] - cb[k] for k in range(3))
        cloud_ref = _cloud(A)
        cloud_tgt = _cloud(B) + np.array([t0[0], t0[1]])
        preps.append((ca, t0, cloud_ref))
        clouds.append((cloud_ref, cloud_tgt))
    handle = dispatch_between_search(clouds, step_deg, range_deg)

    geoms = [(A.materialize(), B.materialize()) for A, B in pairs_defs]
    from ..ops.argmin_repair import repair_between, split_packed

    rot, ties = split_packed(np.asarray(handle, dtype=np.float64))
    rot = repair_between(rot, ties, clouds, float(step_deg), float(range_deg), False)
    out = []
    for (A_g, B_g), (ca, t0, _), r in zip(geoms, preps, rot):
        apply_between_epilogue(
            A_g, B_g, float(r), ca, t0, range_deg, step_deg, verbose,
            pre_translated=False,
        )
        if build_pairs:
            out.append(build_pair(A_g, B_g))
    return out, geoms, preps


def _try_fused_chain(
    geometries, pair_idx, full_stage2: bool, step_deg: float, range_deg: float,
    bruteforce: bool, sample_size: int, smooth: bool,
):
    """Attempt the one-round-trip orchestration (pipelines.fused_chain):
    chain the in-flight within sweeps straight into the between search on
    device.  Returns ``(taken, handle, delta_sizes)`` or ``None`` when any
    geometry can't ride the chain (no prefetch, holes, object path) — the
    regular two-round-trip orchestration then runs unchanged."""
    if os.environ.get("MMTPU_NO_FUSED_CHAIN", "0") == "1":
        return None
    from .fused_chain import dispatch_fused_chain, take_device_sweeps

    taken = take_device_sweeps(
        geometries, step_deg, range_deg, bruteforce, sample_size
    )
    if taken is None:
        return None
    try:
        handle, sizes = dispatch_fused_chain(
            taken, pair_idx, full_stage2, smooth, sample_size, step_deg,
            range_deg,
        )
    except Exception as e:
        # pendings are consumed, but the claimed tensors are untouched —
        # the fallback align simply re-dispatches the within sweep.  Warn
        # (once per process) because a persistent failure here silently
        # costs an extra tunnel round-trip + re-sweep on every call.
        global _CHAIN_WARNED
        if not _CHAIN_WARNED:
            _CHAIN_WARNED = True
            import sys

            print(
                f"fused-chain dispatch failed ({type(e).__name__}: {e}); "
                "falling back to the two-round-trip orchestration",
                file=sys.stderr,
            )
        return None
    return taken, handle, sizes


def _finish_chain(
    taken, flat: np.ndarray, sizes, smooth: bool, verbose: bool,
    step_deg: float, range_deg: float, bruteforce: bool, sample_size: int,
):
    """Host finish for the fused chain's single pull: per-geometry within
    finishes (identical to the deferred path) + the between winners.

    Pull layout (fused_chain._fused_chain_impl):
    ``[deltas… | winners | delta_codes… | delta_centers… | winner_ties]``.
    Flagged within deltas are re-decided here BEFORE the finish (tiered —
    ops.argmin_repair); when any within delta changes, the device-composed
    between winners are invalid and the caller must recompute the between
    stages host-exactly (returned flag).
    """
    from .align_within import (
        DeferredAligned,
        _finish_alignment_tensor_coords,
        _repair_pending_delta,
    )

    S = sum(sizes)
    W = (flat.shape[0] - 3 * S) // 2
    deltas_flat = flat[:S]
    winners = flat[S : S + W]
    codes_flat = np.rint(flat[S + W : 2 * S + W]).astype(np.int64)
    centers_flat = flat[2 * S + W : 3 * S + W]
    wties = flat[3 * S + W :] > 0.5

    ds = []
    off = 0
    within_changed = False
    # a repair that lands on the SAME grid index merely refines the angle
    # value from the f32 grid to the f64 grid (~2e-7 rad, ~1e-6 mm on the
    # clouds) — that does NOT invalidate the device-composed between
    # winners.  Only an index-level change (>= a grid step) does; the
    # finest plan step over 4 is a safe discriminator (value drift is
    # ~1000x smaller than any step).
    from ..ops.rotation_search import ladder_stages, plan_is_bruteforce

    fine_step = (
        float(step_deg)
        if (bruteforce or plan_is_bruteforce(float(step_deg), float(range_deg)))
        else ladder_stages(float(step_deg), float(range_deg))[-1][0]
    )
    index_tol = np.radians(fine_step) / 4.0

    # pass 1: split per geometry; geometries WITHOUT the staged f64 twin
    # merge their flagged pairs into ONE cross-geometry repair batch (one
    # tier-2 dispatch + pull instead of one per geometry)
    from ..ops.argmin_repair import certify_enabled, repair_pairs

    per_geom = []
    batch_sets = []
    batch_slots = []  # (geom_idx, pair_idx)
    for gi, ((tg, _pending, pre), s) in enumerate(zip(taken, sizes)):
        delta = np.array(deltas_flat[off : off + s], dtype=np.float64)
        codes = codes_flat[off : off + s]
        centers = centers_flat[off : off + s]
        off += s
        per_geom.append([tg, pre, delta, codes, centers])
        if not (codes > 0).any() or not certify_enabled():
            continue
        if (
            getattr(tg, "_staged64", None) is not None
            or getattr(tg, "_staged64_sets", None) is not None
        ):
            continue  # index-gather tier handles it per geometry (cheap)
        from .align_within import _host_chain_sets

        pts = _host_chain_sets(tg, sample_size)
        if pts is None:
            continue
        for i in np.nonzero(codes > 0)[0]:
            batch_sets.append(
                (np.asarray(pts[i + 1], np.float64), np.asarray(pts[i], np.float64))
            )
            batch_slots.append((gi, int(i)))
    if batch_sets:
        repaired = repair_pairs(
            [t for t, _ in batch_sets], [r for _, r in batch_sets],
            float(step_deg), float(range_deg), bool(bruteforce),
        )
        for (gi, i), val in zip(batch_slots, repaired):
            if abs(val - per_geom[gi][2][i]) > index_tol:
                within_changed = True
            per_geom[gi][2][i] = val
            per_geom[gi][3] = np.array(per_geom[gi][3], copy=True)
            per_geom[gi][3][i] = 0  # handled

    for tg, pre, delta, codes, centers in per_geom:
        if (np.asarray(codes) > 0).any():
            repaired = _repair_pending_delta(
                tg, delta, codes, centers, step_deg, range_deg, bruteforce,
                sample_size,
            )
            if np.abs(repaired - delta).max() > index_tol:
                within_changed = True
            delta = repaired
        t, logs, anom = _finish_alignment_tensor_coords(tg, delta, smooth, pre=pre)
        ds.append(DeferredAligned(t, None, logs, anom, verbose))
    return ds, winners, wties, within_changed


def _exact_between_rotations(
    pairs_defs, step_deg: float, range_deg: float, bruteforce: bool,
    sample_size: int,
):
    """Host-exact between winners for independent (A, B) slots — the repair
    path when the device search flagged a near-tie (ops.argmin_repair)."""
    from ..ops.argmin_repair import exact_ladder
    from .align_between import extract_geometry_points, extract_stack_points

    between_sample = max(sample_size, 500)

    def _cloud(d):
        lum = d.lumen_coords()
        if lum is not None:
            return extract_stack_points(lum, between_sample)
        return extract_geometry_points(d.materialize(), between_sample)

    out = []
    for A, B in pairs_defs:
        ca = A.ref_centroid()
        cb = B.ref_centroid()
        cloud_ref = _cloud(A)
        cloud_tgt = _cloud(B) + np.array([ca[0] - cb[0], ca[1] - cb[1]])
        pv = cloud_ref.mean(axis=0)
        out.append(
            exact_ladder(
                cloud_tgt - pv, cloud_ref - pv, float(step_deg),
                float(range_deg), bool(bruteforce),
            )
        )
    return np.asarray(out, dtype=np.float64)


def _between_finish(
    pairs_defs, rot, step_deg: float, range_deg: float, verbose: bool,
    build_pairs: bool = True,
):
    """Materialise + mutating epilogue + pair construction for precomputed
    between winners (the fused chain's tail — same semantics as
    :func:`_between_stage_deferred` after its pull)."""
    from .align_between import apply_between_epilogue, build_pair

    preps = []
    for A, B in pairs_defs:
        ca = A.ref_centroid()
        cb = B.ref_centroid()
        t0 = tuple(ca[k] - cb[k] for k in range(3))
        preps.append((ca, t0, None))
    geoms = [(A.materialize(), B.materialize()) for A, B in pairs_defs]
    out = []
    for (A_g, B_g), (ca, t0, _), r in zip(geoms, preps, rot):
        apply_between_epilogue(
            A_g, B_g, float(r), ca, t0, range_deg, step_deg, verbose,
            pre_translated=False,
        )
        if build_pairs:
            out.append(build_pair(A_g, B_g))
    return out, geoms, preps


def _maybe_postprocess(
    pair: PyGeometryPair, anomalous: bool, postprocessing: bool
) -> PyGeometryPair:
    if postprocessing:
        return postprocess_geom_pair(pair, TOLERANCE, anomalous)
    # every caller passes a pair freshly constructed by _finish_between,
    # which already holds exclusive copies — a second deep copy here would
    # be unobservable (the reference returns the pair as-is too,
    # entry.rs:206-361)
    return pair


@trace("entry.full_processing")
def full_processing(
    labels: Sequence[str],
    image_center,
    radius: float,
    n_points: int,
    input_path_a=None,
    input_path_b=None,
    input_data: Optional[List[InputData]] = None,
    write_obj: bool = True,
    interpolation_steps: int = 0,
    contour_types: Sequence[str] = ("Lumen", "Catheter", "Wall"),
    watertight: bool = True,
    output_path_a: str = "output/rest",
    output_path_b: str = "output/stress",
    output_path_c: str = "output/diastole",
    output_path_d: str = "output/systole",
    step_deg: float = 0.5,
    range_deg: float = 90.0,
    smooth: bool = True,
    bruteforce: bool = False,
    sample_size: int = 500,
    postprocessing: bool = True,
    verbose: bool = True,
):
    """4-phase pipeline: align within x4 (one device sweep) -> align between
    AB/CD then AC/BD -> optional postprocess -> optional OBJ export.
    Parity: full_processing_rs (entry.rs:71-361)."""
    geometries = prepare_n_geometries(
        labels, image_center, radius, n_points, input_data, True,
        input_path_a, input_path_b, "full", verbose=verbose,
        prefetch=dict(
            step_deg=step_deg, range_deg=range_deg, bruteforce=bruteforce,
            sample_size=sample_size,
        ),
    )
    if len(geometries) != 4:
        raise ValueError(f"Full processing requires exactly 4 geometries, got {len(geometries)}")

    # AB ‖ CD then AC ‖ BD: the reference's two concurrent scoped-thread
    # stages (entry.rs:206-277) become ONE fused device program — stage 2's
    # clouds are rigid transforms of stage 1's (b/d rotated by the stage-1
    # winners about a's/c's reference centroids), so the chain composes on
    # device and the whole between phase costs a single tunnel round-trip.
    # The object materialisation / geometry mutation / pair copies run
    # inside that round-trip.  Results match the sequential orchestration
    # except when two grid angles' costs tie within the composition's
    # sub-ulp (f32-cast-level) noise — see _fused_full_between_impl.
    from .align_between import (
        apply_between_epilogue,
        build_pair,
        dispatch_fused_between,
        extract_geometry_points,
        extract_stack_points,
    )

    from ..ops.argmin_repair import certify_enabled, split_packed

    need_exact_between = False
    chain = _try_fused_chain(
        geometries, ((0, 1), (2, 3)), True, step_deg, range_deg, bruteforce,
        sample_size, smooth,
    )
    if chain is not None:
        # one-round-trip path: the within deltas and the between winners
        # arrive in a single pull (pipelines.fused_chain)
        taken, handle, sizes = chain
        flat = np.asarray(handle, dtype=np.float64)
        (d_a, d_b, d_c, d_d), winners, wties, within_changed = _finish_chain(
            taken, flat, sizes, smooth, verbose, step_deg, range_deg,
            bruteforce, sample_size,
        )
        r_ab, r_cd, r_ac, r_bd = winners
        need_exact_between = certify_enabled() and (
            within_changed or bool(wties.any())
        )
    else:
        d_a, d_b, d_c, d_d = align_frames_in_geometries(
            geometries, step_deg, range_deg, smooth, bruteforce, sample_size,
            verbose=verbose, deferred=True,
        )

    between_sample = max(sample_size, 500)

    logs_a, logs_b, logs_c, logs_d = d_a.logs, d_b.logs, d_c.logs, d_d.logs
    bool_a, bool_b, bool_c, bool_d = (
        d_a.anomalous, d_b.anomalous, d_c.anomalous, d_d.anomalous,
    )

    def _cloud(d):
        lum = d.lumen_coords()
        if lum is not None:
            return extract_stack_points(lum, between_sample)
        return extract_geometry_points(d.materialize(), between_sample)

    ca = d_a.ref_centroid()
    cb = d_b.ref_centroid()
    cc = d_c.ref_centroid()
    cd = d_d.ref_centroid()
    t0_ab = tuple(ca[k] - cb[k] for k in range(3))
    t0_cd = tuple(cc[k] - cd[k] for k in range(3))
    if chain is None:
        cloud_a = _cloud(d_a)
        cloud_b = _cloud(d_b) + np.array([t0_ab[0], t0_ab[1]])
        cloud_c = _cloud(d_c)
        cloud_d = _cloud(d_d) + np.array([t0_cd[0], t0_cd[1]])
        handle = dispatch_fused_between(
            [(cloud_a, cloud_b), (cloud_c, cloud_d)], ca, cc, step_deg,
            range_deg,
        )

    # materialise the geometry objects while the fused search flies
    geom_a = d_a.materialize()
    geom_b = d_b.materialize()
    geom_c = d_c.materialize()
    geom_d = d_d.materialize()

    if chain is None:
        flat8 = np.asarray(handle, dtype=np.float64)
        (r_ab, r_cd, r_ac, r_bd), wties = split_packed(flat8)
        need_exact_between = certify_enabled() and bool(wties.any())

    if need_exact_between:
        # Certification-flagged between search (or a repaired within delta
        # invalidated the device-composed clouds): recompute the whole
        # between phase sequentially in exact host f64 — the
        # backend-independent spec (entry.rs:206-277 order).  Stage-1
        # winners come from the pre-epilogue clouds; stage 2 recomputes
        # below, after the stage-1 epilogues mutate b and d.
        from ..ops.argmin_repair import exact_ladder

        cl_a = _cloud(d_a)
        cl_b = _cloud(d_b) + np.array([t0_ab[0], t0_ab[1]])
        cl_c = _cloud(d_c)
        cl_d = _cloud(d_d) + np.array([t0_cd[0], t0_cd[1]])
        pv_a = cl_a.mean(axis=0)
        pv_c = cl_c.mean(axis=0)
        r_ab = exact_ladder(
            cl_b - pv_a, cl_a - pv_a, step_deg, range_deg, bruteforce
        )
        r_cd = exact_ladder(
            cl_d - pv_c, cl_c - pv_c, step_deg, range_deg, bruteforce
        )

    # stage-1 epilogues (b onto a, d onto c), then the stage-1 pairs
    apply_between_epilogue(
        geom_a, geom_b, float(r_ab), ca, t0_ab, range_deg, step_deg, verbose,
        pre_translated=False,
    )
    apply_between_epilogue(
        geom_c, geom_d, float(r_cd), cc, t0_cd, range_deg, step_deg, verbose,
        pre_translated=False,
    )
    pair_ab = build_pair(geom_a, geom_b)
    pair_cd = build_pair(geom_c, geom_d)

    if need_exact_between:
        # stage-2 winners from the mutated geometries, sequentially exact
        from ..ops.argmin_repair import exact_ladder

        stage2 = []
        for A_g, B_g in ((geom_a, geom_c), (geom_b, geom_d)):
            cl_ref = extract_geometry_points(A_g, between_sample)
            cl_tgt = extract_geometry_points(B_g, between_sample)
            ca2 = A_g.frames[A_g.ref_or_proximal_idx()].centroid
            cb2 = B_g.frames[B_g.ref_or_proximal_idx()].centroid
            cl_tgt = cl_tgt + np.array([ca2[0] - cb2[0], ca2[1] - cb2[1]])
            pv = cl_ref.mean(axis=0)
            stage2.append(
                exact_ladder(
                    cl_tgt - pv, cl_ref - pv, step_deg, range_deg, bruteforce
                )
            )
        r_ac, r_bd = stage2

    # stage-2 epilogues (c onto a, d onto b) with host-exact translations
    for A_g, B_g, r in ((geom_a, geom_c, r_ac), (geom_b, geom_d, r_bd)):
        ca2 = A_g.frames[A_g.ref_or_proximal_idx()].centroid
        cb2 = B_g.frames[B_g.ref_or_proximal_idx()].centroid
        t0 = tuple(ca2[k] - cb2[k] for k in range(3))
        apply_between_epilogue(
            A_g, B_g, float(r), ca2, t0, range_deg, step_deg, verbose,
            pre_translated=False,
        )
    pair_ac = build_pair(geom_a, geom_c)
    pair_bd = build_pair(geom_b, geom_d)

    anomalous = bool_a or bool_b or bool_c or bool_d
    pair_ab = _maybe_postprocess(pair_ab, anomalous, postprocessing)
    pair_cd = _maybe_postprocess(pair_cd, anomalous, postprocessing)
    pair_ac = _maybe_postprocess(pair_ac, anomalous, postprocessing)
    pair_bd = _maybe_postprocess(pair_bd, anomalous, postprocessing)

    if write_obj:
        pair_ab = to_object.process_case(
            pair_ab.label, pair_ab, output_path_a, interpolation_steps, watertight, contour_types
        )
        pair_cd = to_object.process_case(
            pair_cd.label, pair_cd, output_path_b, interpolation_steps, watertight, contour_types
        )
        pair_ac = to_object.process_case(
            pair_ac.label, pair_ac, output_path_c, interpolation_steps, watertight, contour_types
        )
        pair_bd = to_object.process_case(
            pair_bd.label, pair_bd, output_path_d, interpolation_steps, watertight, contour_types
        )

    return pair_ab, pair_cd, pair_ac, pair_bd, logs_a, logs_b, logs_c, logs_d


@trace("entry.double_pair_processing")
def double_pair_processing(
    labels: Sequence[str],
    image_center,
    radius: float,
    n_points: int,
    input_path_a=None,
    input_path_b=None,
    input_data: Optional[List[InputData]] = None,
    write_obj: bool = True,
    interpolation_steps: int = 0,
    contour_types: Sequence[str] = ("Lumen", "Catheter", "Wall"),
    watertight: bool = True,
    output_path_a: str = "output/rest",
    output_path_b: str = "output/stress",
    step_deg: float = 0.5,
    range_deg: float = 90.0,
    smooth: bool = True,
    bruteforce: bool = False,
    sample_size: int = 500,
    postprocessing: bool = True,
    verbose: bool = True,
):
    """Two independent pairs (AB and CD).  Parity: double_pair_processing_rs
    (entry.rs:363-570)."""
    geometries = prepare_n_geometries(
        labels, image_center, radius, n_points, input_data, True,
        input_path_a, input_path_b, "full", verbose=verbose,
        prefetch=dict(
            step_deg=step_deg, range_deg=range_deg, bruteforce=bruteforce,
            sample_size=sample_size,
        ),
    )
    if len(geometries) != 4:
        raise ValueError(
            f"Double Pair processing requires exactly 4 geometries, got {len(geometries)}"
        )
    chain = _try_fused_chain(
        geometries, ((0, 1), (2, 3)), False, step_deg, range_deg, bruteforce,
        sample_size, smooth,
    )
    from ..ops.argmin_repair import certify_enabled

    need_exact_between = False
    if chain is not None:
        taken, handle, sizes = chain
        flat = np.asarray(handle, dtype=np.float64)
        (d_a, d_b, d_c, d_d), winners, wties, within_changed = _finish_chain(
            taken, flat, sizes, smooth, verbose, step_deg, range_deg,
            bruteforce, sample_size,
        )
        need_exact_between = certify_enabled() and (
            within_changed or bool(wties.any())
        )
    else:
        d_a, d_b, d_c, d_d = align_frames_in_geometries(
            geometries, step_deg, range_deg, smooth, bruteforce, sample_size,
            verbose=verbose, deferred=True,
        )
    logs_a, logs_b, logs_c, logs_d = d_a.logs, d_b.logs, d_c.logs, d_d.logs
    bool_a, bool_b, bool_c, bool_d = (
        d_a.anomalous, d_b.anomalous, d_c.anomalous, d_d.anomalous,
    )

    if chain is not None:
        if need_exact_between:
            # flagged winners (or repaired within deltas): re-decide both
            # independent slots exactly on the host clouds
            winners = _exact_between_rotations(
                [(d_a, d_b), (d_c, d_d)], step_deg, range_deg, bruteforce,
                sample_size,
            )
        (pair_ab, pair_cd), _, _ = _between_finish(
            [(d_a, d_b), (d_c, d_d)], winners, step_deg, range_deg, verbose
        )
    else:
        (pair_ab, pair_cd), _, _ = _between_stage_deferred(
            [(d_a, d_b), (d_c, d_d)], step_deg, range_deg, sample_size, verbose
        )

    anomalous = bool_a or bool_b or bool_c or bool_d
    pair_ab = _maybe_postprocess(pair_ab, anomalous, postprocessing)
    pair_cd = _maybe_postprocess(pair_cd, anomalous, postprocessing)

    if write_obj:
        pair_ab = to_object.process_case(
            pair_ab.label, pair_ab, output_path_a, interpolation_steps, watertight, contour_types
        )
        pair_cd = to_object.process_case(
            pair_cd.label, pair_cd, output_path_b, interpolation_steps, watertight, contour_types
        )
    return pair_ab, pair_cd, logs_a, logs_b, logs_c, logs_d


@trace("entry.pair_processing")
def pair_processing(
    labels: Sequence[str],
    image_center,
    radius: float,
    n_points: int,
    input_path=None,
    input_data: Optional[List[InputData]] = None,
    write_obj: bool = True,
    interpolation_steps: int = 0,
    contour_types: Sequence[str] = ("Lumen", "Catheter", "Wall"),
    watertight: bool = True,
    output_path: str = "output/singlepair",
    step_deg: float = 0.5,
    range_deg: float = 90.0,
    smooth: bool = True,
    bruteforce: bool = False,
    sample_size: int = 500,
    postprocessing: bool = True,
    verbose: bool = True,
):
    """One diastole/systole pair.  Parity: pair_processing_rs
    (entry.rs:572-689)."""
    geometries = prepare_n_geometries(
        labels, image_center, radius, n_points, input_data, True,
        input_path, None, "pair", verbose=verbose,
        prefetch=dict(
            step_deg=step_deg, range_deg=range_deg, bruteforce=bruteforce,
            sample_size=sample_size,
        ),
    )
    if len(geometries) != 2:
        raise ValueError(
            f"Single Pair processing requires exactly 2 geometries, got {len(geometries)}"
        )
    chain = _try_fused_chain(
        geometries, ((0, 1),), False, step_deg, range_deg, bruteforce,
        sample_size, smooth,
    )
    from ..ops.argmin_repair import certify_enabled

    need_exact_between = False
    if chain is not None:
        taken, handle, sizes = chain
        flat = np.asarray(handle, dtype=np.float64)
        (d_a, d_b), winners, wties, within_changed = _finish_chain(
            taken, flat, sizes, smooth, verbose, step_deg, range_deg,
            bruteforce, sample_size,
        )
        need_exact_between = certify_enabled() and (
            within_changed or bool(wties.any())
        )
    else:
        d_a, d_b = align_frames_in_geometries(
            geometries, step_deg, range_deg, smooth, bruteforce, sample_size,
            verbose=verbose, deferred=True,
        )
    logs_a, logs_b = d_a.logs, d_b.logs
    bool_a, bool_b = d_a.anomalous, d_b.anomalous

    if chain is not None:
        if need_exact_between:
            winners = _exact_between_rotations(
                [(d_a, d_b)], step_deg, range_deg, bruteforce, sample_size
            )
        (pair,), _, _ = _between_finish(
            [(d_a, d_b)], winners, step_deg, range_deg, verbose
        )
    else:
        (pair,), _, _ = _between_stage_deferred(
            [(d_a, d_b)], step_deg, range_deg, sample_size, verbose
        )
    pair = _maybe_postprocess(pair, bool_a or bool_b, postprocessing)
    if write_obj:
        pair = to_object.process_case(
            pair.label, pair, output_path, interpolation_steps, watertight, contour_types
        )
    return pair, logs_a, logs_b


@trace("entry.single_processing")
def single_processing(
    labels: Sequence[str],
    image_center,
    radius: float,
    n_points: int,
    input_path=None,
    input_data: Optional[List[InputData]] = None,
    diastole: bool = True,
    write_obj: bool = True,
    watertight: bool = True,
    contour_types: Sequence[str] = ("Lumen", "Catheter", "Wall"),
    output_path: str = "output/single",
    step_deg: float = 0.5,
    range_deg: float = 90.0,
    smooth: bool = True,
    bruteforce: bool = False,
    sample_size: int = 500,
    verbose: bool = True,
):
    """Single-geometry alignment + per-type OBJ export.
    Parity: single_processing_rs (entry.rs:691-785)."""
    from ..io.obj_io import (
        create_mtl_for_contour_type,
        extract_contours_by_type,
        get_contour_type_name,
        write_obj_mesh_without_uv,
    )

    geoms = prepare_n_geometries(
        labels, image_center, radius, n_points, input_data, diastole,
        input_path, None, "single", verbose=verbose,
        prefetch=dict(
            step_deg=step_deg, range_deg=range_deg, bruteforce=bruteforce,
            sample_size=sample_size,
        ),
    )
    if len(geoms) != 1:
        raise ValueError(f"Single processing requires exactly 1 geometry, got {len(geoms)}")

    geom, logs, _ = align_frames_in_geometry(
        geoms[0], step_deg, range_deg, smooth, bruteforce, sample_size, verbose=verbose
    )

    if write_obj:
        os.makedirs(output_path, exist_ok=True)
        for contour_type in contour_types:
            contours = extract_contours_by_type(geom, contour_type)
            if not contours:
                print(f"Warning: No contours found for type {contour_type}, skipping")
                continue
            type_name = get_contour_type_name(contour_type)
            obj_path = Path(output_path) / f"{type_name}_{geom.label}.obj"
            mtl_path = Path(output_path) / f"{type_name}_{geom.label}.mtl"
            create_mtl_for_contour_type(contour_type, mtl_path, obj_path.name)
            write_obj_mesh_without_uv(contours, str(obj_path), str(mtl_path), watertight)
        if verbose:
            print(f"Successfully wrote OBJ files for geometry {geom.label} to {output_path}")

    return geom, logs


@trace("entry.cohort_processing")
def cohort_processing(
    input_data: List[InputData],
    labels: Optional[Sequence[str]] = None,
    image_center=(4.5, 4.5),
    radius: float = 0.5,
    n_points: int = 20,
    step_deg: float = 0.5,
    range_deg: float = 90.0,
    smooth: bool = True,
    bruteforce: bool = False,
    sample_size: int = 500,
    verbose: bool = False,
    devices=None,
):
    """TPU-native extension (no reference counterpart): register a whole
    cohort of independent pullbacks in one batched device search.

    Every pullback's frame pairs concatenate along the batch axis of the
    rotation-search kernel (align_within.align_frames_in_geometries), so
    one launch serves N patients — the production-serving analog of the
    reference's one-process-per-case CLI flow.  Returns a list of
    (geometry, logs, anomalous) triples in input order.
    """
    if not input_data:
        return []
    geometries = []
    for k, inp in enumerate(input_data):
        label = labels[k] if labels is not None else (inp.label or f"case_{k}")
        geometries.append(
            build_any_from_inputdata(
                inp, None, label, inp.diastole, image_center, radius, n_points,
                verbose=verbose,
            )
        )
    return align_frames_in_geometries(
        geometries, step_deg, range_deg, smooth, bruteforce, sample_size,
        verbose=verbose, devices=devices,
    )
