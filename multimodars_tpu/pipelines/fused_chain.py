"""One-round-trip orchestration: the within-pullback sweep chains straight
into the between-geometry rotation search on device.

The reference runs align-within (crossbeam ×4, entry.rs:140-203) to
completion, then align-between (entry.rs:206-277) on the *aligned*
geometries.  On the tunneled TPU backend each device→host synchronisation
costs a full round-trip (~26 ms), so the repo's round-3/4 orchestration —
one concatenated pull for the within deltas, one fused program for both
between stages — still paid two round-trips per `full_processing` call.

This module removes the remaining one.  Every quantity the between search
needs is an analytic function of the within deltas and of pre-sweep state:

- the within epilogue's per-frame transform is ``rotate(cumsum(delta) +
  additional)`` about the original centroid plus a known translation
  (align_within.rs:70-123 reformulated; see
  ``align_within._finish_alignment_tensor_coords``),
- the axis rotation ``additional`` depends only on ``cum[ref_idx]`` and
  rigid-invariant pre-classification (anomalous flag, farthest-pair
  indices — ``align_within.rs:256-317``),
- the CCW re-sort is a pure start-roll whose index is the last-max-Y
  argmax of the transformed contour (contour.rs:368-405),
- the optional 3-frame smoothing is a fixed-stencil average
  (geometry.rs:165-239), and
- the between cloud is a static-index downsample of the result
  (align_between.rs:11-92).

So the whole chain — deltas → finished lumen coordinates → between clouds
→ between search — composes into ONE device program whose inputs are the
in-flight sweep handles (never pulled) plus small pre-sweep uploads, and
whose single output concatenates the deltas, the between winners, and the
argmin/composition certification flags.  All host-side mutation (the real
finish, walls, logs, epilogues) then runs from the pulled deltas exactly
as before, so the final geometries match the two-round-trip orchestration
to the last ulp of the winner angle (different XLA programs may
fma-contract the candidate grid differently); anything beyond ulp noise is
certified — near-tied argmins, roll-argmax ties and the axis-rotation
skip boundary all raise flags, and flagged results are re-decided in
exact host f64 from host-built spec clouds (ops.argmin_repair; the
round-5 ivus_full 0.585 mm parity failure was an UNflagged composition
divergence of exactly this kind, fixed by the widened device skip band).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..models.contour import downsample_indices
from ..models.tensor import TensorGeometry
from ..ops.rotation_search import (
    _fast_ladder,
    _multires_rotation_search_impl,
    _prune_enabled,
    plan_is_bruteforce,
)
from .align_between import fused_between_core

_EPS64 = float(np.finfo(np.float64).eps)
# effective cross-backend f64 rounding unit: TPU emulates f64 with ~1e-14
# relative noise (see ops.rotation_search._eps_eff)
_EPS_EFF64 = 1e-14
_TWO_PI = 2.0 * math.pi


def take_device_sweeps(
    geometries: Sequence,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    sample_size: int,
) -> Optional[List[Tuple[TensorGeometry, object, dict]]]:
    """Claim every geometry's prefetched sweep handle for the fused chain.

    Returns ``[(claimed_tensor, pending_handle, pre_classification), …]``
    when ALL geometries ride the tensor fast path with a matching in-flight
    prefetch (io.build._prefetch_sweep*), else ``None`` — validation runs
    before any handle is detached, so a ``None`` leaves the geometries
    exactly as found for the regular orchestration."""
    from .align_within import _claim_tensor, _classify_pre

    key = (float(step_deg), float(range_deg), bool(bruteforce), int(sample_size))
    for g in geometries:
        if not isinstance(g, TensorGeometry):
            return None
        pending = getattr(g, "_pending_sweep", None)
        if pending is None or pending[1] != key:
            return None
        if g.n_frames < 2 or g.coords["Lumen"].shape[1] < 1:
            return None
        if g.ref_point is None or g.ref_pos is None:
            return None

    out = []
    for g in geometries:
        handle, _k = g._pending_sweep
        g._pending_sweep = None
        tg = _claim_tensor(g)
        pre = _classify_pre(tg)
        if pre is None:
            return None  # unreachable given the ref-point check above
        out.append((tg, handle, pre))
    return out


def _axis_rotation_dev(p1c, p2c, rp, anomalous):
    """Device f64 replica of align_within._axis_rotation_from_coords
    (align_within.rs:256-317): rotation putting the reference point
    rightmost, with the farthest-pair axis vertical when anomalous
    (``anomalous`` is a traced bool scalar).

    Returns ``(rotation, boundary_tie)``: the tie is True when the
    rightmost-point comparison sits within the cross-backend rounding band
    — the host replica could then take the other branch (a pi flip), so
    the composed cloud is not certified and the between winners must be
    re-decided from host-built clouds (ops.argmin_repair)."""
    line_angle = jnp.arctan2(p2c[1] - p1c[1], p2c[0] - p1c[0])
    desired = jnp.where(anomalous, math.pi / 2.0, 0.0)
    rotation = jnp.mod(desired - line_angle, _TWO_PI)
    c_ = jnp.cos(rotation)
    s_ = jnp.sin(rotation)

    def rot2_x(pt):
        dx = pt[0] - p1c[0]
        dy = pt[1] - p1c[1]
        return dx * c_ - dy * s_ + p1c[0]

    rx = rot2_x(rp)
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(rx), jnp.abs(p1c).max()), jnp.abs(p2c).max()
    )
    band = 64.0 * _EPS_EFF64 * (scale + 1.0)
    bad = jnp.asarray(False)
    boundary = jnp.asarray(False)
    for op in (p1c, p2c):
        # is-this-op-the-reference-point identity test.  The host replica
        # uses <= eps64 on bitwise-stable numpy values; HERE the operands
        # are jit-fused recomputations that can disagree by a few ulps
        # between fusion choices (XLA CSE is not guaranteed), so the
        # device skip uses the cross-backend band — the round-5 ivus_full
        # failure was exactly this: |p2c - rp| computing 4e-16 > eps64 in
        # one compilation, flipping skip and injecting a spurious pi flip
        # into the composed cloud.  The (eps64, band] disagreement zone is
        # flagged so the host re-decides from its own spec clouds.
        dist = jnp.maximum(jnp.abs(op[0] - rp[0]), jnp.abs(op[1] - rp[1]))
        skip = dist <= band
        boundary = boundary | ((dist > _EPS64) & (dist <= band))
        ox = rot2_x(op)
        bad = bad | ((~skip) & (rx <= ox))
        gap = jnp.abs(rx - ox)
        boundary = boundary | ((~skip) & (gap > 0) & (gap <= band))
    return jnp.where(bad, jnp.mod(rotation + math.pi, _TWO_PI), rotation), boundary


def _cloud_dev(delta, lum_xy, cents, rp_xy, dyn, meta, smooth: bool):
    """Device f64 replica of the within finish's lumen coordinate pass
    (align_within._finish_alignment_tensor_coords +
    TensorGeometry.finish_transform/smooth_xy) followed by the between
    cloud extraction (align_between.extract_stack_points).

    ``dyn`` carries the data-dependent scalars — [ref_idx, i1, i2] int32 +
    anomalous bool — as traced values, so the compiled executable depends
    only on shapes/flags and is reused across datasets.

    Returns ``(cloud [F·fn, 2], post_ref_centroid_xy [2], comp_tie)`` in
    f64.  ``comp_tie`` (scalar bool) certifies the composition itself: the
    CCW start roll is an argmax over transformed y whose winner selects
    the downsampled subset, so a top-2 gap inside the cross-backend
    rounding band means the host replica could sample a DIFFERENT point
    subset — a materially different cloud that no cost-band tie flag can
    catch (root cause of the round-5 ivus_full 0.585 mm parity failure:
    an 11-degree between flip from exactly this divergence).  The axis
    rotation's rightmost-comparison boundary is flagged the same way."""
    F, N, fn = meta
    idxs, anomalous = dyn
    ref_idx, i1, i2 = idxs[0], idxs[1], idxs[2]
    f64 = jnp.float64
    d64 = delta.astype(f64)
    cum = jnp.concatenate([jnp.zeros((1,), f64), jnp.cumsum(d64)])
    c0 = cents[0]
    txy = c0[None, :] - cents  # row 0 is exactly 0.0, like the host zeros
    post_ref = cents[ref_idx] + txy[ref_idx]

    # analytic post-transform positions of the axis-defining points (the
    # host's _xf closure, same association order)
    a_ref = cum[ref_idx]
    ca_ = jnp.cos(a_ref)
    sa_ = jnp.sin(a_ref)
    cref = cents[ref_idx]
    tref = txy[ref_idx]

    def xf(p):
        dx0 = p[0] - cref[0]
        dy0 = p[1] - cref[1]
        return jnp.stack(
            [
                dx0 * ca_ - dy0 * sa_ + cref[0] + tref[0],
                dx0 * sa_ + dy0 * ca_ + cref[1] + tref[1],
            ]
        )

    rp_t = xf(rp_xy)
    # both classification branches computed, winner selected by the traced
    # anomalous flag (align_within.rs:256-317's two axis definitions)
    p1c_anom = xf(lum_xy[ref_idx, i1])
    p2c_anom = xf(lum_xy[ref_idx, i2])
    p1c_reg = jnp.stack([cref[0] + tref[0], cref[1] + tref[1]])
    p1c = jnp.where(anomalous, p1c_anom, p1c_reg)
    p2c = jnp.where(anomalous, p2c_anom, rp_t)
    additional, axis_tie = _axis_rotation_dev(p1c, p2c, rp_t, anomalous)

    total = cum + additional
    ct = jnp.cos(total)[:, None]
    st = jnp.sin(total)[:, None]
    x = lum_xy[:, :, 0] - cents[:, 0:1]
    y = lum_xy[:, :, 1] - cents[:, 1:2]
    # only the transformed y is needed at full width (the roll argmax);
    # x/y are then gathered at the sampled post-roll positions and rotated
    # there — elementwise ops commute with the gather, so the subset values
    # are bitwise what full-transform-then-gather would produce
    yp = x * st + y * ct + cents[:, 1:2] + txy[:, 1:2]

    # last-max-Y start roll, applied iff the host would
    # (finish_transform's ccw_roll=(additional != 0.0))
    start = jnp.where(
        additional != 0.0,
        (N - 1) - jnp.argmax(yp[:, ::-1], axis=1),
        0,
    )
    # roll certification: a top-2 y gap inside the rounding band means the
    # host's argmax could pick a different start, shifting the sampled
    # subset (gap == 0 is safe: bitwise-equal values tie-break by index
    # identically everywhere)
    if N >= 2:
        from jax import lax as _lax

        top2, _ = _lax.top_k(yp, 2)
        gap = top2[:, 0] - top2[:, 1]
        y_scale = jnp.abs(yp).max(axis=1)
        band_y = 64.0 * _EPS_EFF64 * (y_scale + 1.0)
        roll_tie = (
            (additional != 0.0) & (gap > 0) & (gap <= band_y)
        ).any()
    else:
        roll_tie = jnp.asarray(False)
    comp_tie = axis_tie | roll_tie
    idx = downsample_indices(N, fn)
    gather = (jnp.asarray(idx)[None, :] + start[:, None]) % N  # [F, fn]
    xg = jnp.take_along_axis(x, gather, axis=1)
    yg = jnp.take_along_axis(y, gather, axis=1)
    xr = xg * ct - yg * st + cents[:, 0:1] + txy[:, 0:1]
    yr = xg * st + yg * ct + cents[:, 1:2] + txy[:, 1:2]

    if smooth:
        idx_f = np.arange(F)
        prev = np.maximum(idx_f - 1, 0)
        nxt = np.minimum(idx_f + 1, F - 1)
        xr = (xr[prev] + xr + xr[nxt]) / 3.0
        yr = (yr[prev] + yr + yr[nxt]) / 3.0

    cloud = jnp.stack([xr, yr], axis=-1).reshape(F * len(idx), 2)
    return cloud, post_ref, comp_tie


@partial(
    jax.jit,
    static_argnames=(
        "metas", "pair_idx", "full_stage2", "smooth",
        "step_deg", "range_deg", "bruteforce", "dtype_name", "fast", "prune",
    ),
)
def _fused_chain_impl(
    deltas,
    lums,
    cents,
    rps,
    dyns,
    metas,
    pair_idx,
    full_stage2: bool,
    smooth: bool,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    dtype_name: str,
    fast: bool,
    prune: bool,
):
    """Whole-pipeline device program: within deltas → finished lumen clouds
    → between search.  Returns
    ``concat(delta_0…delta_{n−1}, winners, delta_ties_0…, winner_ties)`` in
    f64 — ONE pull for everything the host epilogues need, including the
    argmin-certification flags."""
    dtype = jnp.dtype(dtype_name)
    f64 = jnp.float64
    n = len(metas)
    # pending handles are packed [3(F-1)]: angles | tie codes | final
    # stage centers (ops.rotation_search._pack_chain)
    delta_codes = []
    delta_centers = []
    split_deltas = []
    for g in range(n):
        third = deltas[g].shape[0] // 3
        split_deltas.append(deltas[g][:third])
        delta_codes.append(deltas[g][third : 2 * third])
        delta_centers.append(deltas[g][2 * third :])
    deltas = split_deltas
    clouds, refs = [], []
    comp_tie_any = jnp.asarray(False)
    for g in range(n):
        cloud, pref, ctie = _cloud_dev(
            deltas[g], lums[g], cents[g], rps[g], dyns[g], metas[g], smooth
        )
        clouds.append(cloud)
        refs.append(pref)
        comp_tie_any = comp_tie_any | ctie
    sizes = [int(c.shape[0]) for c in clouds]
    P = max(sizes)

    def pad(cloud):
        m = cloud.shape[0]
        if m == P:
            return cloud
        return jnp.zeros((P, 2), f64).at[:m].set(cloud)

    if full_stage2:
        # slots (0,1) and (2,3); stage 2 = (0,2) and (1,3) composed on
        # device by fused_between_core (entry.rs:206-277)
        t0ab = refs[0] - refs[1]
        t0cd = refs[2] - refs[3]
        ref1 = jnp.stack([pad(clouds[0]), pad(clouds[2])])
        test1 = jnp.stack(
            [pad(clouds[1] + t0ab[None, :]), pad(clouds[3] + t0cd[None, :])]
        )
        rmask1 = np.zeros((2, P), dtype=bool)
        rmask1[0, : sizes[0]] = True
        rmask1[1, : sizes[2]] = True
        tmask1 = np.zeros((2, P), dtype=bool)
        tmask1[0, : sizes[1]] = True
        tmask1[1, : sizes[3]] = True
        pivots = jnp.stack([refs[0], refs[2]])
        t0_2 = refs[0] - refs[2]
        winners, winner_ties = fused_between_core(
            ref1, test1, jnp.asarray(rmask1), jnp.asarray(tmask1), pivots,
            t0_2, step_deg, range_deg, bruteforce, dtype, fast=fast,
            prune=prune,
        )
    else:
        # independent pairs, dispatch_between_search semantics: each slot
        # centered on its reference cloud's mean (align_between.rs:11-92)
        K = len(pair_idx)
        refs_c, tests_c = [], []
        rmask = np.zeros((K, P), dtype=bool)
        tmask = np.zeros((K, P), dtype=bool)
        for k, (ia, ib) in enumerate(pair_idx):
            t0 = refs[ia] - refs[ib]
            rc = clouds[ia]
            tc = clouds[ib] + t0[None, :]
            pivot = rc.mean(axis=0)
            refs_c.append(pad((rc - pivot[None, :])).astype(dtype))
            tests_c.append(pad((tc - pivot[None, :])).astype(dtype))
            rmask[k, : sizes[ia]] = True
            tmask[k, : sizes[ib]] = True
        winners, winner_ties, _wte, _wtf, _wc = _multires_rotation_search_impl(
            jnp.stack(tests_c),
            jnp.stack(refs_c),
            jnp.asarray(tmask),
            jnp.asarray(rmask),
            step_deg,
            range_deg,
            bruteforce,
            False,
            fast=fast,
            prune=prune,
        )

    # an uncertified cloud composition invalidates EVERY winner (the host
    # then recomputes the whole between phase from its own spec clouds)
    winner_ties = winner_ties | comp_tie_any

    parts = [deltas[g].astype(f64) for g in range(n)]
    parts.append(winners.astype(f64))
    parts.extend(delta_codes[g].astype(f64) for g in range(n))
    parts.extend(delta_centers[g].astype(f64) for g in range(n))
    parts.append(winner_ties.astype(f64))
    return jnp.concatenate(parts)


def dispatch_fused_chain(
    taken: List[Tuple[TensorGeometry, object, dict]],
    pair_idx: Tuple[Tuple[int, int], ...],
    full_stage2: bool,
    smooth: bool,
    sample_size: int,
    step_deg: float,
    range_deg: float,
):
    """Enqueue the one-round-trip chain.  Returns ``(handle, delta_sizes)``
    — ``np.asarray(handle)`` blocks once for the whole pipeline; slice the
    per-geometry deltas by ``delta_sizes`` and take the final
    ``len(pair_idx) * (2 if full_stage2 else 1)`` entries as the between
    winners."""
    between_sample = max(int(sample_size), 500)
    deltas, lums, cents, rps, dyns, metas = [], [], [], [], [], []
    from .align_between import stack_sample_width

    for tg, pending, pre in taken:
        lum = tg.coords["Lumen"]
        F, N = lum.shape[0], lum.shape[1]
        fn = stack_sample_width(F, N, between_sample)
        i1, i2 = (
            (int(pre["farthest"][0]), int(pre["farthest"][1]))
            if pre["farthest"] is not None
            else (0, 0)
        )
        metas.append((F, N, fn))
        deltas.append(pending)
        lums.append(np.ascontiguousarray(lum[:, :, :2]))
        cents.append(np.ascontiguousarray(tg.centroids[:, :2]))
        rps.append(np.array([tg.ref_point.x, tg.ref_point.y]))
        dyns.append(
            (
                np.array([int(pre["ref_idx"]), i1, i2], dtype=np.int32),
                np.bool_(pre["anomalous"]),
            )
        )

    step = float(step_deg)
    rng = float(range_deg)
    handle = _fused_chain_impl(
        tuple(deltas),
        tuple(lums),
        tuple(cents),
        tuple(rps),
        tuple(dyns),
        metas=tuple(metas),
        pair_idx=tuple(tuple(p) for p in pair_idx),
        full_stage2=bool(full_stage2),
        smooth=bool(smooth),
        step_deg=step,
        range_deg=rng,
        bruteforce=bool(plan_is_bruteforce(step, rng)),
        dtype_name=jnp.dtype(config.compute_dtype).name,
        fast=_fast_ladder(),
        prune=_prune_enabled(),
    )
    try:
        handle.copy_to_host_async()
    except Exception:
        pass
    return handle, [m[0] - 1 for m in metas]
