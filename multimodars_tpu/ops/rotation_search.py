"""Batched rotation search: the reference's ``search_range`` +
``find_best_rotation`` multi-resolution ladder, re-expressed as static-shape
vmapped grid sweeps.

Reference semantics (process_utils.rs:33-75, align_within.rs:193-247):

- grid = ``start + i*step`` for i = 0..=ceil((stop-start)/step), kept while
  <= stop, each normalised to [-pi, pi)
- start/stop clamp the center +/- range to +/-limes
- argmin with first-wins tie-breaking; degenerate grid -> center
- ladder: coarse 1 deg full-range, then 0.1 deg within +/-5 deg, then
  0.01 deg within +/-0.1 deg, then the user step within +/-10*step —
  stages chosen statically from the user step

TPU mapping: the frame axis and the angle axis are both embarrassingly
parallel; each (frame, angle) candidate evaluates one masked Hausdorff over
an [N, M] tile.  Angles are swept with ``lax.map`` so only one [F, N, M]
intermediate is live at a time and XLA fuses the rotate + distance + min/max
chain into a single VPU loop per tile.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .hausdorff import hausdorff_sq_dense, hausdorff_sq_masked

TWO_PI = 2.0 * math.pi


def _normalize_angle(a):
    """((a + pi) rem_euclid 2pi) - pi, mapping to [-pi, pi) — same
    rem_euclid normalisation as the reference."""
    return jnp.mod(a + math.pi, TWO_PI) - math.pi


def _pallas_default() -> bool:
    """Whether to use the fused Pallas sweep.

    Opt-in via MMTPU_USE_PALLAS=1: the kernel is validated (interpret-mode
    parity tests) and lowers to Mosaic cleanly, but this environment's
    remote AOT compile helper cannot initialise libtpu for Mosaic custom
    calls (chipless helper reports no accelerator type), so the XLA path
    stays the default.  On a standard TPU VM flip the env var on."""
    import os

    if os.environ.get("MMTPU_USE_PALLAS", "0") != "1":
        return False
    try:
        import jax as _jax

        from .pallas_kernels import PALLAS_AVAILABLE

        return PALLAS_AVAILABLE and _jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _angle_chunk_default() -> int:
    """Angles evaluated per ``lax.map`` step of the sweep.

    Chunking amortizes the per-step loop/dispatch overhead of the mapped
    sweep at the price of a G-times-larger live tile; the default comes
    from the committed tuning experiment
    (benchmarks/benchmark_sweep_tuning.py -> results/sweep_tuning.json).
    Override with MMTPU_SWEEP_ANGLE_CHUNK (read at trace time)."""
    import os

    try:
        return max(int(os.environ.get("MMTPU_SWEEP_ANGLE_CHUNK", "2")), 1)
    except ValueError:  # pragma: no cover
        return 2


def rotation_cost_table(test, ref, test_mask, ref_mask, angles, angles_valid,
                        dense: bool = False, angle_chunk: Optional[int] = None):
    """Squared-Hausdorff cost of rotating each frame's centered test set by
    each candidate angle against its centered reference set.

    test:  [F, N, 2] (centered on the rotation pivot)
    ref:   [F, M, 2] (centered on the same pivot)
    angles:[F, K]; angles_valid: [F, K]
    Returns costs [F, K] with +inf at invalid slots.
    """
    K = angles.shape[1]
    G = angle_chunk if angle_chunk is not None else _angle_chunk_default()
    G = max(min(G, K), 1)

    def cost_for_angles(ks):
        # ks: [G] angle-slot indices; one fused [G, F, N, M] tile chain
        th = angles[:, ks].T  # [G, F]
        c = jnp.cos(th)[:, :, None]
        s = jnp.sin(th)[:, :, None]
        tx = test[None, ..., 0] * c - test[None, ..., 1] * s  # [G, F, N]
        ty = test[None, ..., 0] * s + test[None, ..., 1] * c
        rotated = jnp.stack([tx, ty], axis=-1)
        # reference is (ref, rotated-test): hausdorff is symmetric anyway
        if dense:
            return hausdorff_sq_dense(rotated, ref[None])  # [G, F]
        return hausdorff_sq_masked(
            rotated, ref[None], test_mask[None], ref_mask[None]
        )  # [G, F]

    # pad K to a chunk multiple; surplus slots recompute slot 0 (cheap, and
    # their outputs are discarded by the reshape slice below)
    n_chunks = -(-K // G)
    idx = jnp.arange(n_chunks * G) % K
    costs = lax.map(cost_for_angles, idx.reshape(n_chunks, G))  # [C, G, F]
    costs = costs.reshape(n_chunks * G, -1)[:K].T  # [F, K]
    inf = jnp.asarray(jnp.inf, costs.dtype)
    return jnp.where(angles_valid, costs, inf)


def candidate_angles(centers, step_deg: float, range_deg: float, limes_deg: float):
    """Static-shape candidate grid per frame: angles [F, K] + validity mask.

    Mirrors search_range's dynamic grid exactly: the static K bounds the
    worst case (no clamping); the validity mask reproduces the take_while
    and clamping behaviour per frame.
    """
    step = math.radians(step_deg)
    rng = math.radians(range_deg)
    limes = math.radians(limes_deg)
    K = int(math.ceil(2.0 * rng / step)) + 2 if step > 0 else 1

    start = jnp.maximum(centers - rng, -limes)  # [F]
    stop = jnp.minimum(centers + rng, limes)
    # a collapsed window (stop == start, center clamped at +/-limes) still
    # evaluates its single grid point, like the reference's take_while
    span_ok = stop >= start
    steps = jnp.maximum(jnp.ceil((stop - start) / step), 1.0)  # [F]

    i = jnp.arange(K, dtype=centers.dtype)
    raw = start[:, None] + i[None, :] * step  # [F, K]
    valid = (
        (i[None, :] <= steps[:, None])
        & (raw <= stop[:, None])
        & span_ok[:, None]
    )
    return _normalize_angle(raw), valid


# Argmin-certification band: the maximum cross-backend divergence of one
# candidate's squared-Hausdorff cost computed in ``dtype``.  Each distance
# element carries absolute error ~ C·eps·r·sqrt(d2) + C·eps·d2 (r = point
# scale; the sqrt term dominates for small costs because dx is a difference
# of O(r) quantities), and min/max reductions add nothing.  Two candidates
# whose costs differ by less than twice this can swap argmin order between
# backends (XLA:CPU vs XLA:TPU vs emulated-f64), which moves the output
# geometry by a whole grid step — the flat-landscape failure VERDICT r4
# predicted and benchmarks/results/tpu_parity.json round 5 observed
# (an 11-degree within-chain flip on ivus_full).  Flagged searches are
# re-decided in exact host f64 (ops.argmin_repair), making the final angle
# backend-independent.
#
# The constant is CALIBRATED, not guessed: on the OCT-280 anchor's fine
# ladder grid the measured max |cost_f32 - cost_f64| over candidates is
# 2.3 * eps32 * (sqrt(scale2*m) + m) (see ROUND5.md), so a flip needs two
# candidates within 2*2.3 = 4.6 of each other in those units; 8 gives a
# 1.7x margin over that two-sided threshold while keeping the flag rate
# low enough that the tier-2 f64 device re-sweep stays cheap.
_TIE_C = 8.0


def _eps_eff(dtype):
    """Effective cross-backend rounding unit of ``dtype`` arithmetic.

    For f32 it is the format eps.  For f64 the format eps understates the
    real divergence: TPUs emulate f64 (float-pair arithmetic), and the
    measured TPU-vs-CPU residual of this package's f64 pipelines is
    ~4e-14 relative (benchmarks/results/tpu_parity.json) — ~200x eps64.
    The floor of 1e-14 makes the certification band cover emulated-f64
    noise; real cost gaps on clinical data are orders of magnitude wider,
    so this widens flags only on genuinely flat landscapes."""
    eps = float(jnp.finfo(dtype).eps)
    return max(eps, 1e-14)


def _tie_flags(costs, m, scale2, any_valid):
    """bool[F]: another candidate's cost lies within the rounding band of
    the winner — the argmin is not certified stable across backends."""
    eps = jnp.asarray(_eps_eff(costs.dtype), costs.dtype)
    band = _TIE_C * eps * (jnp.sqrt(jnp.maximum(scale2 * m, 0.0)) + m)
    near = costs <= (m + band)[:, None]
    return (near.sum(axis=1) > 1) & any_valid


def _point_scale2(test, ref):
    """Per-frame max squared point radius over both sets [F] (padding rows
    are zeros and cannot raise the max)."""
    t2 = (test * test).sum(-1).max(axis=-1)
    r2 = (ref * ref).sum(-1).max(axis=-1)
    return jnp.maximum(t2, r2)


def search_range_batched(
    test,
    ref,
    test_mask,
    ref_mask,
    step_deg: float,
    range_deg: float,
    centers,
    limes_deg: float,
    use_pallas: bool = False,
    dense: bool = False,
):
    """One ``search_range`` stage vmapped over the frame axis.

    Returns ``(best, tie)``: the best angle per frame (first-wins argmin,
    falling back to the center where the grid is degenerate) and the
    certification flag (True = a near-tie within the rounding band; the
    argmin may differ between backends and needs exact repair).  Parity:
    process_utils.rs:33-75.
    """
    if step_deg <= 0.0:
        return centers, jnp.zeros(centers.shape, dtype=bool)
    angles, valid = candidate_angles(centers, step_deg, range_deg, limes_deg)
    if use_pallas:
        from .pallas_kernels import rotation_cost_table_pallas

        costs = rotation_cost_table_pallas(test, ref, test_mask, ref_mask, angles, valid)
    else:
        costs = rotation_cost_table(
            test, ref, test_mask, ref_mask, angles, valid, dense
        )
    best_k = jnp.argmin(costs, axis=1)  # first occurrence wins, like the
    # sequential reduce with a strictly-less comparison
    best = jnp.take_along_axis(angles, best_k[:, None], axis=1)[:, 0]
    any_valid = valid.any(axis=1)
    m = jnp.min(costs, axis=1)
    tie = _tie_flags(costs, m, _point_scale2(test, ref), any_valid)
    # fully-inverted window (center beyond limes +/- range): the clamped
    # start angle, i.e. grid slot 0, matches the reference's clamp
    return jnp.where(any_valid, best, angles[:, 0]), tie


# ---------------------------------------------------------------------------
# certified lower-bound pruning
# ---------------------------------------------------------------------------
#
# The fine ladder stages evaluate O(100) candidate angles at full [N, M]
# Hausdorff cost each, but the argmin is decided by a handful of them.  A
# directed Hausdorff whose OUTER (max) set is subsampled is a true lower
# bound of the full cost — dropping rows from a max can only lower it, while
# the inner min still ranges over the full opposite set.  So each stage can:
#
#   1. sweep ALL candidates with outer sets strided by _PRUNE_STRIDE
#      (1/stride of the full work) to get lower bounds lb[k]
#      (stride 6 measured fastest on clinical-like contours; stride 8's
#      weaker bounds start failing certificates and paying fallbacks),
#   2. evaluate the _PRUNE_TOP smallest-lb candidates at full cost,
#   3. certify: if the best exact cost m is strictly below every
#      unevaluated candidate's lb (with a relative margin covering any
#      ulp-level divergence between the two kernels), the full argmin is
#      provably among the evaluated ones — including first-wins tie order,
#      because lax.top_k prefers lower indices on equal bounds and any
#      unevaluated candidate costs strictly more than m.
#
# If certification fails for any pair in the batch, the whole stage falls
# back to the exact full sweep (lax.cond — a scalar branch, so only one
# side executes).  Results are bit-identical to the unpruned sweep either
# way; only the work changes.  Parity: search_range (process_utils.rs:33-75).

# K=22 fine stages (the 0.01-deg ladder tail) measured FASTER exact than
# pruned on-device (2.7 vs 5.4 ms at [279,520,520]): the LB pass + top_k +
# gather overhead exceeds the saving once K is this small.  28 keeps the
# ~100-candidate stages pruned and lets the short tails run exact.
_PRUNE_MIN_K = 28
_PRUNE_MIN_POINTS = 128
_PRUNE_STRIDE = 6
_PRUNE_TOP = 12


def _prune_enabled() -> bool:
    import os

    return os.environ.get("MMTPU_NO_PRUNE", "0") != "1"


def _directed_sq(p, q, pmask, qmask, dense):
    """max over p rows of (min over q rows of squared distance)."""
    dx = p[..., :, None, 0] - q[..., None, :, 0]
    dy = p[..., :, None, 1] - q[..., None, :, 1]
    d2 = dx * dx + dy * dy
    if dense:
        return d2.min(axis=-1).max(axis=-1)
    inf = jnp.asarray(jnp.inf, d2.dtype)
    mn = jnp.where(qmask[..., None, :], d2, inf).min(axis=-1)
    return jnp.where(pmask, mn, -inf).max(axis=-1)


def _lb_cost_table(test, ref, test_mask, ref_mask, angles, angles_valid,
                   stride: int, dense: bool):
    """Lower-bound cost table [F, K]: outer sets strided, inner sets full."""
    K = angles.shape[1]
    ref_sub = ref[:, ::stride]
    rsm = ref_mask[:, ::stride]
    tsm = test_mask[:, ::stride]

    def lb_for_angle(k):
        th = angles[:, k]
        c = jnp.cos(th)[:, None]
        s = jnp.sin(th)[:, None]
        tx = test[..., 0] * c - test[..., 1] * s
        ty = test[..., 0] * s + test[..., 1] * c
        rot_full = jnp.stack([tx, ty], axis=-1)
        rot_sub = rot_full[:, ::stride]
        fwd = _directed_sq(rot_sub, ref, tsm, ref_mask, dense)
        bwd = _directed_sq(ref_sub, rot_full, rsm, test_mask, dense)
        lb = jnp.maximum(fwd, bwd)
        if not dense:
            empty = (~test_mask.any(axis=-1)) | (~ref_mask.any(axis=-1))
            lb = jnp.where(empty, jnp.zeros_like(lb), lb)
        return lb

    costs = lax.map(lb_for_angle, jnp.arange(K)).T  # [F, K]
    inf = jnp.asarray(jnp.inf, costs.dtype)
    return jnp.where(angles_valid, costs, inf)


def search_range_batched_pruned(
    test, ref, test_mask, ref_mask,
    step_deg: float, range_deg: float, centers, limes_deg: float,
    dense: bool = False,
):
    """Bit-identical to :func:`search_range_batched` (XLA path), usually at
    ~1/stride + T/K of the work; falls back to the exact full sweep when the
    certificate fails.  Returns ``(best, tie)`` like the unpruned stage."""
    if step_deg <= 0.0:
        return centers, jnp.zeros(centers.shape, dtype=bool)
    angles, valid = candidate_angles(centers, step_deg, range_deg, limes_deg)
    K = angles.shape[1]
    T = min(_PRUNE_TOP, K)
    F = angles.shape[0]

    lb = _lb_cost_table(
        test, ref, test_mask, ref_mask, angles, valid, _PRUNE_STRIDE, dense
    )
    _, sel_idx = lax.top_k(-lb, T)  # T smallest lb, ties -> lower index first
    sel_idx = jnp.sort(sel_idx, axis=1)  # restore original candidate order
    angles_sel = jnp.take_along_axis(angles, sel_idx, axis=1)
    valid_sel = jnp.take_along_axis(valid, sel_idx, axis=1)
    exact = rotation_cost_table(
        test, ref, test_mask, ref_mask, angles_sel, valid_sel, dense
    )  # [F, T]
    m = exact.min(axis=1)
    big = jnp.asarray(K, sel_idx.dtype)
    k_best = jnp.where(exact == m[:, None], sel_idx, big).min(axis=1)
    k_best = jnp.minimum(k_best, K - 1)  # all-inf rows: clamp for the gather
    best = jnp.take_along_axis(angles, k_best[:, None], axis=1)[:, 0]
    any_valid = valid.any(axis=1)
    pruned_answer = jnp.where(any_valid, best, angles[:, 0])
    scale2 = _point_scale2(test, ref)
    # evaluated-candidate ties; unevaluated ones are excluded by the
    # band-aware certificate below (cost >= lb > m + band when certified)
    tie_eval = _tie_flags(exact, m, scale2, any_valid)

    # certificate: every unevaluated candidate's lower bound strictly above
    # m by at least max(1e-5 relative, the argmin-certification band) — the
    # band term guarantees no band-level near-tie can hide among the
    # unevaluated candidates (their exact costs exceed lb)
    inf = jnp.asarray(jnp.inf, lb.dtype)
    lb_rest = lb.at[jnp.arange(F)[:, None], sel_idx].set(inf)
    lb_rest_min = lb_rest.min(axis=1)
    eps = jnp.asarray(_eps_eff(exact.dtype), exact.dtype)
    band = _TIE_C * eps * (jnp.sqrt(jnp.maximum(scale2 * m, 0.0)) + m)
    margin = jnp.maximum(lb_rest_min * jnp.asarray(1e-5, lb.dtype), band)
    cert = (
        (m < lb_rest_min - margin)
        | (m <= 0.0)  # zero-cost optimum: lb==0 ties are all selected
        | jnp.isinf(lb_rest_min)  # nothing unevaluated (or all invalid)
        | ~any_valid
    )
    # m <= 0 certifies the answer but exact zero ties still need repair
    zero_tie = (m <= 0.0) & ((exact <= 0.0).sum(axis=1) > 1) & any_valid

    def _fallback():
        costs = rotation_cost_table(
            test, ref, test_mask, ref_mask, angles, valid, dense
        )
        bk = jnp.argmin(costs, axis=1)
        b = jnp.take_along_axis(angles, bk[:, None], axis=1)[:, 0]
        mf = jnp.min(costs, axis=1)
        tf = _tie_flags(costs, mf, scale2, any_valid)
        return jnp.where(any_valid, b, angles[:, 0]), tf

    return lax.cond(
        cert.all(), lambda: (pruned_answer, tie_eval | zero_tie), _fallback
    )


def ladder_stages(step_deg: float, range_deg: float):
    """Static stage list (step, range, centered_on_previous) reproducing
    find_best_rotation's match arms (align_within.rs:208-246)."""
    if step_deg >= 1.0:
        return [(step_deg, range_deg, False)]
    if 0.1 <= step_deg < 1.0:
        return [
            (1.0, range_deg, False),
            (step_deg, min(range_deg, 5.0), True),
        ]
    if 0.01 <= step_deg < 0.1:
        return [
            (1.0, range_deg, False),
            (0.1, min(range_deg, 5.0), True),
            (step_deg, min(range_deg, 10.0 * step_deg), True),
        ]
    return [
        (1.0, range_deg, False),
        (0.1, min(range_deg, 5.0), True),
        (0.01, min(range_deg, 0.1), True),
        (step_deg, min(range_deg, 10.0 * step_deg), True),
    ]


def _plan_candidates(step_deg: float, range_deg: float) -> int:
    """Candidate count of one sweep stage (matches the k_static grids)."""
    return int(math.ceil(2.0 * range_deg / step_deg)) + 2 if step_deg > 0 else 1


# Prefer the single bruteforce sweep unless the ladder at least halves the
# total candidate count.  Each extra ladder stage has a fixed cost (its own
# sweep kernel inside the per-frame scan; the late stages are tiny batches
# that under-fill the vector unit) measured at roughly one ~160-candidate
# stage-equivalent on v5e: at step 0.5/range 90 the ladder's 204 candidates
# over 2 stages ran ~4% SLOWER than bruteforce's 362 over 1, while at
# step 0.25 (226 vs 722, ratio 3.2x) it ran ~12% faster.  The crossover sits
# between ratios 1.8 and 3.2; 2.0 is the round threshold.
_BRUTE_PREFER_RATIO = 2.0


def plan_is_bruteforce(step_deg: float, range_deg: float) -> bool:
    """True when the single full-grid sweep is the better execution plan for
    the requested (step, range) — either because the ladder degenerates to it
    (step >= 1 deg: ladder_stages yields one stage with the user's own step
    and range, the reference's own behavior — align_within.rs:208-246 match
    arm ``step if step >= 1.0``), or because the ladder saves fewer than
    ``_BRUTE_PREFER_RATIO``x candidates and its per-stage overhead makes it a
    net loss.

    Callers collapse both cases onto the ``bruteforce=True`` signature so the
    modes share one compiled executable.  Result semantics: the ladder's
    stage grids are subsets of the full step grid (stage centers land on
    coarser-grid angles), so whenever the full-grid argmin lies inside the
    refinement window the two plans return the same angle; where they differ
    the full sweep's exact grid argmin is strictly the better optimum of the
    objective the reference's ladder approximates.  Set
    ``MMTPU_STRICT_LADDER=1`` to disable the cost-model collapse and emulate
    the reference's ladder verbatim at every step size (the degenerate
    step>=1 collapse stays — there the ladder IS the bruteforce grid)."""
    stages = ladder_stages(step_deg, range_deg)
    if len(stages) == 1 and stages[0][0] == step_deg and stages[0][1] == range_deg:
        return True
    import os

    if os.environ.get("MMTPU_STRICT_LADDER", "0") == "1":
        return False
    brute = _plan_candidates(step_deg, range_deg)
    ladder = sum(_plan_candidates(s, r) for s, r, _ in stages)
    return brute <= _BRUTE_PREFER_RATIO * ladder


def _fast_ladder() -> bool:
    """Opt-in coarse-stage subsampling (MMTPU_FAST_LADDER=1).

    Off by default: Hausdorff is a max-min statistic, so even a stride-4
    subset at the 1-degree stage can switch basins on near-symmetric
    contours (the idealized-geometry fixture recovers -10.1 instead of
    -15 degrees).  With rich, asymmetric clinical contours the fast ladder
    matched the exact ladder to 0.0000 degrees across step regimes and cut
    the default (step 0.5, range 90) sweep ~1.8x — enable it when the
    anatomy is known to be asymmetric and throughput matters."""
    import os

    return os.environ.get("MMTPU_FAST_LADDER", "0") == "1"


# Fast-ladder point stride for the FIRST (1 deg) stage only.  That stage
# merely has to localise the optimum within stage 2's +/-5 deg full-
# resolution window, a 5x-the-grid-step margin, so a strided subset is
# safe there; later stages stay at full resolution because Hausdorff is a
# max-min statistic — a single dropped extremal point can shift a fine
# argmin by more than the next window (measured 0.83 deg shifts when the
# 0.1 deg stage ran strided).  Cost model: stage cost ~ K * (N/stride)^2
# and the 1 deg stage dominates the default ladder (182 of 204 candidates
# at step 0.5, range 90), so stride 4 cuts the default sweep ~5x while the
# fine stages — and therefore the result — are untouched.
_STAGE1_STRIDE = 4
_MIN_SUBSAMPLE_POINTS = 64


def _stage_views(test, ref, test_mask, ref_mask, stride: int):
    if stride == 1:
        return test, ref, test_mask, ref_mask
    return (
        test[:, ::stride],
        ref[:, ::stride],
        test_mask[:, ::stride],
        ref_mask[:, ::stride],
    )


@partial(
    jax.jit,
    static_argnames=(
        "step_deg", "range_deg", "bruteforce", "use_pallas", "dense", "fast",
        "prune",
    ),
)
def _multires_rotation_search_impl(
    test,
    ref,
    test_mask,
    ref_mask,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    use_pallas: bool,
    dense: bool = False,
    fast: bool = True,
    prune: bool = True,
):
    dtype = test.dtype
    F = test.shape[0]
    centers = jnp.zeros((F,), dtype=dtype)
    if bruteforce:
        k_static = (
            int(math.ceil(2.0 * range_deg / step_deg)) + 2
            if step_deg > 0
            else 1
        )
        if (
            prune
            and not use_pallas
            and min(test.shape[1], ref.shape[1]) >= _PRUNE_MIN_POINTS
            and k_static >= _PRUNE_MIN_K
        ):
            best, tie = search_range_batched_pruned(
                test, ref, test_mask, ref_mask, step_deg, range_deg,
                centers, range_deg, dense,
            )
        else:
            best, tie = search_range_batched(
                test, ref, test_mask, ref_mask, step_deg, range_deg, centers,
                range_deg, use_pallas, dense,
            )
        # single-stage plan: the "final stage" IS the whole search
        no_early = jnp.zeros((F,), dtype=bool)
        return best, tie, no_early, tie, centers
    stages = ladder_stages(step_deg, range_deg)
    subsample = (
        fast
        and len(stages) > 1
        and not use_pallas
        and min(test.shape[1], ref.shape[1]) >= _MIN_SUBSAMPLE_POINTS
    )
    prune_ok = (
        prune
        and not use_pallas
        and min(test.shape[1], ref.shape[1]) >= _PRUNE_MIN_POINTS
    )
    best = centers
    tie_any = jnp.zeros((F,), dtype=bool)
    tie_early = jnp.zeros((F,), dtype=bool)
    tie_final = jnp.zeros((F,), dtype=bool)
    last_centers = centers
    for idx, (stage_step, stage_range, centered) in enumerate(stages):
        stage_centers = best if centered else centers
        stride = _STAGE1_STRIDE if (subsample and idx == 0) else 1
        t, r, tm, rm = _stage_views(test, ref, test_mask, ref_mask, stride)
        k_static = (
            int(math.ceil(2.0 * stage_range / stage_step)) + 2
            if stage_step > 0
            else 1
        )
        if prune_ok and stride == 1 and k_static >= _PRUNE_MIN_K:
            best, tie = search_range_batched_pruned(
                t, r, tm, rm, stage_step, stage_range, stage_centers,
                range_deg, dense,
            )
        else:
            best, tie = search_range_batched(
                t,
                r,
                tm,
                rm,
                stage_step,
                stage_range,
                stage_centers,
                range_deg,
                use_pallas,
                dense,
            )
        # a near-tie at ANY stage can move the refinement window, so the
        # whole search is flagged; the split into early/final stages lets
        # the repair re-run only the final window when the earlier windows
        # are certified (ops.argmin_repair tier 2)
        tie_any = tie_any | tie
        if idx == len(stages) - 1:
            tie_final = tie
            last_centers = stage_centers
        else:
            tie_early = tie_early | tie
    return best, tie_any, tie_early, tie_final, last_centers


def multires_rotation_search(
    test,
    ref,
    test_mask,
    ref_mask,
    step_deg: float,
    range_deg: float,
    bruteforce: bool = False,
    use_pallas=None,
):
    """Best rotation per frame pair: full ladder (or single brute-force
    sweep), all stages batched over the frame axis.

    test/ref: [F, N|M, 2] centered point sets; masks [F, N|M].
    Returns ``(best [F], tie [F])``: best angles in radians plus the
    argmin-certification flags (True = near-tie within the rounding band;
    the caller repairs flagged slots via :mod:`ops.argmin_repair`).
    ``use_pallas=None`` auto-selects the fused VMEM-resident sweep on TPU
    backends.
    """
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True  # identical plan -> share the compiled executable
    best, tie, _te, _tf, _c = _multires_rotation_search_impl(
        test, ref, test_mask, ref_mask, float(step_deg), float(range_deg),
        bool(bruteforce), bool(use_pallas), fast=_fast_ladder(),
        prune=_prune_enabled(),
    )
    return best, tie


@partial(
    jax.jit,
    static_argnames=("step_deg", "range_deg", "bruteforce", "use_pallas",
                     "fast", "prune", "dense"),
)
def _multires_packed_impl(
    test, ref, test_mask, ref_mask, step_deg, range_deg, bruteforce,
    use_pallas, fast, prune, dense=False,
):
    """Single-output form for dispatch paths: ``[2F]`` f64 vector of
    ``concat(best, tie_flags)`` so completion + angles + certification all
    arrive in ONE tunnel pull."""
    if dense:
        tm = jnp.ones(test.shape[:2], dtype=bool)
        rm = jnp.ones(ref.shape[:2], dtype=bool)
    else:
        tm, rm = test_mask, ref_mask
    best, tie, _te, _tf, _c = _multires_rotation_search_impl(
        test, ref, tm, rm, step_deg, range_deg, bruteforce, use_pallas,
        dense=dense, fast=fast, prune=prune,
    )
    return jnp.concatenate(
        [best.astype(jnp.float64), tie.astype(jnp.float64)]
    )


def multires_rotation_search_packed(
    test, ref, test_mask, ref_mask, step_deg, range_deg, bruteforce=False,
    use_pallas=None, dense=False,
):
    """:func:`multires_rotation_search` packed as one ``[2F]`` f64 array
    (first half angles, second half 0/1 tie flags) — one device pull."""
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True
    return _multires_packed_impl(
        test, ref, test_mask, ref_mask, float(step_deg), float(range_deg),
        bool(bruteforce), bool(use_pallas), fast=_fast_ladder(),
        prune=_prune_enabled(), dense=bool(dense),
    )


@partial(
    jax.jit,
    static_argnames=("step_deg", "range_deg", "bruteforce", "use_pallas",
                     "fast", "prune"),
)
def _multires_packed3_impl(
    test, ref, test_mask, ref_mask, step_deg, range_deg, bruteforce,
    use_pallas, fast, prune,
):
    best, _tie, te, tf, cen = _multires_rotation_search_impl(
        test, ref, test_mask, ref_mask, step_deg, range_deg, bruteforce,
        use_pallas, fast=fast, prune=prune,
    )
    return _pack_chain(best, te, tf, cen)


def multires_rotation_search_packed3(
    test, ref, test_mask, ref_mask, step_deg, range_deg, bruteforce=False,
    use_pallas=None,
):
    """:func:`multires_rotation_search` packed as one ``[3F]`` f64 array —
    ``[angles | tie codes | final-stage centers]`` (the chain layout) — so
    batch consumers (parallel.cohort) get stage-attributed repairs from a
    single pull."""
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True
    return _multires_packed3_impl(
        test, ref, test_mask, ref_mask, float(step_deg), float(range_deg),
        bool(bruteforce), bool(use_pallas), fast=_fast_ladder(),
        prune=_prune_enabled(),
    )


@partial(
    jax.jit,
    static_argnames=("step_deg", "range_deg", "bruteforce", "use_pallas", "fast",
                     "prune"),
)
def _multires_dense_impl(
    test, ref, step_deg, range_deg, bruteforce, use_pallas, fast, prune
):
    dummy_t = jnp.ones(test.shape[:2], dtype=bool)
    dummy_r = jnp.ones(ref.shape[:2], dtype=bool)
    best, tie, _te, _tf, _c = _multires_rotation_search_impl(
        test, ref, dummy_t, dummy_r, step_deg, range_deg, bruteforce,
        use_pallas, dense=True, fast=fast, prune=prune,
    )
    return best, tie


def multires_rotation_search_dense(
    test, ref, step_deg, range_deg, bruteforce=False, use_pallas=None
):
    """Mask-free variant of :func:`multires_rotation_search` for rectangular
    batches: no mask transfers, no sentinel selects.  Returns
    ``(best, tie)`` like the masked variant."""
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True  # identical plan -> share the compiled executable
    return _multires_dense_impl(
        test, ref, float(step_deg), float(range_deg), bool(bruteforce),
        bool(use_pallas), fast=_fast_ladder(), prune=_prune_enabled(),
    )


def _pack_chain(best, tie_early, tie_final, last_centers):
    """Chain pull layout ``[3(F-1)]``: angles | tie codes | final-stage
    centers.  Code: 0 = certified, 1 = final-stage tie only (tier-2 can
    re-run just the final window from the packed center), 2/3 = an earlier
    stage tied too (tier-2 re-runs the full ladder).  One pull carries the
    answers, the certification state, and the repair inputs."""
    code = tie_final.astype(jnp.float64) + 2.0 * tie_early.astype(jnp.float64)
    return jnp.concatenate(
        [best.astype(jnp.float64), code, last_centers.astype(jnp.float64)]
    )


@partial(
    jax.jit,
    static_argnames=("step_deg", "range_deg", "bruteforce", "use_pallas", "fast",
                     "prune"),
)
def _chain_rotation_search_impl(
    pts, mask, step_deg, range_deg, bruteforce, use_pallas, fast, prune
):
    # consecutive-pair view formed ON DEVICE: one [F, S, 2] transfer instead
    # of two nearly-identical [F-1, S, 2] host slices
    best, tie, te, tf, cen = _multires_rotation_search_impl(
        pts[1:], pts[:-1], mask[1:], mask[:-1],
        step_deg, range_deg, bruteforce, use_pallas, fast=fast, prune=prune,
    )
    return _pack_chain(best, te, tf, cen)


@partial(
    jax.jit,
    static_argnames=("step_deg", "range_deg", "bruteforce", "use_pallas", "fast",
                     "prune"),
)
def _chain_rotation_search_dense_impl(
    pts, step_deg, range_deg, bruteforce, use_pallas, fast, prune
):
    dummy = jnp.ones(pts.shape[:2], dtype=bool)
    best, tie, te, tf, cen = _multires_rotation_search_impl(
        pts[1:], pts[:-1], dummy[1:], dummy[:-1],
        step_deg, range_deg, bruteforce, use_pallas, dense=True, fast=fast,
        prune=prune,
    )
    return _pack_chain(best, te, tf, cen)


def chain_rotation_search(
    pts, mask, step_deg, range_deg, bruteforce, use_pallas=None
):
    """Relative rotations of every consecutive frame pair of one pullback.

    pts: [F, S, 2] centered sample sets; mask: [F, S] or None (None = every
    slot valid, which skips the sentinel selects and the mask transfer).
    Returns a packed ``[2(F-1)]`` f64 device array: the best relative
    angles followed by their 0/1 argmin-certification tie flags — one pull
    carries both (the batched form of the reference's sequential chain,
    align_within.rs:72-123; see pipelines.align_within module docstring for
    the rotation-invariance argument).
    """
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True  # identical plan -> share the compiled executable
    if mask is None:
        return _chain_rotation_search_dense_impl(
            pts, float(step_deg), float(range_deg), bool(bruteforce),
            bool(use_pallas), fast=_fast_ladder(), prune=_prune_enabled(),
        )
    return _chain_rotation_search_impl(
        pts, mask, float(step_deg), float(range_deg), bool(bruteforce),
        bool(use_pallas), fast=_fast_ladder(), prune=_prune_enabled(),
    )


@partial(
    jax.jit,
    static_argnames=(
        "step_deg", "range_deg", "bruteforce", "n_cat", "center_x",
        "center_y", "radius", "use_pallas", "fast", "prune",
    ),
)
def _chain_rotation_search_staged_impl(
    dev_xy, perm, step_deg, range_deg, bruteforce, n_cat, center_x,
    center_y, radius, use_pallas, fast, prune,
):
    # device-resident input pipeline: the raw [F, P, 2] lumen stack was
    # uploaded at input-construction time; the permutation gather, the
    # catheter ring synthesis, the lumen-centroid centering and the full
    # search ladder all run in ONE dispatch — no h2d transfer on the
    # critical path (the tunnel round-trip is the dominant cost there)
    xy = jnp.take(dev_xy, perm, axis=0)  # [F, P, 2] in aligned frame order
    F = xy.shape[0]
    cxy = xy.mean(axis=1)  # lumen-only centroid, like _prefetch_sweep
    if n_cat > 0:
        ang = (TWO_PI / n_cat) * jnp.arange(n_cat, dtype=xy.dtype)
        ring = jnp.stack(
            [center_x + radius * jnp.cos(ang), center_y + radius * jnp.sin(ang)],
            axis=-1,
        )
        pts_all = jnp.concatenate(
            [xy, jnp.broadcast_to(ring[None], (F, n_cat, 2))], axis=1
        )
    else:
        pts_all = xy
    pts = pts_all - cxy[:, None, :]
    dummy = jnp.ones(pts.shape[:2], dtype=bool)
    best, tie, te, tf, cen = _multires_rotation_search_impl(
        pts[1:], pts[:-1], dummy[1:], dummy[:-1],
        step_deg, range_deg, bruteforce, use_pallas, dense=True, fast=fast,
        prune=prune,
    )
    return _pack_chain(best, te, tf, cen)


@partial(
    jax.jit,
    static_argnames=(
        "step_deg", "range_deg", "bruteforce", "n_cat", "center_x",
        "center_y", "radius", "fast", "prune",
    ),
)
def _chain_pairs_staged64_impl(
    dev_xy64, perm, pair_pos, step_deg, range_deg, bruteforce, n_cat,
    center_x, center_y, radius, fast, prune,
):
    """f64 re-sweep of SELECTED chain pairs from the staged f64 input twin
    (argmin-certification repair tier 2): the same composition as
    :func:`_chain_rotation_search_staged_impl` — perm gather, catheter
    ring synthesis, lumen-centroid centering — in f64, restricted to the
    ``pair_pos`` pairs.  Only int32 indices travel; returns the packed
    ``[2T]`` angles+ties vector (residual f64-band ties fall through to
    the exact host tier)."""
    xy = jnp.take(dev_xy64, perm, axis=0)  # [F, P, 2] f64, aligned order
    F = xy.shape[0]
    cxy = xy.mean(axis=1)
    if n_cat > 0:
        ang = (TWO_PI / n_cat) * jnp.arange(n_cat, dtype=xy.dtype)
        ring = jnp.stack(
            [center_x + radius * jnp.cos(ang), center_y + radius * jnp.sin(ang)],
            axis=-1,
        )
        pts_all = jnp.concatenate(
            [xy, jnp.broadcast_to(ring[None], (F, n_cat, 2))], axis=1
        )
    else:
        pts_all = xy
    pts = pts_all - cxy[:, None, :]
    test = jnp.take(pts, pair_pos + 1, axis=0)  # [T, S, 2]
    ref = jnp.take(pts, pair_pos, axis=0)
    dummy = jnp.ones(test.shape[:2], dtype=bool)
    best, tie, _te, _tf, _c = _multires_rotation_search_impl(
        test, ref, dummy, dummy, step_deg, range_deg, bruteforce, False,
        dense=True, fast=fast, prune=prune,
    )
    return jnp.concatenate([best.astype(jnp.float64), tie.astype(jnp.float64)])


@partial(
    jax.jit,
    static_argnames=(
        "final_step", "final_range", "limes_deg", "n_cat", "center_x",
        "center_y", "radius",
    ),
)
def _chain_pairs_staged64_final_impl(
    dev_xy64, perm, pair_pos, centers, final_step, final_range, limes_deg,
    n_cat, center_x, center_y, radius,
):
    """Final-ladder-stage-only variant of :func:`_chain_pairs_staged64_impl`
    for flags attributed to the last stage (tie code 1): the earlier
    windows are certified, so only the final (step, min(range, 10*step))
    window around the packed centers needs f64 re-decision."""
    xy = jnp.take(dev_xy64, perm, axis=0)
    F = xy.shape[0]
    cxy = xy.mean(axis=1)
    if n_cat > 0:
        ang = (TWO_PI / n_cat) * jnp.arange(n_cat, dtype=xy.dtype)
        ring = jnp.stack(
            [center_x + radius * jnp.cos(ang), center_y + radius * jnp.sin(ang)],
            axis=-1,
        )
        pts_all = jnp.concatenate(
            [xy, jnp.broadcast_to(ring[None], (F, n_cat, 2))], axis=1
        )
    else:
        pts_all = xy
    pts = pts_all - cxy[:, None, :]
    test = jnp.take(pts, pair_pos + 1, axis=0)
    ref = jnp.take(pts, pair_pos, axis=0)
    dummy = jnp.ones(test.shape[:2], dtype=bool)
    best, tie = search_range_batched(
        test, ref, dummy, dummy, final_step, final_range,
        centers.astype(jnp.float64), limes_deg, False, True,
    )
    return jnp.concatenate([best.astype(jnp.float64), tie.astype(jnp.float64)])


@partial(
    jax.jit,
    static_argnames=("final_step", "final_range", "limes_deg"),
)
def _final_stage_packed_impl(
    test, ref, tmask, rmask, centers, final_step, final_range, limes_deg
):
    """f64 re-decision of ONLY the final ladder window around ``centers``
    for a padded+masked pair batch (argmin-repair tier 2, code-1 flags)."""
    best, tie = search_range_batched(
        test, ref, tmask, rmask, final_step, final_range, centers,
        limes_deg, False, False,
    )
    return jnp.concatenate([best.astype(jnp.float64), tie.astype(jnp.float64)])


@partial(
    jax.jit,
    static_argnames=("step_deg", "range_deg", "bruteforce", "fast", "prune"),
)
def _chain_pairs_sets64_impl(
    sets64, pair_pos, step_deg, range_deg, bruteforce, fast, prune
):
    """f64 re-sweep of SELECTED chain pairs from a staged, ALREADY-COMPOSED
    [F, S, 2] f64 sample-set buffer (the sorted-prefetch path's twin of
    :func:`_chain_pairs_staged64_impl`) — only int32 indices travel."""
    test = jnp.take(sets64, pair_pos + 1, axis=0)
    ref = jnp.take(sets64, pair_pos, axis=0)
    dummy = jnp.ones(test.shape[:2], dtype=bool)
    best, tie, _te, _tf, _c = _multires_rotation_search_impl(
        test, ref, dummy, dummy, step_deg, range_deg, bruteforce, False,
        dense=True, fast=fast, prune=prune,
    )
    return jnp.concatenate([best.astype(jnp.float64), tie.astype(jnp.float64)])


@partial(
    jax.jit,
    static_argnames=("final_step", "final_range", "limes_deg"),
)
def _chain_pairs_sets64_final_impl(
    sets64, pair_pos, centers, final_step, final_range, limes_deg
):
    """Final-window-only twin of :func:`_chain_pairs_sets64_impl`."""
    test = jnp.take(sets64, pair_pos + 1, axis=0)
    ref = jnp.take(sets64, pair_pos, axis=0)
    dummy = jnp.ones(test.shape[:2], dtype=bool)
    best, tie = search_range_batched(
        test, ref, dummy, dummy, final_step, final_range,
        centers.astype(jnp.float64), limes_deg, False, True,
    )
    return jnp.concatenate([best.astype(jnp.float64), tie.astype(jnp.float64)])


def chain_pairs_sets64(
    sets64, pair_pos, step_deg, range_deg, bruteforce,
    centers=None, final_only: bool = False,
):
    """Dispatch wrapper over the staged-sets repair sweeps (padding like
    :func:`chain_pairs_staged64`)."""
    T = len(pair_pos)
    t_pad = max(8, 1 << (T - 1).bit_length())
    pos = np.zeros(t_pad, dtype=np.int32)
    pos[:T] = np.asarray(pair_pos, dtype=np.int32)
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True
    if final_only and not bruteforce:
        fs, fr, _ = ladder_stages(float(step_deg), float(range_deg))[-1]
        cen = np.zeros(t_pad, dtype=np.float64)
        cen[:T] = np.asarray(centers, dtype=np.float64)
        flat = _chain_pairs_sets64_final_impl(
            sets64, jnp.asarray(pos), jnp.asarray(cen),
            float(fs), float(fr), float(range_deg),
        )
    else:
        flat = _chain_pairs_sets64_impl(
            sets64, jnp.asarray(pos), float(step_deg), float(range_deg),
            bool(bruteforce), _fast_ladder(), _prune_enabled(),
        )
    flat = np.asarray(flat, dtype=np.float64)
    return flat[:t_pad][:T], flat[t_pad:][:T] > 0.5


def chain_pairs_staged64(
    staged64: dict, pair_pos, step_deg, range_deg, bruteforce,
    centers=None, final_only: bool = False,
):
    """Dispatch wrapper for the staged-f64 repair sweeps; ``pair_pos`` is
    padded to a power-of-two bucket (dup slot 0) to bound recompiles."""
    T = len(pair_pos)
    t_pad = max(8, 1 << (T - 1).bit_length())
    pos = np.zeros(t_pad, dtype=np.int32)
    pos[:T] = np.asarray(pair_pos, dtype=np.int32)
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True
    cx, cy = staged64["center"]
    if final_only and not bruteforce:
        fs, fr, _ = ladder_stages(float(step_deg), float(range_deg))[-1]
        cen = np.zeros(t_pad, dtype=np.float64)
        cen[:T] = np.asarray(centers, dtype=np.float64)
        flat = _chain_pairs_staged64_final_impl(
            staged64["dev64"],
            jnp.asarray(np.asarray(staged64["perm"], dtype=np.int32)),
            jnp.asarray(pos),
            jnp.asarray(cen),
            float(fs), float(fr), float(range_deg),
            int(staged64["n_cat"]), float(cx), float(cy),
            float(staged64["radius"]),
        )
    else:
        flat = _chain_pairs_staged64_impl(
            staged64["dev64"],
            jnp.asarray(np.asarray(staged64["perm"], dtype=np.int32)),
            jnp.asarray(pos),
            float(step_deg), float(range_deg), bool(bruteforce),
            int(staged64["n_cat"]), float(cx), float(cy),
            float(staged64["radius"]), _fast_ladder(), _prune_enabled(),
        )
    flat = np.asarray(flat, dtype=np.float64)
    return flat[:t_pad][:T], flat[t_pad:][:T] > 0.5


def chain_rotation_search_staged(
    dev_xy, perm, step_deg, range_deg, bruteforce, n_cat, image_center,
    radius, use_pallas=None,
):
    """Relative rotations from a device-staged lumen stack.

    ``dev_xy``: [F, P, 2] device array uploaded ahead of time (see
    _converters.numpy_to_inputdata); ``perm``: host int permutation into
    aligned frame order.  Same result as :func:`chain_rotation_search` on
    the equivalently built host sample sets, modulo dtype-of-centering ulps
    (the staged path centers in compute dtype on device)."""
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not bruteforce and plan_is_bruteforce(float(step_deg), float(range_deg)):
        bruteforce = True
    return _chain_rotation_search_staged_impl(
        dev_xy,
        jnp.asarray(np.asarray(perm, dtype=np.int32)),
        float(step_deg),
        float(range_deg),
        bool(bruteforce),
        int(n_cat),
        float(image_center[0]),
        float(image_center[1]),
        float(radius),
        bool(use_pallas),
        _fast_ladder(),
        _prune_enabled(),
    )
