"""Inter-pullback alignment: register geometry B onto geometry A.

Parity: ``src/intravascular/processing/align_between.rs`` of the reference.

TPU mapping: the global point clouds (>=500 sampled lumen points per
geometry) feed the same batched rotation-search kernel as align_within with
a single frame slot and the reference cloud's global centroid as pivot.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..models.contour import downsample_contour_points
from ..models.geometry import PyGeometry, PyGeometryPair
from ..ops.rotation_search import (
    _fast_ladder,
    _multires_rotation_search_impl,
    _prune_enabled,
    multires_rotation_search,
    multires_rotation_search_packed,
    plan_is_bruteforce,
)
from ..utils.device import to_device
from ..utils.trace import trace


def extract_geometry_points(geometry: PyGeometry, sample_size: int) -> np.ndarray:
    """Proportionally downsampled lumen points over all frames, (n, 2) xy.
    Parity: extract_geometry_points_with_frame_info (align_between.rs:154-178).
    """
    from ..models.contour import downsample_indices

    total_points = sum(f.lumen.n_points for f in geometry.frames)
    sample_ratio = sample_size / total_points
    rows = []
    for frame in geometry.frames:
        n = frame.lumen.n_points
        frame_n = max(int(np.ceil(n * sample_ratio)), 1)
        rows.append(frame.lumen.xyz_view()[downsample_indices(n, frame_n), :2])
    return np.concatenate(rows, axis=0)


def find_best_rotation_between(
    reference_xy: np.ndarray,
    target_xy: np.ndarray,
    step_deg: float,
    range_deg: float,
    bruteforce: bool = False,
) -> float:
    """Global rotation of the target cloud about the reference cloud's
    centroid minimising the Hausdorff distance (multi-resolution ladder).
    Parity: align_between.rs:180-258."""
    pivot = reference_xy.mean(axis=0)
    dtype = config.compute_dtype
    test = jnp.asarray((target_xy - pivot)[None, :, :], dtype=dtype)
    ref = jnp.asarray((reference_xy - pivot)[None, :, :], dtype=dtype)
    tmask = jnp.ones(test.shape[:2], dtype=bool)
    rmask = jnp.ones(ref.shape[:2], dtype=bool)
    best, tie = multires_rotation_search(
        test, ref, tmask, rmask, float(step_deg), float(range_deg), bool(bruteforce)
    )
    from ..ops.argmin_repair import repair_between

    rot = repair_between(
        np.asarray(best, dtype=np.float64),
        np.asarray(tie),
        [(reference_xy, target_xy)],
        float(step_deg), float(range_deg), bool(bruteforce),
    )
    return float(rot[0])


def rotate_geometry_around_point(
    geometry: PyGeometry, angle_rad: float, center: Tuple[float, float, float]
) -> None:
    """Rotate the whole geometry (points, centroids, reference points) about
    a single pivot.  Parity: align_between.rs:95-145."""
    c = np.cos(angle_rad)
    s = np.sin(angle_rad)
    cx, cy = center[0], center[1]

    def rot(x, y):
        tx, ty = x - cx, y - cy
        return tx * c - ty * s + cx, tx * s + ty * c + cy

    from ..models.geometry import shared_contour_blocks

    blocks = shared_contour_blocks(geometry.frames)
    if blocks is not None:
        # block fast path: identical per-element expressions, one pass per
        # shared [F, N, 3] view block instead of per-contour numpy calls
        for base, rows, _contours in blocks:
            sub = base[rows]
            tx = sub[:, :, 0] - cx
            ty = sub[:, :, 1] - cy
            sub[:, :, 0] = tx * c - ty * s + cx
            sub[:, :, 1] = tx * s + ty * c + cy
            base[rows] = sub
        for frame in geometry.frames:
            for contour in frame.extras.values():
                if contour.centroid is not None:
                    ccx, ccy = rot(contour.centroid[0], contour.centroid[1])
                    contour.centroid = (ccx, ccy, contour.centroid[2])
            fx, fy = rot(frame.centroid[0], frame.centroid[1])
            frame.centroid = (fx, fy, frame.centroid[2])
            if frame.reference_point is not None:
                rx, ry = rot(frame.reference_point.x, frame.reference_point.y)
                frame.reference_point.x = rx
                frame.reference_point.y = ry
        return

    for frame in geometry.frames:
        for contour in [frame.lumen, *frame.extras.values()]:
            xyz = contour.xyz()
            tx = xyz[:, 0] - cx
            ty = xyz[:, 1] - cy
            xyz[:, 0] = tx * c - ty * s + cx
            xyz[:, 1] = tx * s + ty * c + cy
            contour.set_xyz(xyz)
            if contour is not frame.lumen and contour.centroid is not None:
                ccx, ccy = rot(contour.centroid[0], contour.centroid[1])
                contour.centroid = (ccx, ccy, contour.centroid[2])
        fx, fy = rot(frame.centroid[0], frame.centroid[1])
        frame.centroid = (fx, fy, frame.centroid[2])
        if frame.reference_point is not None:
            rx, ry = rot(frame.reference_point.x, frame.reference_point.y)
            frame.reference_point.x = rx
            frame.reference_point.y = ry


def dispatch_between_search(
    clouds: List[Tuple[np.ndarray, np.ndarray]],
    step_deg: float,
    range_deg: float,
    bruteforce: bool = False,
):
    """Enqueue the batched between-geometry rotation search and its d2h
    pull; returns the device handle (``np.asarray`` it to block).  Each
    (reference_xy, target_xy) cloud pair becomes one slot of a
    padded+masked batch through a single device search — the TPU analog of
    the reference's concurrent align-between threads (entry.rs:206-277)."""
    dtype = config.compute_dtype
    F = len(clouds)
    M = max(r.shape[0] for r, _ in clouds)
    N = max(t.shape[0] for _, t in clouds)
    ref = np.zeros((F, M, 2))
    test = np.zeros((F, N, 2))
    rmask = np.zeros((F, M), dtype=bool)
    tmask = np.zeros((F, N), dtype=bool)
    for k, (reference_xy, target_xy) in enumerate(clouds):
        pivot = reference_xy.mean(axis=0)
        m, n = reference_xy.shape[0], target_xy.shape[0]
        ref[k, :m] = reference_xy - pivot
        test[k, :n] = target_xy - pivot
        rmask[k, :m] = True
        tmask[k, :n] = True
    best = multires_rotation_search_packed(
        to_device(test, dtype),
        to_device(ref, dtype),
        to_device(tmask),
        to_device(rmask),
        float(step_deg),
        float(range_deg),
        bool(bruteforce),
    )
    try:
        best.copy_to_host_async()
    except Exception:
        pass
    return best


def fused_between_core(
    ref1,
    test1,
    rmask1,
    tmask1,
    pivots_xy,
    t0_xy,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    dtype,
    fast: bool = True,
    prune: bool = True,
):
    """Both between-alignment stages of the full pipeline in ONE device
    program — the chained equivalent of two sequential
    :func:`dispatch_between_search` round-trips (entry.rs:206-277).
    Jit-composable body shared by :func:`_fused_full_between_impl` and the
    one-round-trip orchestration (:mod:`.fused_chain`).

    ``ref1``/``test1``: f64 ``[2, P, 2]`` raw (uncentered) stage-1 clouds —
    slot 0 = (a, b+t0_ab), slot 1 = (c, d+t0_cd) — padded to a common
    width with ``rmask1``/``tmask1`` validity masks.  ``pivots_xy``
    ``[2, 2]`` holds the epilogue rotation pivots (a's and c's reference
    centroids); ``t0_xy`` ``[2]`` is the stage-2 initial translation
    (ca − cc, identical for both stage-2 slots because stage 1 leaves each
    target's reference centroid exactly on its reference's).

    Stage-2 clouds are composed on device in f64 with the exact host
    epilogue arithmetic (``tx*c − ty*s + cx``, align_between.rs:95-145),
    then cast to the compute dtype — so the search sees the same f32 bits
    the host-built clouds would produce, and the returned grid angles match
    the sequential orchestration except on exact cost ties.
    Returns ``([r_ab, r_cd, r_ac, r_bd], tie_flags [4])`` — flagged slots
    are re-decided exactly on the host (ops.argmin_repair).
    """
    f64 = ref1.dtype

    def masked_mean(x, m):
        w = m[..., None].astype(f64)
        return (x * w).sum(axis=1, keepdims=True) / (
            m.sum(axis=1).astype(f64)[:, None, None]
        )

    def centered(x, piv, m):
        return ((x - piv) * m[..., None].astype(f64)).astype(dtype)

    p1 = masked_mean(ref1, rmask1)
    r1, tie1, _te1, _tf1, _c1 = _multires_rotation_search_impl(
        centered(test1, p1, tmask1),
        centered(ref1, p1, rmask1),
        tmask1,
        rmask1,
        step_deg,
        range_deg,
        bruteforce,
        False,
        fast=fast,
        prune=prune,
    )

    # stage-1 epilogue applied to the target clouds: rotate (b+t0_ab) about
    # ca and (d+t0_cd) about cc by the stage-1 winners, in f64
    ang = r1.astype(f64)
    c = jnp.cos(ang)[:, None]
    s = jnp.sin(ang)[:, None]
    piv = pivots_xy[:, None, :]
    tx = test1[..., 0] - piv[..., 0]
    ty = test1[..., 1] - piv[..., 1]
    rotated = jnp.stack(
        [tx * c - ty * s + piv[..., 0], tx * s + ty * c + piv[..., 1]],
        axis=-1,
    )  # slot 0 = b2, slot 1 = d2

    # stage-2 slots: (ref=a, tgt=c+t0) and (ref=b2, tgt=d2+t0)
    ref2 = jnp.stack([ref1[0], rotated[0]])
    rmask2 = jnp.stack([rmask1[0], tmask1[0]])
    test2 = jnp.stack([ref1[1] + t0_xy, rotated[1] + t0_xy])
    tmask2 = jnp.stack([rmask1[1], tmask1[1]])
    p2 = masked_mean(ref2, rmask2)
    r2, tie2, _te2, _tf2, _c2 = _multires_rotation_search_impl(
        centered(test2, p2, tmask2),
        centered(ref2, p2, rmask2),
        tmask2,
        rmask2,
        step_deg,
        range_deg,
        bruteforce,
        False,
        fast=fast,
        prune=prune,
    )
    return (
        jnp.concatenate([r1, r2]),
        jnp.concatenate([tie1, tie2]),
    )


@partial(
    jax.jit,
    static_argnames=(
        "step_deg", "range_deg", "bruteforce", "dtype_name", "fast", "prune",
    ),
)
def _fused_full_between_impl(
    ref1,
    test1,
    rmask1,
    tmask1,
    pivots_xy,
    t0_xy,
    step_deg: float,
    range_deg: float,
    bruteforce: bool,
    dtype_name: str,
    fast: bool = True,
    prune: bool = True,
):
    """Jit entry around :func:`fused_between_core` (host-built clouds).
    Output: packed ``[8]`` f64 — winners then 0/1 tie flags (one pull)."""
    winners, ties = fused_between_core(
        ref1, test1, rmask1, tmask1, pivots_xy, t0_xy, step_deg, range_deg,
        bruteforce, jnp.dtype(dtype_name), fast=fast, prune=prune,
    )
    return jnp.concatenate(
        [winners.astype(jnp.float64), ties.astype(jnp.float64)]
    )


def dispatch_fused_between(
    clouds: List[Tuple[np.ndarray, np.ndarray]],
    ca,
    cc,
    step_deg: float,
    range_deg: float,
):
    """Enqueue the fused two-stage between search of the full pipeline.

    ``clouds`` = [(cloud_a, cloud_b + t0_ab), (cloud_c, cloud_d + t0_cd)]
    raw xy clouds; ``ca``/``cc`` the (x, y, z) reference centroids of a and
    c.  Returns the device handle of the packed ``[8]`` vector
    ``[r_ab, r_cd, r_ac, r_bd, tie_ab, tie_cd, tie_ac, tie_bd]``.
    """
    P = max(arr.shape[0] for pair in clouds for arr in pair)
    ref = np.zeros((2, P, 2))
    test = np.zeros((2, P, 2))
    rmask = np.zeros((2, P), dtype=bool)
    tmask = np.zeros((2, P), dtype=bool)
    for k, (reference_xy, target_xy) in enumerate(clouds):
        m, n = reference_xy.shape[0], target_xy.shape[0]
        ref[k, :m] = reference_xy
        test[k, :n] = target_xy
        rmask[k, :m] = True
        tmask[k, :n] = True
    pivots = np.array([[ca[0], ca[1]], [cc[0], cc[1]]])
    t0 = np.array([ca[0] - cc[0], ca[1] - cc[1]])
    step = float(step_deg)
    rng = float(range_deg)
    best = _fused_full_between_impl(
        ref, test, rmask, tmask, pivots, t0, step, rng,
        bool(plan_is_bruteforce(step, rng)),
        jnp.dtype(config.compute_dtype).name,
        fast=_fast_ladder(), prune=_prune_enabled(),
    )
    try:
        best.copy_to_host_async()
    except Exception:
        pass
    return best


def find_best_rotations_between_batch(
    clouds: List[Tuple[np.ndarray, np.ndarray]],
    step_deg: float,
    range_deg: float,
    bruteforce: bool = False,
) -> np.ndarray:
    """Blocking form of :func:`dispatch_between_search` (with exact repair
    of certification-flagged slots)."""
    from ..ops.argmin_repair import repair_between, split_packed

    flat = np.asarray(
        dispatch_between_search(clouds, step_deg, range_deg, bruteforce),
        dtype=np.float64,
    )
    rotations, ties = split_packed(flat)
    return repair_between(
        rotations, ties, clouds, float(step_deg), float(range_deg),
        bool(bruteforce),
    )


@trace("align_between.batch")
def align_between_geometries_batch(
    pairs: List[Tuple[PyGeometry, PyGeometry]],
    rot_deg: float,
    step_rot_deg: float,
    sample_size: int,
    verbose: bool = True,
) -> List[PyGeometryPair]:
    """Align several independent (A, B) pairs with one batched rotation
    search.  Each pair follows align_between.rs:11-92 semantics exactly;
    only the searches are fused."""
    preps = []
    for geom_a, geom_b in pairs:
        ref_a_centroid = geom_a.frames[geom_a.ref_or_proximal_idx()].centroid
        ref_b_centroid = geom_b.frames[geom_b.ref_or_proximal_idx()].centroid
        initial_translation = tuple(
            ref_a_centroid[k] - ref_b_centroid[k] for k in range(3)
        )
        geom_b.translate_geometry(initial_translation)
        test_a = extract_geometry_points(geom_a, max(sample_size, 500))
        test_b = extract_geometry_points(geom_b, max(sample_size, 500))
        preps.append((ref_a_centroid, initial_translation, test_a, test_b))

    rotations = find_best_rotations_between_batch(
        [(ta, tb) for _, _, ta, tb in preps], step_rot_deg, rot_deg
    )

    out = []
    for (geom_a, geom_b), (ref_a_centroid, initial_translation, _, _), rot in zip(
        pairs, preps, rotations
    ):
        out.append(
            _finish_between(
                geom_a, geom_b, float(rot), ref_a_centroid, initial_translation,
                rot_deg, step_rot_deg, verbose,
            )
        )
    return out


def align_between_geometries(
    geom_a: PyGeometry,
    geom_b: PyGeometry,
    rot_deg: float,
    step_rot_deg: float,
    sample_size: int,
    verbose: bool = True,
) -> PyGeometryPair:
    """Translate B's reference frame onto A's, find the best global rotation,
    apply it about A's reference centroid, then re-translate exactly.
    Parity: align_between.rs:11-92.  Mutates geom_b in place like the
    reference; the returned pair holds copies."""
    return align_between_geometries_batch(
        [(geom_a, geom_b)], rot_deg, step_rot_deg, sample_size, verbose
    )[0]


def stack_sample_width(F: int, N: int, sample_size: int) -> int:
    """Per-frame downsample width of the between cloud for an [F, N] lumen
    stack — the exact expression :func:`extract_geometry_points` evaluates
    per frame, shared so the device chain (fused_chain) cannot drift."""
    ratio = sample_size / (F * N)
    return max(int(np.ceil(N * ratio)), 1)


def extract_stack_points(lumen: np.ndarray, sample_size: int) -> np.ndarray:
    """:func:`extract_geometry_points` computed straight off a rectangular
    [F, N, 3] lumen stack (one gather instead of a per-frame loop) —
    bit-identical on uniform-width geometries, which is the only shape a
    TensorGeometry can hold."""
    from ..models.contour import downsample_indices

    F, N = lumen.shape[:2]
    idx = downsample_indices(N, stack_sample_width(F, N, sample_size))
    return lumen[:, idx, :2].reshape(-1, 2)


def _fused_between_epilogue_blocks(
    geom_a: PyGeometry,
    geom_b: PyGeometry,
    blocks,
    best_rotation: float,
    ref_a_centroid,
    initial_translation,
):
    """One-pass form of translate(t0) -> rotate about A's ref centroid ->
    exact re-translate over B's shared coordinate blocks.

    Bitwise-identical to the three sequential passes: each element runs the
    same f64 operation chain in the same order (add t0, the rotate
    expression of :func:`rotate_geometry_around_point`, add the final
    translation), the contour centroids are the means of exactly those
    final values (the sequential path's intermediate means are dead — the
    final translate recomputes them), and the final translation itself
    comes from B's reference frame centroid through the identical scalar
    steps.  Returns the final translation for narration."""
    c = np.cos(best_rotation)
    s = np.sin(best_rotation)
    cax, cay = ref_a_centroid[0], ref_a_centroid[1]
    t0x, t0y, t0z = initial_translation

    def scalar_chain(px, py, pz):
        # the exact translate -> rotate -> (pre-ft) scalar sequence
        x1, y1, z1 = px + t0x, py + t0y, pz + t0z
        tx, ty = x1 - cax, y1 - cay
        return tx * c - ty * s + cax, tx * s + ty * c + cay, z1

    ref_idx_a = geom_a.ref_or_proximal_idx()
    ref_idx_b = geom_b.ref_or_proximal_idx()
    final_a = geom_a.frames[ref_idx_a].centroid
    cb = geom_b.frames[ref_idx_b].centroid
    bx, by, bz = scalar_chain(cb[0], cb[1], cb[2])
    ftx, fty, ftz = final_a[0] - bx, final_a[1] - by, final_a[2] - bz

    for base, rows, contours in blocks:
        if base.shape[1] == 0:  # compute_centroid's empty case
            for cont in contours:
                cont.centroid = (0.0, 0.0, 0.0)
            continue
        sub = base[rows]
        x1 = sub[:, :, 0] + t0x
        y1 = sub[:, :, 1] + t0y
        z1 = sub[:, :, 2] + t0z
        tx = x1 - cax
        ty = y1 - cay
        sub[:, :, 0] = (tx * c - ty * s + cax) + ftx
        sub[:, :, 1] = (tx * s + ty * c + cay) + fty
        sub[:, :, 2] = z1 + ftz
        base[rows] = sub
        means = sub.mean(axis=1).tolist()
        for m, cont in zip(means, contours):
            cont.centroid = (m[0], m[1], m[2])
    for frame in geom_b.frames:
        fx, fy, fz = scalar_chain(*frame.centroid)
        frame.centroid = (fx + ftx, fy + fty, fz + ftz)
        rp = frame.reference_point
        if rp is not None:
            rx, ry, rz = scalar_chain(rp.x, rp.y, rp.z)
            rp.x, rp.y, rp.z = rx + ftx, ry + fty, rz + ftz
    return (ftx, fty, ftz)


def apply_between_epilogue(
    geom_a: PyGeometry,
    geom_b: PyGeometry,
    best_rotation: float,
    ref_a_centroid,
    initial_translation,
    rot_deg: float,
    step_rot_deg: float,
    verbose: bool,
    pre_translated: bool = True,
) -> None:
    """Mutating tail of the between-alignment: rotate B about A's reference
    centroid, re-translate exactly, narrate.  ``pre_translated=False`` means
    the initial translation was applied only to B's search cloud so far and
    is applied to the geometry here first — the deferred orchestration in
    ``entry.full_processing`` uses that to keep the geometry work inside
    the search round-trip."""
    from ..models.geometry import shared_contour_blocks

    final_translation = None
    if not pre_translated:
        blocks = shared_contour_blocks(geom_b.frames)
        if blocks is not None:
            final_translation = _fused_between_epilogue_blocks(
                geom_a, geom_b, blocks, best_rotation, ref_a_centroid,
                initial_translation,
            )
        else:
            geom_b.translate_geometry(initial_translation)
    if final_translation is None:
        rotate_geometry_around_point(geom_b, best_rotation, ref_a_centroid)

        ref_idx_a = geom_a.ref_or_proximal_idx()
        ref_idx_b = geom_b.ref_or_proximal_idx()
        final_a = geom_a.frames[ref_idx_a].centroid
        final_b = geom_b.frames[ref_idx_b].centroid
        final_translation = tuple(final_a[k] - final_b[k] for k in range(3))
        geom_b.translate_geometry(final_translation)

    if verbose:
        print(f"\n✅ Aligned geometry '{geom_b.label}' to '{geom_a.label}'")
        print("-----------------------------------------")
        print(
            f"Applied initial translation: ({initial_translation[0]:.2f}, "
            f"{initial_translation[1]:.2f}, {initial_translation[2]:.2f}) mm"
        )
        print(
            f"Found best rotation of {np.degrees(best_rotation):.2f}° with "
            f"parameters: \nrange: {rot_deg:.2f}° \nstep size: {step_rot_deg:.2f}°"
        )
        print(
            f"Applied final translation: ({final_translation[0]:.2f}, "
            f"{final_translation[1]:.2f}, {final_translation[2]:.2f}) mm"
        )
        print("-----------------------------------------")


def build_pair(geom_a: PyGeometry, geom_b: PyGeometry) -> PyGeometryPair:
    """Pair with exclusive copies; parity with GeometryPair::new
    (geometry_pair.rs:12-19)."""
    return PyGeometryPair(
        geom_a.copy(), geom_b.copy(), f"{geom_a.label} - {geom_b.label}"
    )


def _finish_between(
    geom_a: PyGeometry,
    geom_b: PyGeometry,
    best_rotation: float,
    ref_a_centroid,
    initial_translation,
    rot_deg: float,
    step_rot_deg: float,
    verbose: bool,
) -> PyGeometryPair:
    apply_between_epilogue(
        geom_a, geom_b, best_rotation, ref_a_centroid, initial_translation,
        rot_deg, step_rot_deg, verbose,
    )
    return build_pair(geom_a, geom_b)
