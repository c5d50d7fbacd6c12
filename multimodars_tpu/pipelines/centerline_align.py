"""Centerline registration: map an aligned pullback onto a CCTA-derived
centerline.

Parity: ``src/intravascular/centerline_align/{preprocessing,
align_algorithms, align}.rs`` of the reference.

TPU mapping:
- the three-point rotation search evaluates all ~360/step candidate angles
  as one vectorised batch (3 tracked landmarks per candidate);
- the combined Hausdorff refinement evaluates the full angle grid per
  centerline-shift candidate as a batched masked-Hausdorff sweep, emulating
  the reference's per-candidate CCW re-sort with a cyclic roll gather;
- the final application and wall parallel-transport are exact host-side
  object transforms.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..config import config
from ..models.centerline import PyCenterline, PyCenterlinePoint, clpoints_from_lists
from ..models.contour import PyContour, downsample_indices
from ..models.geometry import PyGeometry, PyGeometryPair
from ..models.point import PyContourPoint
from ..ops.hausdorff import hausdorff_sq_masked

AlignTarget = Union[PyGeometry, PyGeometryPair]


def primary_geometry(target: AlignTarget) -> PyGeometry:
    return target.geom_a if isinstance(target, PyGeometryPair) else target


def _geometries_of(target: AlignTarget) -> List[PyGeometry]:
    if isinstance(target, PyGeometryPair):
        return [target.geom_a, target.geom_b]
    return [target]


def rotate_all(target: AlignTarget, angle_rad: float) -> AlignTarget:
    for geom in _geometries_of(target):
        geom.rotate_geometry(angle_rad)
    return target


# ---------------------------------------------------------------------------
# centerline preprocessing
# ---------------------------------------------------------------------------

def preprocess_centerline(centerline: PyCenterline, ref_mesh: PyGeometry) -> PyCenterline:
    """Strip side branches, ensure descending z, resample at the geometry's
    mean frame-centroid spacing.  Parity: preprocessing.rs:12-102."""
    # reference-only views: the resample constructs entirely new points, so
    # the filtered/reversed intermediate never needs to copy (its only other
    # consumer, the no-spacing fallback, copies at return)
    pts = [p for p in centerline.points if p.branch_id == 0]
    if not pts:
        raise ValueError("Centerline has no branch-0 points")
    if pts and pts[0].contour_point.z < pts[-1].contour_point.z:
        pts = list(reversed(pts))
    cl = PyCenterline(pts, [0])
    return _resample_centerline_by_contours(cl, ref_mesh)


def _resample_centerline_by_contours(
    centerline: PyCenterline, ref_mesh: PyGeometry
) -> PyCenterline:
    if not centerline.points:
        raise ValueError("Centerline is empty")
    if not ref_mesh.frames:
        raise ValueError("Reference mesh has no frames")

    centroids = np.array([f.centroid for f in ref_mesh.frames])
    centroid_dists = np.sqrt(((centroids[1:] - centroids[:-1]) ** 2).sum(-1))
    mean_spacing = (
        float(centroid_dists.mean())
        if centroid_dists.size and np.isfinite(centroid_dists.mean()) and centroid_dists.mean() > 1e-12
        else None
    )

    pos = centerline.positions()
    seg = np.sqrt(((pos[1:] - pos[:-1]) ** 2).sum(-1))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total_length = float(cum[-1])
    n_segments = len(centerline.points) - 1

    spacing = mean_spacing
    if spacing is None and n_segments >= 1:
        fallback = total_length / n_segments
        spacing = fallback if np.isfinite(fallback) and fallback > 1e-12 else None
    if spacing is None:
        return centerline.copy()

    # sample positions: 0, spacing, ... <= total (+eps); clamp last overshoot
    s_new: List[float] = []
    s = 0.0
    while s <= total_length + 1e-9:
        s_new.append(s)
        s += spacing
    if s_new and s_new[-1] > total_length + 1e-6:
        s_new[-1] = total_length

    tangents = centerline.tangents()
    radii = centerline.radii()

    # vectorised per-sample interpolation (same scalar expression tree per
    # element as the original loop, so values are bit-identical); samples
    # landing at/after the final arc position copy the last point verbatim
    n_p = len(centerline.points)
    s_arr = np.asarray(s_new, dtype=np.float64)
    idx = np.searchsorted(cum, s_arr, side="right") - 1
    idx = np.maximum(idx, 0)
    tail = idx >= n_p - 1
    idx_c = np.minimum(idx, n_p - 2)
    s0 = cum[idx_c]
    denom = cum[idx_c + 1] - s0
    small = np.abs(denom) < 1e-12
    t = np.where(small, 0.0, (s_arr - s0) / np.where(small, 1.0, denom))
    tc = t[:, None]
    p = pos[idx_c] + tc * (pos[idx_c + 1] - pos[idx_c])
    tang = tangents[idx_c] * (1.0 - tc) + tangents[idx_c + 1] * tc
    # per-row np.linalg.norm, NOT a vectorised (t*t).sum: the BLAS dot the
    # scalar loop used rounds differently in the last ulp ~11% of the time,
    # and these tangents seed rotation matrices whose cost ties the
    # bit-parity tests pin; the sample axis is tiny (~frame count)
    tn = np.array([float(np.linalg.norm(v)) for v in tang])
    ok = tn > 1e-12
    tang = np.where(ok[:, None], tang / np.where(ok, tn, 1.0)[:, None], 0.0)
    rad = np.where(
        tail, radii[-1], radii[idx_c] * (1.0 - t) + radii[idx_c + 1] * t
    )
    if tail.any():
        src = centerline.points[-1]
        p[tail] = pos[-1]
        tang[tail] = np.asarray(src.tangent, dtype=np.float64)

    new_points = clpoints_from_lists(
        p.tolist(), tang.tolist(), rad.tolist(), 0, 0
    )
    return PyCenterline(new_points, [0] if new_points else [])


# ---------------------------------------------------------------------------
# per-frame rigid transforms
# ---------------------------------------------------------------------------

def newell_normal(xyz: np.ndarray, centroid) -> np.ndarray:
    """Newell polygon normal about the centroid.  Parity:
    align_algorithms.rs:206-235."""
    if xyz.shape[0] < 3:
        return np.array([0.0, 0.0, 1.0])
    c = np.asarray(centroid, dtype=np.float64)
    rel = xyz - c
    nxt = np.roll(rel, -1, axis=0)
    normal = np.cross(rel, nxt).sum(axis=0)
    norm = float(np.linalg.norm(normal))
    if norm > 1e-12:
        return normal / norm
    return np.array([0.0, 0.0, 1.0])


def rotation_matrix_axis_angle(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation matrix for a (normalised) axis."""
    axis = np.asarray(axis, dtype=np.float64)
    n = float(np.linalg.norm(axis))
    if n < 1e-300:
        return np.eye(3)
    x, y, z = axis / n
    c, s = math.cos(angle), math.sin(angle)
    C = 1.0 - c
    return np.array(
        [
            [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, c + z * z * C],
        ]
    )


@dataclass
class FrameTransformation:
    """translation -> rotate about pivot.  Parity: align_algorithms.rs:65-94."""

    frame_index: int
    translation: np.ndarray  # (3,)
    rotation: np.ndarray  # (3, 3)
    pivot: np.ndarray  # (3,)

    def apply_to_xyz(self, xyz: np.ndarray) -> np.ndarray:
        translated = xyz + self.translation
        return (translated - self.pivot) @ self.rotation.T + self.pivot

    def as_affine(self) -> Tuple[np.ndarray, np.ndarray]:
        """(A, b) with T(x) = A x + b."""
        A = self.rotation
        b = self.rotation @ (self.translation - self.pivot) + self.pivot
        return A, b


def align_frame(contour: PyContour, cl_point: PyCenterlinePoint) -> FrameTransformation:
    """Translate centroid onto the centerline point; rotate the Newell normal
    onto the tangent about their cross axis, pivoting at the centerline
    point.  Parity: align_algorithms.rs:128-173."""
    xyz = contour.xyz()
    if contour.centroid is not None:
        centroid = np.asarray(contour.centroid, dtype=np.float64)
    else:
        centroid = xyz.mean(axis=0)
    cl = np.array(
        [cl_point.contour_point.x, cl_point.contour_point.y, cl_point.contour_point.z]
    )
    translation = cl - centroid

    current_normal = newell_normal(xyz, centroid)
    desired_normal = np.asarray(cl_point.tangent, dtype=np.float64)
    dn_norm = float(np.linalg.norm(desired_normal))
    rotation = np.eye(3)
    if dn_norm > 1e-12:
        cosang = float(
            np.clip(np.dot(current_normal, desired_normal) / dn_norm, -1.0, 1.0)
        )
        angle = math.acos(cosang)
        if abs(angle) >= 1e-6:
            axis = np.cross(current_normal, desired_normal)
            if float(np.linalg.norm(axis)) >= 1e-6:
                rotation = rotation_matrix_axis_angle(axis, angle)
    return FrameTransformation(contour.original_frame, translation, rotation, cl)


def get_transformations(
    geometry: PyGeometry, centerline: PyCenterline, ref_pt
) -> List[FrameTransformation]:
    """Frame i maps to centerline point ref_idx + i.
    Parity: align_algorithms.rs:96-126."""
    ref_idx_cl = centerline.find_reference_cl_point_idx(tuple(ref_pt))
    transformations = []
    for i, frame in enumerate(geometry.frames):
        cl_index = ref_idx_cl + i
        if 0 <= cl_index < len(centerline.points):
            transformations.append(align_frame(frame.lumen, centerline.points[cl_index]))
        else:
            print(f"Centerline index {cl_index} out of bounds for geometry frame {frame.id}")
    return transformations


def _apply_transform_to_contour(contour: PyContour, tr: FrameTransformation) -> None:
    contour.set_xyz(tr.apply_to_xyz(contour.xyz()))
    if contour.centroid is not None:
        c = tr.apply_to_xyz(np.asarray(contour.centroid)[None, :])[0]
        contour.centroid = (float(c[0]), float(c[1]), float(c[2]))


def _apply_transforms_to_geometry(
    geometry: PyGeometry, transformations: List[FrameTransformation]
) -> None:
    for i, frame in enumerate(geometry.frames):
        if i >= len(transformations):
            continue
        tr = transformations[i]
        _apply_transform_to_contour(frame.lumen, tr)
        for contour in frame.extras.values():
            _apply_transform_to_contour(contour, tr)
        if frame.reference_point is not None:
            p = tr.apply_to_xyz(
                np.array([[frame.reference_point.x, frame.reference_point.y, frame.reference_point.z]])
            )[0]
            frame.reference_point.x = float(p[0])
            frame.reference_point.y = float(p[1])
            frame.reference_point.z = float(p[2])
        frame.centroid = (
            frame.lumen.centroid if frame.lumen.centroid is not None else (0.0, 0.0, 0.0)
        )


def apply_transformations(
    target: AlignTarget, centerline: PyCenterline, ref_pt
) -> AlignTarget:
    transformations = get_transformations(primary_geometry(target), centerline, ref_pt)
    for geom in _geometries_of(target):
        _apply_transforms_to_geometry(geom, transformations)
    return target


# ---------------------------------------------------------------------------
# three-point rotation search (batched over the angle grid)
# ---------------------------------------------------------------------------

def best_rotation_three_point(
    contour: PyContour,
    reference_point: PyContourPoint,
    main_ref_pt,
    counterclockwise_ref_pt,
    clockwise_ref_pt,
    angle_step: float,
    centerline_point: PyCenterlinePoint,
    verbose: bool = True,
) -> float:
    """Scan 0..2pi: rotate the contour about its normal, map onto the
    centerline point, and minimise the sum of squared distances of three
    tracked landmarks to their targets.  All candidates evaluate as one
    vectorised batch.  Parity: align_algorithms.rs:263-336.

    The per-candidate pipeline commutes: rotating about the centroid/normal
    leaves the centroid and Newell normal invariant, so the centerline
    mapping transform is identical for every candidate and can be hoisted
    out of the scan."""
    xyz = contour.xyz()
    centroid = (
        np.asarray(contour.centroid, dtype=np.float64)
        if contour.centroid is not None
        else xyz.mean(axis=0)
    )
    normal = newell_normal(xyz, centroid)

    index_reference = reference_point.point_index
    n_points = len(contour.points)

    def tracked(index: int) -> np.ndarray:
        p = next(p for p in contour.points if p.point_index == index)
        return np.array([p.x, p.y, p.z])

    p_main = tracked(index_reference)
    p_ccw = tracked(0)  # highest-Y point: counterclockwise side
    p_cw = tracked(n_points // 2)  # diametrically opposite: clockwise side
    tracked_pts = np.stack([p_main, p_ccw, p_cw])  # (3, 3)
    targets = np.stack(
        [np.asarray(main_ref_pt), np.asarray(counterclockwise_ref_pt), np.asarray(clockwise_ref_pt)]
    )

    tr = align_frame(contour, centerline_point)
    A, b = tr.as_affine()

    n_angles = int(math.ceil(2.0 * math.pi / angle_step))
    angles = np.arange(n_angles) * angle_step
    angles = angles[angles < 2.0 * math.pi]

    # Rodrigues about `normal` for all angles at once
    axis = normal / max(float(np.linalg.norm(normal)), 1e-300)
    rel = tracked_pts - centroid  # (3 pts, 3)
    c = np.cos(angles)[:, None, None]
    s = np.sin(angles)[:, None, None]
    cross = np.cross(np.broadcast_to(axis, rel.shape), rel)  # (3 pts, 3)
    dot = (rel * axis).sum(-1)[None, :, None]
    rotated = (
        rel[None] * c + cross[None] * s + axis[None, None, :] * dot * (1.0 - c) + centroid
    )  # (K, 3 pts, 3)

    mapped = rotated @ A.T + b  # (K, 3, 3)
    err = ((mapped - targets[None]) ** 2).sum(-1).sum(-1)  # (K,)
    best_k = int(np.argmin(err))  # first-wins, like the strictly-less scan
    best_angle = float(angles[best_k])
    if verbose:
        print(
            "---------------------Centerline alignment: Finding optimal rotation---------------------"
        )
        print(f"✅ Best angle found: {math.degrees(best_angle):.2f}°")
    return best_angle


# ---------------------------------------------------------------------------
# combined Hausdorff refinement (batched over angle grid per index shift)
# ---------------------------------------------------------------------------

def _ccw_roll_indices(xyz: np.ndarray, centroid, angles: np.ndarray) -> np.ndarray:
    """For each candidate in-plane rotation angle, the cyclic roll that
    ``sort_contour_points`` would apply (highest-Y-after-rotation first,
    Rust max_by keeps the last of equal maxima).  Returns (K,) rolls."""
    cx, cy = centroid[0], centroid[1]
    relx = xyz[:, 0] - cx
    rely = xyz[:, 1] - cy
    # y' after rotating by theta about the centroid
    yp = relx[None, :] * np.sin(angles)[:, None] + rely[None, :] * np.cos(angles)[:, None]
    n = xyz.shape[0]
    return n - 1 - np.argmax(yp[:, ::-1], axis=1)


def refine_alignment_hausdorff(
    target: AlignTarget,
    centerline: PyCenterline,
    initial_cl_ref_idx: int,
    initial_rotation: float,
    mutated_points: np.ndarray,
    angle_search_range: float,
    angle_step: float,
    index_search_range: int,
    verbose: bool = True,
) -> Tuple[float, int]:
    """Grid over (centerline shift x angle): per candidate, re-map the whole
    geometry onto the shifted centerline segment and compute the 2-D
    Hausdorff distance against the bbox-filtered CCTA point cloud.
    Parity: align_algorithms.rs:339-451; each index candidate's full angle
    grid runs as one batched device sweep."""
    geometry = primary_geometry(target)
    len_frames = len(geometry.frames)

    best_angle = initial_rotation
    best_cl_ref_idx = initial_cl_ref_idx
    min_hausdorff = np.inf

    if verbose:
        print("---------------------Refining alignment with Hausdorff---------------------")
        print(
            f"Initial rotation: {math.degrees(initial_rotation):.2f}°, "
            f"Initial CL index: {initial_cl_ref_idx}"
        )

    # angle grid (identical to the reference's accumulating while loop)
    angles = []
    a = initial_rotation - angle_search_range
    while a <= initial_rotation + angle_search_range:
        angles.append(a)
        a += angle_step
    angles = np.array(angles)
    K = len(angles)

    cl_positions = centerline.positions()
    n_points_per_frame = len(geometry.frames[0].lumen.points)

    # static per-frame data
    frame_xyz = [f.lumen.xyz() for f in geometry.frames]
    frame_centroids = [
        np.asarray(f.lumen.centroid if f.lumen.centroid is not None else fx.mean(axis=0))
        for f, fx in zip(geometry.frames, frame_xyz)
    ]

    delta_range = (
        [0]
        if index_search_range == 0
        else list(range(-index_search_range, index_search_range + 1))
    )

    dtype = config.compute_dtype

    # first pass: build every shift's (candidate, filtered-cloud) pair on the
    # host; second pass: ONE padded+masked device sweep over all of them
    shift_entries = []

    for delta_idx in delta_range:
        signed = initial_cl_ref_idx + delta_idx
        if signed < 0:
            continue
        current_idx = signed
        if current_idx + len_frames >= len(centerline.points):
            continue
        cl_end_idx = current_idx + len_frames

        # bbox filter of the CCTA cloud between segment endpoints (margin 5)
        start_p = cl_positions[current_idx]
        end_p = cl_positions[cl_end_idx - 1]
        lo = np.minimum(start_p, end_p) - 5.0
        hi = np.maximum(start_p, end_p) + 5.0
        sel = ((mutated_points >= lo) & (mutated_points <= hi)).all(axis=1)
        filtered = mutated_points[sel]
        if filtered.shape[0] == 0:
            continue

        ratio = filtered.shape[0] / (n_points_per_frame * len_frames)
        n_downsample = int(math.ceil(ratio * n_points_per_frame))
        n_downsample = min(max(n_downsample, 1), n_points_per_frame)
        ds_idx = downsample_indices(n_points_per_frame, n_downsample)

        # per-frame candidate points for every angle: gather the CCW-roll
        # emulated downsample subset, rotate in-plane, apply the segment map
        per_frame_pts = []
        for i in range(len_frames):
            xyz = frame_xyz[i]
            centroid = frame_centroids[i]
            tr = align_frame(geometry.frames[i].lumen, centerline.points[current_idx + i])
            A, b = tr.as_affine()
            rolls = _ccw_roll_indices(xyz, centroid, angles)  # (K,)
            gather = (rolls[:, None] + ds_idx[None, :]) % xyz.shape[0]  # (K, n_ds)
            pts = xyz[gather]  # (K, n_ds, 3)
            relx = pts[..., 0] - centroid[0]
            rely = pts[..., 1] - centroid[1]
            ca = np.cos(angles)[:, None]
            sa = np.sin(angles)[:, None]
            rx = relx * ca - rely * sa + centroid[0]
            ry = relx * sa + rely * ca + centroid[1]
            rotated = np.stack([rx, ry, pts[..., 2]], axis=-1)
            per_frame_pts.append(rotated @ A.T + b)
        candidate = np.concatenate(per_frame_pts, axis=1)  # (K, F*n_ds, 3)
        shift_entries.append((current_idx, candidate[..., :2], filtered[:, :2]))

    if shift_entries:
        # single device sweep over (shift x angle); 2-D masked Hausdorff
        # (the reference kernel ignores z)
        S = len(shift_entries)
        n_max = max(c.shape[1] for _, c, _ in shift_entries)
        m_max = max(f.shape[0] for _, _, f in shift_entries)
        p_h = np.zeros((S, K, n_max, 2))
        pmask_h = np.zeros((S, K, n_max), dtype=bool)
        q_h = np.zeros((S, m_max, 2))
        qmask_h = np.zeros((S, m_max), dtype=bool)
        for si, (_, cand, filt) in enumerate(shift_entries):
            p_h[si, :, : cand.shape[1]] = cand
            pmask_h[si, :, : cand.shape[1]] = True
            q_h[si, : filt.shape[0]] = filt
            qmask_h[si, : filt.shape[0]] = True
        p = jnp.asarray(p_h.reshape(S * K, n_max, 2), dtype=dtype)
        pmask = jnp.asarray(pmask_h.reshape(S * K, n_max))
        q = jnp.asarray(
            np.broadcast_to(q_h[:, None], (S, K, m_max, 2)).reshape(S * K, m_max, 2),
            dtype=dtype,
        )
        qmask = jnp.asarray(
            np.broadcast_to(qmask_h[:, None], (S, K, m_max)).reshape(S * K, m_max)
        )
        costs_sq = np.asarray(
            hausdorff_sq_masked(q, p, qmask, pmask), dtype=np.float64
        ).reshape(S, K)

        # argmin certification (ops.argmin_repair semantics): when another
        # (shift, angle) candidate's cost lies within the compute dtype's
        # rounding band of the winner, the argmin can flip between
        # backends — recompute every candidate exactly in f64 on the host
        # (the point sets are already host-resident) and decide there
        from ..ops.argmin_repair import certify_enabled, stats

        from ..ops.rotation_search import _eps_eff

        m2 = float(costs_sq.min())
        eps = _eps_eff(dtype)
        scale2 = max(
            float((p_h * p_h).sum(-1).max()), float((q_h * q_h).sum(-1).max()),
            1e-30,
        )
        band = 64.0 * eps * (math.sqrt(max(scale2 * m2, 0.0)) + m2)
        if (costs_sq <= m2 + band).sum() > 1:
            stats["flagged"] += 1
            if certify_enabled():
                stats["repaired"] += 1
                exact = np.empty_like(costs_sq)
                for si, (_, cand, filt) in enumerate(shift_entries):
                    c64 = np.asarray(cand, dtype=np.float64)
                    f64c = np.asarray(filt, dtype=np.float64)
                    dx = c64[:, :, None, 0] - f64c[None, None, :, 0]
                    dy = c64[:, :, None, 1] - f64c[None, None, :, 1]
                    d2 = dx * dx + dy * dy  # (K, n, m)
                    fwd = d2.min(axis=2).max(axis=1)
                    bwd = d2.min(axis=1).max(axis=1)
                    exact[si] = np.maximum(fwd, bwd)
                if np.argmin(exact) != np.argmin(costs_sq):
                    stats["changed"] += 1
                costs_sq = exact

        costs = np.sqrt(costs_sq)

        # identical first-wins scan order to the sequential loop
        for si, (current_idx, _, _) in enumerate(shift_entries):
            for k in range(K):
                if costs[si, k] < min_hausdorff:
                    min_hausdorff = float(costs[si, k])
                    best_angle = float(angles[k])
                    best_cl_ref_idx = current_idx

    if verbose:
        print(
            f"Refined rotation: {math.degrees(best_angle):.2f}°, Refined CL index: "
            f"{best_cl_ref_idx}, Hausdorff: {min_hausdorff:.2f}"
        )
    return best_angle, best_cl_ref_idx


# ---------------------------------------------------------------------------
# wall parallel transport
# ---------------------------------------------------------------------------

def _lumen_normal(frame) -> np.ndarray:
    return newell_normal(frame.lumen.xyz(), np.asarray(frame.centroid))


def _aortic_centroid_direction(wall: PyContour, frame_centroid) -> Optional[np.ndarray]:
    pts = np.array([[p.x, p.y, p.z] for p in wall.points if p.aortic])
    if pts.size == 0:
        return None
    direction = pts.mean(axis=0) - np.asarray(frame_centroid)
    if float(np.linalg.norm(direction)) < 1e-9:
        return None
    return direction


def _wall_major_axis(wall: PyContour) -> Optional[np.ndarray]:
    pts = wall.xyz()
    if pts.shape[0] < 2:
        return None
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(pts.shape[0], k=1)
    if iu[0].size == 0:
        return None
    k = int(np.argmax(d2[iu]))
    a, b = iu[0][k], iu[1][k]
    direction = pts[b] - pts[a]
    if float(np.linalg.norm(direction)) < 1e-9:
        return None
    return direction


def _project_onto_plane(v: np.ndarray, tangent: np.ndarray) -> Optional[np.ndarray]:
    proj = v - tangent * float(np.dot(v, tangent))
    n = float(np.linalg.norm(proj))
    if n < 1e-9:
        return None
    return proj / n


def _parallel_transport(v, t_from, t_to) -> np.ndarray:
    cosang = float(np.clip(np.dot(t_from, t_to) / max(np.linalg.norm(t_from) * np.linalg.norm(t_to), 1e-300), -1.0, 1.0))
    angle = math.acos(cosang)
    if angle < 1e-9:
        return v
    axis = np.cross(t_from, t_to)
    if float(np.linalg.norm(axis)) < 1e-9:
        if abs(t_from[0]) < 0.9:
            perp = np.array([1.0, 0.0, 0.0]) - t_from * t_from[0]
        else:
            perp = np.array([0.0, 1.0, 0.0]) - t_from * t_from[1]
        perp = perp / np.linalg.norm(perp)
        return rotation_matrix_axis_angle(perp, math.pi) @ v
    return rotation_matrix_axis_angle(axis, angle) @ v


def _signed_angle_around_axis(v_from, v_to, axis) -> float:
    return math.atan2(float(np.dot(np.cross(v_from, v_to), axis)), float(np.dot(v_from, v_to)))


def _align_walls_on_geometry(geom: PyGeometry) -> None:
    """Parity: align.rs:506-583."""
    frame0 = geom.frames[0]
    t0 = _lumen_normal(frame0)
    wall0 = frame0.extras.get("Wall")
    if wall0 is None:
        return
    dir0 = _aortic_centroid_direction(wall0, frame0.centroid)
    if dir0 is None:
        dir0 = _wall_major_axis(wall0)
    if dir0 is None:
        return
    u = _project_onto_plane(dir0, t0)
    if u is None:
        return

    for i in range(1, len(geom.frames)):
        t_prev = _lumen_normal(geom.frames[i - 1])
        t_curr = _lumen_normal(geom.frames[i])
        u = _parallel_transport(u, t_prev, t_curr)
        proj = _project_onto_plane(u, t_curr)
        if proj is None:
            continue
        u = proj

        center = np.asarray(geom.frames[i].centroid)
        wall = geom.frames[i].extras.get("Wall")
        if wall is None:
            continue
        wall_dir = _aortic_centroid_direction(wall, center)
        has_aortic = wall_dir is not None
        if wall_dir is None:
            wall_dir = _wall_major_axis(wall)
            if wall_dir is None:
                continue
        v = _project_onto_plane(wall_dir, t_curr)
        if v is None:
            continue

        if has_aortic:
            angle = _signed_angle_around_axis(v, u, t_curr)
        else:
            a1 = _signed_angle_around_axis(v, u, t_curr)
            a2 = _signed_angle_around_axis(-v, u, t_curr)
            angle = a1 if abs(a1) <= abs(a2) else a2
        if abs(angle) < 1e-6:
            continue

        rotation = rotation_matrix_axis_angle(t_curr, angle)
        xyz = wall.xyz()
        wall.set_xyz((xyz - center) @ rotation.T + center)


def align_walls(target: AlignTarget, anomalous: bool) -> AlignTarget:
    """Parallel-transport wall orientation along the frame stack (Wall
    contour only).  Parity: align.rs:588-594."""
    if not anomalous or len(primary_geometry(target).frames) < 2:
        return target
    for geom in _geometries_of(target):
        _align_walls_on_geometry(geom)
    return target


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def _maybe_write(
    target: AlignTarget,
    write: bool,
    case_name: str,
    output_dir: str,
    interpolation_steps: int,
    watertight: bool,
    contour_types: Sequence[str],
) -> AlignTarget:
    if not write:
        return target
    from . import to_object

    if isinstance(target, PyGeometryPair):
        return to_object.process_case(
            case_name, target, output_dir, interpolation_steps, watertight, contour_types
        )
    return to_object.write_single_geometry(
        case_name, target, output_dir, watertight, contour_types
    )


def align_three_point_rs(
    centerline: PyCenterline,
    target: AlignTarget,
    main_ref_pt,
    counterclockwise_ref_pt,
    clockwise_ref_pt,
    angle_step: float,
    write: bool,
    watertight: bool,
    interpolation_steps: int,
    output_dir: str,
    contour_types: Sequence[str],
    case_name: str,
    align_wall_anomalous: bool,
    verbose: bool = True,
) -> Tuple[AlignTarget, PyCenterline]:
    """Parity: align.rs:63-124."""
    resampled = preprocess_centerline(centerline, primary_geometry(target))

    ref_idx = primary_geometry(target).find_ref_frame_idx()
    if ref_idx is None:
        raise ValueError("Couldn't find ref frame idx")
    ref_point = primary_geometry(target).frames[ref_idx].reference_point
    if ref_point is None:
        raise ValueError("missing reference point")
    cl_ref_idx = resampled.find_reference_cl_point_idx(tuple(main_ref_pt))

    best_rot = best_rotation_three_point(
        primary_geometry(target).frames[ref_idx].lumen,
        ref_point,
        main_ref_pt,
        counterclockwise_ref_pt,
        clockwise_ref_pt,
        angle_step,
        resampled.points[cl_ref_idx],
        verbose=verbose,
    )

    target = rotate_all(target, best_rot)
    target = apply_transformations(target, resampled, main_ref_pt)
    if align_wall_anomalous:
        target = align_walls(target, True)
    target = _maybe_write(
        target, write, case_name, output_dir, interpolation_steps, watertight, contour_types
    )
    return target, resampled


def align_manual_rs(
    centerline: PyCenterline,
    target: AlignTarget,
    rotation_angle_deg: float,
    ref_pt,
    write: bool,
    watertight: bool,
    interpolation_steps: int,
    output_dir: str,
    contour_types: Sequence[str],
    case_name: str,
    align_wall_anomalous: bool,
    verbose: bool = True,
) -> Tuple[AlignTarget, PyCenterline]:
    """Parity: align.rs:126-165."""
    resampled = preprocess_centerline(centerline, primary_geometry(target))
    target = rotate_all(target, math.radians(rotation_angle_deg))
    target = apply_transformations(target, resampled, ref_pt)
    if align_wall_anomalous:
        target = align_walls(target, True)
    target = _maybe_write(
        target, write, case_name, output_dir, interpolation_steps, watertight, contour_types
    )
    return target, resampled


def align_combined_rs(
    centerline: PyCenterline,
    target: AlignTarget,
    main_ref_pt,
    counterclockwise_ref_pt,
    clockwise_ref_pt,
    points,
    angle_step: float,
    refine_angle_range: float,
    refine_index_range: int,
    write: bool,
    watertight: bool,
    interpolation_steps: int,
    output_dir: str,
    contour_types: Sequence[str],
    case_name: str,
    align_wall_anomalous: bool,
    verbose: bool = True,
) -> Tuple[AlignTarget, PyCenterline]:
    """Three-point initialisation + Hausdorff refinement over (shift, angle).
    Parity: align.rs:168-284."""
    original = target.copy()

    if verbose:
        print("\nStep 1: Finding initial rotation via three-point method")
    resampled = preprocess_centerline(centerline.copy(), primary_geometry(original))

    ref_idx = primary_geometry(original).find_ref_frame_idx()
    if ref_idx is None:
        raise ValueError("Couldn't find ref frame idx")
    ref_point = primary_geometry(original).frames[ref_idx].reference_point
    if ref_point is None:
        raise ValueError("missing reference point")
    initial_cl_ref_idx = resampled.find_reference_cl_point_idx(tuple(main_ref_pt))

    initial_rotation = best_rotation_three_point(
        primary_geometry(original).frames[ref_idx].lumen,
        ref_point,
        main_ref_pt,
        counterclockwise_ref_pt,
        clockwise_ref_pt,
        angle_step,
        resampled.points[initial_cl_ref_idx],
        verbose=verbose,
    )

    aligned = apply_transformations(
        rotate_all(original, initial_rotation), resampled, main_ref_pt
    )
    mutated_points = np.asarray(points, dtype=np.float64).reshape(-1, 3)

    if verbose:
        print("Step 2: Refining with Hausdorff distance")
    refined_rotation_delta, refined_cl_ref_idx = refine_alignment_hausdorff(
        aligned,
        resampled,
        initial_cl_ref_idx,
        0.0,
        mutated_points,
        refine_angle_range,
        angle_step,
        refine_index_range,
        verbose=verbose,
    )

    total_rotation = initial_rotation + refined_rotation_delta
    if verbose:
        print("---------------------Applying final transformation---------------------")
        print(f"Total rotation (initial + delta): {math.degrees(total_rotation):.2f}°")
        print(
            f"Moving ostium by {initial_cl_ref_idx - refined_cl_ref_idx} centerline points"
        )

    refined_pt = resampled.points[refined_cl_ref_idx].contour_point
    refined_ref_pt = (refined_pt.x, refined_pt.y, refined_pt.z)

    final_target = apply_transformations(
        rotate_all(target.copy(), total_rotation), resampled, refined_ref_pt
    )
    if align_wall_anomalous:
        final_target = align_walls(final_target, True)
    final_target = _maybe_write(
        final_target, write, case_name, output_dir, interpolation_steps, watertight, contour_types
    )
    return final_target, resampled
