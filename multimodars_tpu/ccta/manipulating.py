"""CCTA mesh manipulation: region scaling/morphing, label bookkeeping and
stitching onto the intravascular geometry.

Parity: ``multimodars/ccta/manipulating.py`` of the reference, with trimesh
replaced by the package-native :class:`Mesh` and the Rust kernels by
:mod:`multimodars_tpu.ccta.kernels`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.centerline import PyCenterline
from ..models.frame import PyFrame
from ..models.geometry import PyGeometry
from .kernels import (
    adjust_diameter_centerline_morphing_simple,
    build_adjacency_map,
    find_aortic_scaling as _kernel_find_aortic_scaling,
    find_aortic_wall_scaling as _kernel_find_aortic_wall_scaling,
    find_proximal_distal_scaling as _kernel_find_proximal_distal_scaling,
)
from .mesh import Mesh, concatenate

_RESULT_POINT_KEYS = (
    "aorta_points",
    "rca_points",
    "lca_points",
    "rca_removed_points",
    "lca_removed_points",
    "proximal_points",
    "distal_points",
)


def _fast_fix_normals(mesh: Mesh) -> None:
    """Winding-consistency BFS + inversion flip (manipulating.py:21-32)."""
    mesh.fix_winding()
    mesh.fix_inversion()


def _project_to_best_fit_plane(points):
    """SVD plane fit + orthogonal projection (manipulating.py:35-52)."""
    if len(points) < 3:
        return points
    pts = np.array(points, dtype=np.float64)
    centroid = pts.mean(axis=0)
    _, _, Vt = np.linalg.svd(pts - centroid, full_matrices=False)
    normal = Vt[-1]
    distances = (pts - centroid) @ normal
    projected = pts - np.outer(distances, normal)
    return [tuple(p) for p in projected]


def _plane_normal_svd(pts: np.ndarray) -> np.ndarray:
    centroid = pts.mean(axis=0)
    _, _, Vt = np.linalg.svd(pts - centroid, full_matrices=False)
    return Vt[-1]


def _angle_between_planes_deg(n1: np.ndarray, n2: np.ndarray) -> float:
    cos = np.clip(np.abs(np.dot(n1, n2)), 0.0, 1.0)
    return float(np.degrees(np.arccos(cos)))


def _clamp_to_plane(points, plane_origin, plane_normal, overshoot: float = 0.0):
    """Clamp wrong-side points to the IV plane, then enforce a minimum gap.
    Parity: manipulating.py:68-101."""
    pts = np.array(points, dtype=np.float64)
    dists = (pts - plane_origin) @ plane_normal
    correct_sign = np.sign(np.median(dists))

    wrong = (np.sign(dists) != correct_sign) & (dists != 0.0)
    pts[wrong] -= np.outer(dists[wrong], plane_normal)

    if overshoot > 0.0:
        dists2 = (pts - plane_origin) @ plane_normal
        signed_dist = correct_sign * dists2
        too_close = signed_dist < overshoot
        deficit = overshoot - signed_dist[too_close]
        pts[too_close] += np.outer(deficit * correct_sign, plane_normal)

    return [tuple(p) for p in pts]


def _smooth_ring_laplacian(points, iterations: int = 5, alpha: float = 0.5):
    """Laplacian smoothing of a closed ring (manipulating.py:104-129)."""
    if len(points) < 3:
        return points
    pts = np.array(points, dtype=np.float64)
    for _ in range(iterations):
        prev = pts.copy()
        neighbor_avg = (np.roll(prev, 1, axis=0) + np.roll(prev, -1, axis=0)) / 2.0
        pts = alpha * prev + (1.0 - alpha) * neighbor_avg
    return [tuple(p) for p in pts]


def _order_boundary_components(boundary_indices, adj_map):
    """Walk each connected boundary component in edge order
    (manipulating.py:132-173)."""
    if not boundary_indices:
        return []
    if len(boundary_indices) == 1:
        return [list(boundary_indices)]

    ring_adj = {
        i: [j for j in adj_map.get(i, []) if j in boundary_indices]
        for i in boundary_indices
    }
    remaining = set(boundary_indices)
    components = []
    while remaining:
        start = next(iter(remaining))
        component = [start]
        remaining.discard(start)
        prev, current = -1, start
        while True:
            nxt = next(
                (n for n in ring_adj.get(current, []) if n != prev and n in remaining),
                None,
            )
            if nxt is None:
                break
            component.append(nxt)
            remaining.discard(nxt)
            prev, current = current, nxt
        components.append(component)
    return components


def scale_region_centerline_morphing(
    mesh: Mesh,
    region_points: list,
    centerline,
    diameter_adjustment_mm: float,
) -> Mesh:
    """Scale a mesh region radially around its centerline.
    Parity: manipulating.py:176-245."""
    scaled_mesh = mesh.copy()

    region_set = set(region_points)
    region_vertex_indices = np.array(
        [i for i, v in enumerate(scaled_mesh.vertices) if tuple(v) in region_set],
        dtype=np.int64,
    )
    if len(region_vertex_indices) == 0:
        print("Warning: No vertices found for scaling region")
        return scaled_mesh

    print(f"\nScaling {len(region_vertex_indices)} vertices around {centerline}")
    print(f"Diameter adjustment: {np.round(diameter_adjustment_mm, 2)} mm")

    region_vertices = [tuple(v) for v in scaled_mesh.vertices[region_vertex_indices]]
    adjusted = adjust_diameter_centerline_morphing_simple(
        centerline=centerline,
        points=region_vertices,
        diameter_adjustment_mm=diameter_adjustment_mm,
    )
    scaled_mesh.vertices[region_vertex_indices] = np.array(adjusted, dtype=np.float64)
    scaled_mesh._invalidate()
    return scaled_mesh


def find_distal_and_proximal_scaling(
    frames,
    centerline,
    results: dict,
    dist_range: int = 3,
    prox_range: int = 2,
) -> Tuple[float, float]:
    """Optimal proximal/distal radial scalings vs the first/last imaging
    frames.  Parity: manipulating.py:248-305."""
    frame_points_dist = [
        (p.x, p.y, p.z) for f in frames[-dist_range:] for p in f.lumen.points
    ]
    frame_points_prox = [
        (p.x, p.y, p.z) for f in frames[0:prox_range] for p in f.lumen.points
    ]
    n_section = int(np.ceil(0.25 * len(results["anomalous_points"])))

    print("\nFinding best proximal/distal radial scaling factors...")
    prox_scaling, dist_scaling = _kernel_find_proximal_distal_scaling(
        results["anomalous_points"],
        n_section,
        n_section,
        centerline,
        frame_points_prox,
        frame_points_dist,
    )
    print(f"Proximal scaling: {np.round(prox_scaling, 2)} mm")
    print(f"Distal scaling: {np.round(dist_scaling, 2)} mm")
    return prox_scaling, dist_scaling


def find_aorta_scaling(frames, cl_aorta, results: dict) -> float:
    """Optimal aortic radial scaling vs reconstructed wall points.
    Parity: manipulating.py:308-349."""
    reference_points = _extract_wall_from_frames(frames)
    if reference_points is None:
        raise ValueError("No aortic wall points found in frames for scaling reference")

    print("\nFinding best aortic radial scaling factor...")
    scaling = _kernel_find_aortic_scaling(
        results["rca_removed_points"], reference_points, cl_aorta
    )
    print(f"Aortic scaling: {np.round(scaling, 2)} mm")
    return scaling


def find_aortic_wall_scaling(frames, cl_aorta, results: dict) -> float:
    """Aortic-wall scaling for anomalous coronaries (distance to the first
    round lumen's quarter point).  Parity: manipulating.py:352-397."""
    ref_point = None
    print("\nFinding best aortic wall radial scaling factor...")
    for frame in frames:
        if frame.lumen.get_elliptic_ratio() < 1.3:
            print(f"elliptic ratio <1.3 for frame index {frame.id}")
            point_idx = len(frame.lumen) // 4
            p = frame.lumen.points[point_idx]
            ref_point = (p.x, p.y, p.z)
            break
    if ref_point is None:
        raise ValueError("No coronary reference point found")
    scaling = _kernel_find_aortic_wall_scaling(cl_aorta, ref_point, results["aorta_points"])
    print(f"Aortic wall scaling: {np.round(scaling, 2)} mm")
    return scaling


def _extract_wall_from_frames(frames):
    """Straight-wall (coronary-side) points from the last frame carrying an
    aortic thickness.  Parity: manipulating.py:400-458."""
    n_points = len(frames[0].lumen.points)
    half = n_points // 2
    reference_points = None
    for frame in frames:
        if frame.lumen.aortic_thickness is None:
            continue
        wall = frame.extras.get("Wall")
        if wall is None:
            raise ValueError(f"No Wall extras found for frame {frame.id}")
        if wall.n_points == 0:
            raise ValueError(f"Empty Wall extras for frame {frame.id}")
        reference_points = [
            (p.x, p.y, p.z) for p in wall.points if p.point_index < half
        ]
    return reference_points


def _remap_results(results, region_keys, new_mesh, boundary_points, keep_keys):
    new_coord_set = {tuple(v) for v in new_mesh.vertices}
    updated = dict(results)
    updated["mesh"] = new_mesh
    updated["boundary_points"] = boundary_points
    for key in region_keys:
        updated[key] = []
    for key in keep_keys:
        if key in updated and key not in region_keys:
            updated[key] = [p for p in updated[key] if tuple(p) in new_coord_set]
    return updated


def remove_labeled_points_from_mesh(results: dict, region_keys="anomalous_points") -> dict:
    """Remove labelled regions from the mesh, tracking the open boundary
    ring.  Parity: manipulating.py:461-572."""
    if isinstance(region_keys, str):
        region_keys = [region_keys]
    mesh: Mesh = results["mesh"]

    points_to_remove = [pt for key in region_keys for pt in results.get(key, [])]
    if not points_to_remove:
        return results

    coord_to_idx = {tuple(coord): i for i, coord in enumerate(mesh.vertices)}
    remove_indices = {
        coord_to_idx[tuple(pt)] for pt in points_to_remove if tuple(pt) in coord_to_idx
    }
    if not remove_indices:
        return results

    n_vertices = len(mesh.vertices)
    keep_mask = np.ones(n_vertices, dtype=bool)
    keep_mask[list(remove_indices)] = False

    adj_map = build_adjacency_map(mesh.faces)
    boundary_indices = {
        i
        for i in range(n_vertices)
        if keep_mask[i] and any(j in remove_indices for j in adj_map.get(i, ()))
    }
    components = _order_boundary_components(boundary_indices, adj_map)
    boundary_points = [
        tuple(mesh.vertices[i]) for component in components for i in component
    ]

    face_keep = keep_mask[mesh.faces].all(axis=1)
    new_faces = mesh.faces[face_keep]
    new_index = np.full(n_vertices, -1, dtype=np.int64)
    new_index[keep_mask] = np.arange(keep_mask.sum(), dtype=np.int64)
    new_mesh = Mesh(mesh.vertices[keep_mask], new_index[new_faces])

    print(f"Applying removal of '{region_keys}'")
    print(f"Removed {len(points_to_remove)}")
    print(f"Created {len(boundary_points)} boundary points")

    return _remap_results(results, region_keys, new_mesh, boundary_points, _RESULT_POINT_KEYS)


def keep_labeled_points_from_mesh(results: dict, region_key) -> dict:
    """Keep only the labelled region's vertices (faces fully inside).
    Parity: manipulating.py:575-673."""
    mesh: Mesh = results["mesh"]
    region_keys = [region_key] if isinstance(region_key, str) else list(region_key)

    points_to_keep = []
    for key in region_keys:
        points_to_keep.extend(results.get(key, []))
    if not points_to_keep:
        return results

    coord_to_idx = {tuple(coord): i for i, coord in enumerate(mesh.vertices)}
    keep_indices = {
        coord_to_idx[tuple(pt)] for pt in points_to_keep if tuple(pt) in coord_to_idx
    }
    if not keep_indices:
        return results

    n_vertices = len(mesh.vertices)
    keep_mask = np.zeros(n_vertices, dtype=bool)
    keep_mask[list(keep_indices)] = True
    remove_indices = set(range(n_vertices)) - keep_indices

    adj_map = build_adjacency_map(mesh.faces)
    boundary_indices = {
        i for i in keep_indices if any(j in remove_indices for j in adj_map.get(i, ()))
    }
    components = _order_boundary_components(boundary_indices, adj_map)
    boundary_points = [
        tuple(mesh.vertices[i]) for component in components for i in component
    ]

    face_keep = keep_mask[mesh.faces].all(axis=1)
    new_faces = mesh.faces[face_keep]
    new_index = np.full(n_vertices, -1, dtype=np.int64)
    new_index[keep_mask] = np.arange(keep_mask.sum(), dtype=np.int64)
    new_mesh = Mesh(mesh.vertices[keep_mask], new_index[new_faces])

    return _remap_results(
        results, [], new_mesh, boundary_points, (*_RESULT_POINT_KEYS, *region_keys)
    )


def sync_results_to_mesh(results: dict, old_mesh: Mesh, new_mesh: Mesh) -> dict:
    """Refresh all coordinate lists after vertex positions moved.
    Parity: manipulating.py:676-724."""
    old_coord_to_idx = {tuple(v): i for i, v in enumerate(old_mesh.vertices)}
    updated = dict(results)
    updated["mesh"] = new_mesh
    for key in (*_RESULT_POINT_KEYS, "anomalous_points", "boundary_points"):
        if key not in updated or not updated[key]:
            continue
        indices = [old_coord_to_idx.get(tuple(p)) for p in updated[key]]
        updated[key] = [tuple(new_mesh.vertices[i]) for i in indices if i is not None]
    return updated


def _rotate_to_nearest_iv(boundary_pts: list, iv_pt) -> list:
    iv_arr = np.array([iv_pt.x, iv_pt.y, iv_pt.z])
    dists = np.linalg.norm(np.array(boundary_pts) - iv_arr, axis=1)
    start_idx = int(np.argmin(dists))
    return boundary_pts[start_idx:] + boundary_pts[:start_idx]


def _adjust_start_point_by_z(boundary_pts: list) -> list:
    start_idx = int(np.argmax([pt[2] for pt in boundary_pts]))
    return boundary_pts[start_idx:] + boundary_pts[:start_idx]


def stitch_ccta_to_intravascular(
    iv_mesh: PyGeometry,
    mesh: Mesh,
    results: dict,
    n_points_iv_cont: int = 100,
    prox_start_mode: str = "nearest_iv",
    dist_start_mode: str = "nearest_iv",
    proximal_is_ostium: bool = True,
    clamp_overshoot: float = 0.5,
) -> dict:
    """Stitch an aligned intravascular mesh to the (trimmed) CCTA mesh.
    Parity: manipulating.py:741-863."""
    from .._converters import geometry_to_trimesh

    iv_mesh = iv_mesh.downsample(n_points_iv_cont)
    iv_mesh_points = [
        (p.x, p.y, p.z) for frame in iv_mesh.frames for p in frame.lumen.points
    ]
    proximal_centroid = iv_mesh.frames[0].centroid
    distal_centroid = iv_mesh.frames[-1].centroid
    proximal_points = iv_mesh.frames[0].lumen.points
    distal_points = iv_mesh.frames[-1].lumen.points

    prox_boundary_pts, dist_boundary_pts, mesh = _prepare_prox_dist_boundary_pts(
        mesh,
        results,
        proximal_centroid,
        distal_centroid,
        proximal_is_ostium=proximal_is_ostium,
        proximal_iv_frame_pts=iv_mesh.frames[0].lumen.points,
        clamp_overshoot=clamp_overshoot,
    )
    # a boundary ring denser than the IV contour walks it with step 1
    prox_point_step = max(len(proximal_points) // len(prox_boundary_pts), 1)
    dist_point_step = max(len(distal_points) // len(dist_boundary_pts), 1)

    if prox_start_mode == "highest_z" or dist_start_mode == "highest_z":
        iv_mesh = iv_mesh.sort_frame_points()
        proximal_points = iv_mesh.frames[0].lumen.points
        distal_points = iv_mesh.frames[-1].lumen.points
    if prox_start_mode == "highest_z":
        prox_boundary_pts = _adjust_start_point_by_z(prox_boundary_pts)
    else:
        prox_boundary_pts = _rotate_to_nearest_iv(prox_boundary_pts, proximal_points[0])
    if dist_start_mode == "highest_z":
        dist_boundary_pts = _adjust_start_point_by_z(dist_boundary_pts)
    else:
        dist_boundary_pts = _rotate_to_nearest_iv(dist_boundary_pts, distal_points[0])

    prox_c = np.array(iv_mesh.frames[0].centroid)
    dist_c = np.array(iv_mesh.frames[-1].centroid)
    prox_outward = prox_c - dist_c
    dist_outward = dist_c - prox_c

    if prox_start_mode == "highest_z":
        prox_boundary_pts = _fix_ring_direction_by_winding(prox_boundary_pts, proximal_points)
    else:
        prox_boundary_pts = _fix_ring_direction_by_distance(
            prox_boundary_pts, proximal_points, prox_point_step
        )
    if dist_start_mode == "highest_z":
        dist_boundary_pts = _fix_ring_direction_by_winding(dist_boundary_pts, distal_points)
    else:
        dist_boundary_pts = _fix_ring_direction_by_distance(
            dist_boundary_pts, distal_points, dist_point_step
        )

    prox_patch = _stitch_boundary_ring(
        prox_boundary_pts, proximal_points, prox_point_step, prox_outward
    )
    dist_patch = _stitch_boundary_ring(
        dist_boundary_pts, distal_points, dist_point_step, dist_outward
    )
    test_mesh = geometry_to_trimesh(iv_mesh)
    test_mesh.update_faces(test_mesh.unique_faces())
    test_mesh.update_faces(test_mesh.nondegenerate_faces())
    _fast_fix_normals(test_mesh)
    mesh = concatenate([mesh, prox_patch, dist_patch, test_mesh])
    mesh.merge_vertices(digits=3)  # trimesh.tol.merge = 0.001 analog
    if not mesh.is_watertight:
        mesh.fill_holes()
    mesh.update_faces(mesh.unique_faces())
    mesh.update_faces(mesh.nondegenerate_faces())
    mesh.remove_unreferenced_vertices()
    _fast_fix_normals(mesh)

    results["prox_boundary_points"] = prox_boundary_pts
    results["dist_boundary_points"] = dist_boundary_pts
    results["anomalous_points"] = iv_mesh_points
    results["rca_points"] = (
        iv_mesh_points + results["distal_points"] + results["proximal_points"]
    )
    results["mesh"] = mesh
    return results


def _enforce_layer_gap_from_plane(
    mesh: Mesh,
    seed_indices,
    plane_origin: np.ndarray,
    plane_normal: np.ndarray,
    layer_step_mm: float = 0.1,
    n_rings: int = 2,
) -> Mesh:
    """Push neighbouring rings radially outward within the IV plane.
    Parity: manipulating.py:866-916."""
    adj_map = build_adjacency_map(mesh.faces)
    new_vertices = mesh.vertices.copy()

    frontier = set(seed_indices)
    visited = set(seed_indices)
    for ring in range(1, n_rings + 1):
        push_dist = ring * layer_step_mm
        next_frontier = set()
        for vi in frontier:
            for nb in adj_map.get(vi, ()):
                if nb not in visited:
                    next_frontier.add(nb)
        for vi in next_frontier:
            p = new_vertices[vi]
            p_proj = p - float(np.dot(p - plane_origin, plane_normal)) * plane_normal
            radial = p_proj - plane_origin
            r_norm = np.linalg.norm(radial)
            if r_norm < 1e-10:
                continue
            new_vertices[vi] = p + (push_dist / r_norm) * radial
        visited.update(next_frontier)
        frontier = next_frontier
        if not frontier:
            break
    return Mesh(new_vertices, mesh.faces)


def _prepare_prox_dist_boundary_pts(
    mesh: Mesh,
    results: dict,
    prox_centroid,
    dist_centroid,
    proximal_is_ostium: bool = True,
    proximal_iv_frame_pts=None,
    ostium_angle_threshold_deg: float = 45.0,
    clamp_overshoot: float = 1.0,
):
    """Split / project / smooth / clamp the boundary rings.
    Parity: manipulating.py:919-990."""
    proximal_boundary_pts = []
    distal_boundary_pts = []
    for pt in results["boundary_points"]:
        d_prox = np.linalg.norm(np.array(prox_centroid) - np.array(pt))
        d_dist = np.linalg.norm(np.array(dist_centroid) - np.array(pt))
        if d_prox <= d_dist:
            proximal_boundary_pts.append(pt)
        else:
            distal_boundary_pts.append(pt)

    if proximal_is_ostium:
        prox_projected = _project_to_best_fit_plane(proximal_boundary_pts)
        prox_boundary_pts_ord = _smooth_ring_laplacian(prox_projected)

        iv_origin = iv_normal = None
        clamping_applied = False
        if proximal_iv_frame_pts is not None and len(prox_boundary_pts_ord) >= 3:
            boundary_arr = np.array(prox_boundary_pts_ord, dtype=np.float64)
            iv_arr = np.array(
                [[p.x, p.y, p.z] for p in proximal_iv_frame_pts], dtype=np.float64
            )
            boundary_normal = _plane_normal_svd(boundary_arr)
            iv_normal = _plane_normal_svd(iv_arr)
            if _angle_between_planes_deg(boundary_normal, iv_normal) >= ostium_angle_threshold_deg:
                iv_origin = np.array(prox_centroid, dtype=np.float64)
                prox_boundary_pts_ord = _clamp_to_plane(
                    prox_boundary_pts_ord, iv_origin, iv_normal, overshoot=clamp_overshoot
                )
                clamping_applied = True

        coord_to_idx = {tuple(v): i for i, v in enumerate(mesh.vertices)}
        new_vertices = mesh.vertices.copy()
        fixed_indices = set()
        for old_pt, new_pt in zip(proximal_boundary_pts, prox_boundary_pts_ord):
            idx = coord_to_idx.get(tuple(old_pt))
            if idx is not None:
                new_vertices[idx] = new_pt
                fixed_indices.add(idx)
        mesh = Mesh(new_vertices, mesh.faces)

        if clamping_applied and fixed_indices:
            mesh = _enforce_layer_gap_from_plane(mesh, fixed_indices, iv_origin, iv_normal)
    else:
        prox_boundary_pts_ord = order_points_list(mesh, proximal_boundary_pts)

    dist_boundary_pts_ord = order_points_list(mesh, distal_boundary_pts)
    return prox_boundary_pts_ord, dist_boundary_pts_ord, mesh


def order_points_list(mesh: Mesh, points: list, coord_to_idx: dict = None) -> list:
    """Order boundary points into a connected ring by walking mesh edges,
    with a plane-fit CCW fallback.  Parity: manipulating.py:993-1071.
    ``coord_to_idx`` lets repeated callers share one vertex-lookup table."""
    if len(points) <= 1:
        return list(points)

    if coord_to_idx is None:
        coord_to_idx = {tuple(coord): i for i, coord in enumerate(mesh.vertices.tolist())}
    boundary_indices = []
    idx_to_pt = {}
    for pt in points:
        idx = coord_to_idx.get(tuple(pt))
        if idx is not None:
            boundary_indices.append(idx)
            idx_to_pt[idx] = pt
    if not boundary_indices:
        return list(points)

    boundary_set = set(boundary_indices)
    # adjacency restricted to faces touching the boundary — same
    # boundary-filtered neighbor sets as the full map, far cheaper
    touching = np.isin(mesh.faces, np.fromiter(boundary_set, dtype=np.int64)).any(axis=1)
    adj_map = build_adjacency_map(mesh.faces[touching])
    boundary_adj = {
        i: [n for n in adj_map.get(i, ()) if n in boundary_set] for i in boundary_indices
    }

    start = boundary_indices[0]
    ordered = [start]
    visited = {start}
    current = start
    while True:
        candidates = [n for n in boundary_adj[current] if n not in visited]
        if not candidates:
            break
        current = candidates[0]
        ordered.append(current)
        visited.add(current)

    if len(visited) == len(boundary_indices):
        return [idx_to_pt[i] for i in ordered]

    pts_array = np.array([idx_to_pt[i] for i in boundary_indices], dtype=np.float64)
    centroid = pts_array.mean(axis=0)
    centered = pts_array - centroid
    _, _, Vt = np.linalg.svd(centered)
    normal = Vt[-1]
    u = Vt[0]
    v = np.cross(normal, u)
    angles = np.arctan2(centered @ v, centered @ u)
    order = np.argsort(angles)
    return [idx_to_pt[boundary_indices[k]] for k in order]


def _signed_area_projected(pts: list, normal: np.ndarray) -> float:
    """Parity: manipulating.py:1074-1088."""
    ref = np.array([1.0, 0.0, 0.0]) if abs(normal[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(normal, ref)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    arr = np.array(pts)
    us = arr @ u
    vs = arr @ v
    return float(0.5 * np.sum(us * np.roll(vs, -1) - np.roll(us, -1) * vs))


def _newell_normal(pts: list) -> np.ndarray:
    """Parity: manipulating.py:1091-1108."""
    arr = np.array(pts)
    nxt = np.roll(arr, -1, axis=0)
    normal = np.array(
        [
            np.sum((arr[:, 1] - nxt[:, 1]) * (arr[:, 2] + nxt[:, 2])),
            np.sum((arr[:, 2] - nxt[:, 2]) * (arr[:, 0] + nxt[:, 0])),
            np.sum((arr[:, 0] - nxt[:, 0]) * (arr[:, 1] + nxt[:, 1])),
        ]
    )
    length = np.linalg.norm(normal)
    return normal / length if length > 1e-10 else np.array([0.0, 0.0, 1.0])


def _fix_ring_direction_by_distance(boundary_pts: list, iv_pts, point_step: int) -> list:
    """Parity: manipulating.py:1111-1137."""
    iv_sub = iv_pts[0::point_step][: len(boundary_pts)]
    reversed_pts = [boundary_pts[0]] + list(reversed(boundary_pts[1:]))

    def total_dist(bpts):
        n = min(len(bpts), len(iv_sub))
        return sum(
            np.linalg.norm(
                np.array(bpts[i]) - np.array([iv_sub[i].x, iv_sub[i].y, iv_sub[i].z])
            )
            for i in range(n)
        )

    return reversed_pts if total_dist(reversed_pts) < total_dist(boundary_pts) else boundary_pts


def _fix_ring_direction_by_winding(boundary_pts: list, iv_pts) -> list:
    """Parity: manipulating.py:1140-1157."""
    iv_arr = [[p.x, p.y, p.z] for p in iv_pts]
    normal = _newell_normal(iv_arr)
    if _signed_area_projected(boundary_pts, normal) < 0:
        return [boundary_pts[0]] + list(reversed(boundary_pts[1:]))
    return boundary_pts


def _stitch_boundary_ring(
    boundary_pts: list,
    iv_pts,
    step: int,
    outward_direction: Optional[np.ndarray] = None,
) -> Mesh:
    """Fan-triangulate between a CCTA boundary ring and an IV lumen ring.
    Parity: manipulating.py:1160-1255."""
    n_boundary = len(boundary_pts)
    n_iv = len(iv_pts)
    remainder = n_iv % n_boundary

    b_arr = np.array(boundary_pts, dtype=np.float64)
    iv_arr = np.array([(p.x, p.y, p.z) for p in iv_pts], dtype=np.float64)
    vertices = np.vstack([b_arr, iv_arr])

    faces = []
    iv_start = 0
    for b in range(n_boundary):
        b_next = (b + 1) % n_boundary
        seg_len = step + 1 if b < remainder else step
        iv_end = iv_start + seg_len
        mid = iv_start + seg_len // 2
        for i in range(iv_start, mid):
            faces.append((n_boundary + i, n_boundary + (i + 1) % n_iv, b))
        for i in range(mid, iv_end - 1):
            faces.append((n_boundary + i, n_boundary + (i + 1) % n_iv, b_next))
        faces.append((b_next, b, n_boundary + mid))
        iv_start = iv_end

    print(
        f"Stitching: {len(faces)}/{n_iv} triangles created "
        f"(n_boundary={n_boundary}, n_iv={n_iv}, step={step}, remainder={remainder})"
    )

    patch = Mesh(vertices, np.array(faces, dtype=np.int64))
    if outward_direction is not None:
        face_normals = patch.face_normals
        valid = ~np.isnan(face_normals).any(axis=1)
        if valid.any():
            avg_normal = face_normals[valid].mean(axis=0)
            if np.dot(avg_normal, outward_direction) < 0:
                patch.faces = patch.faces[:, ::-1]
                patch._invalidate()
    return patch
