"""CCTA mesh labeling: assign vertices to aorta / RCA / LCA regions.

Parity: ``multimodars/ccta/labeling.py`` of the reference, with the Rust
kernels replaced by :mod:`multimodars_tpu.ccta.kernels` and trimesh replaced
by the package-native :class:`Mesh`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np

from .._converters import numpy_to_centerline
from ..io.read_geometrical import read_mesh
from ..models.centerline import PyCenterline
from .debug_plots import plot_results_key
from .kernels import (
    build_adjacency_map,
    clean_outlier_points,
    find_aortic_points,
    find_centerline_bounded_points_simple,
    find_faces_near_points,
    find_points_by_cl_region,
    final_reclassification,
    remove_occluded_points_ray_triangle,
)
from .mesh import Mesh


def _load_centerline(source, name: str) -> PyCenterline:
    if isinstance(source, PyCenterline):
        print(f"Using provided {name} centerline: {len(source.points)} points")
        return source
    if isinstance(source, np.ndarray):
        cl = numpy_to_centerline(source)
        print(f"Using provided {name} centerline: {len(cl.points)} points")
        return cl
    try:
        raw = np.genfromtxt(source, delimiter=",")
        cl = numpy_to_centerline(raw)
        print(f"Loaded {name} centerline: {len(cl.points)} points")
        return cl
    except Exception as e:
        print(f"Error reading {name} centerline from {source}: {e}")
        raise


def label_geometry(
    path_ccta_geometry,
    path_centerline_aorta,
    path_centerline_rca,
    path_centerline_lca,
    anomalous_rca: bool = False,
    anomalous_lca: bool = False,
    n_points_intramural: int = 120,
    step_size_mm: float = 1.0,
    bounding_sphere_radius_mm: float = 3.0,
    tolerance_float: float = 1e-6,
    control_plot: bool = True,
) -> Tuple[Dict[str, Any], Tuple[PyCenterline, PyCenterline, PyCenterline]]:
    """Label CCTA mesh vertices as aorta / RCA / LCA (sphere-bounded region
    growth + optional ray-triangle occlusion removal + adjacency
    reclassification).  Parity: labeling.py:25-294."""
    if isinstance(path_ccta_geometry, Mesh):
        mesh = path_ccta_geometry
        print(f"Using provided mesh: {len(mesh.vertices)} vertices, {len(mesh.faces)} faces")
    else:
        try:
            mesh = read_mesh(path_ccta_geometry)
            print(f"Loaded mesh: {len(mesh.vertices)} vertices, {len(mesh.faces)} faces")
        except Exception as e:
            print(f"Error reading CCTA mesh from {path_ccta_geometry}: {e}")
            raise

    cl_aorta = _load_centerline(path_centerline_aorta, "aorta")
    cl_lca = _load_centerline(path_centerline_lca, "LCA")
    cl_rca = _load_centerline(path_centerline_rca, "RCA")

    vertices_arr = np.ascontiguousarray(mesh.vertices, dtype=np.float64)
    points_list = [tuple(v) for v in vertices_arr.tolist()]
    mesh_faces_list = mesh.faces.tolist()

    rca_points_found = find_centerline_bounded_points_simple(
        cl_rca, vertices_arr, bounding_sphere_radius_mm
    )
    lca_points_found = find_centerline_bounded_points_simple(
        cl_lca, vertices_arr, bounding_sphere_radius_mm
    )
    print(f"\nRCA points found: {len(rca_points_found)}")
    print(f"LCA points found: {len(lca_points_found)}")

    rca_removed_points: List = []
    lca_removed_points: List = []

    if anomalous_rca:
        print("Applying occlusion removal for anomalous RCA...")
        rca_faces = find_faces_near_points(
            points_list, mesh_faces_list, rca_points_found, tolerance_float
        )
        final_rca_points_found = remove_occluded_points_ray_triangle(
            centerline_coronary=cl_rca,
            centerline_aorta=cl_aorta,
            range_coronary=n_points_intramural,
            points=rca_points_found,
            faces=rca_faces,
            step_size_mm=step_size_mm,
        )
        kept = set(final_rca_points_found)
        rca_removed_points = [p for p in rca_points_found if p not in kept]
        print(f"RCA: relabeled {len(rca_removed_points)} points in intramual course")
    else:
        final_rca_points_found = list(rca_points_found)

    if anomalous_lca:
        print("Applying occlusion removal for anomalous LCA...")
        lca_faces = find_faces_near_points(
            points_list, mesh_faces_list, lca_points_found, tolerance_float
        )
        final_lca_points_found = remove_occluded_points_ray_triangle(
            centerline_coronary=cl_lca,
            centerline_aorta=cl_aorta,
            range_coronary=n_points_intramural,
            points=lca_points_found,
            faces=lca_faces,
            step_size_mm=step_size_mm,
        )
        kept = set(final_lca_points_found)
        lca_removed_points = [p for p in lca_points_found if p not in kept]
        print(f"LCA: relabeled {len(lca_removed_points)} points in intramual course")
    else:
        final_lca_points_found = list(lca_points_found)

    print("\nRemoving LCA and RCA island points...")
    aortic_points = find_aortic_points(
        points_list, final_rca_points_found, final_lca_points_found
    )
    print(f"length before: {len(final_lca_points_found)}")
    final_lca_points, final_aortic_points = clean_outlier_points(
        final_lca_points_found, aortic_points, 2.0, 0.4
    )
    final_rca_points, _ = clean_outlier_points(
        final_rca_points_found, final_aortic_points, 2.0, 0.4
    )
    final_aortic_points = find_aortic_points(points_list, final_rca_points, final_lca_points)
    final_aortic_points = list(
        set(final_aortic_points) | set(rca_removed_points) | set(lca_removed_points)
    )
    print(f"length after: {len(final_lca_points)}")

    results: Dict[str, Any] = {
        "mesh": mesh,
        "aorta_points": final_aortic_points,
        "rca_points": final_rca_points_found,
        "lca_points": final_lca_points,
        "rca_removed_points": rca_removed_points,
        "lca_removed_points": lca_removed_points,
    }

    print("\nApplying final reclassification based on adjacency map...")
    aorta_pts, rca_pts, lca_pts, rca_removed_pts, lca_removed_pts = final_reclassification(
        points_list,
        mesh_faces_list,
        results["rca_points"],
        results["lca_points"],
        results["rca_removed_points"],
        results["lca_removed_points"],
    )
    new_results: Dict[str, Any] = {
        "mesh": mesh,
        "aorta_points": aorta_pts,
        "rca_points": rca_pts,
        "lca_points": lca_pts,
        "rca_removed_points": rca_removed_pts,
        "lca_removed_points": lca_removed_pts,
    }
    for key in ("aorta_points", "rca_points", "lca_points", "rca_removed_points", "lca_removed_points"):
        print(f"{key}:{len(new_results[key])}")

    if control_plot:
        plot_results_key(
            new_results,
            aorta_points=True,
            rca_points=True,
            lca_points=True,
            rca_removed_points=True,
            proximal_points=True,
            distal_points=False,
            anomalous_points=False,
            cl_rca=cl_rca,
            cl_lca=cl_lca,
            cl_aorta=cl_aorta,
        )

    return new_results, (cl_rca, cl_lca, cl_aorta)


def _keep_largest_connected_component(mesh: Mesh, points):
    """Keep only the largest mesh-connected component of *points*.
    Parity: labeling.py:297-354."""
    if len(points) < 2:
        return points

    coord_to_idx = {tuple(v): i for i, v in enumerate(mesh.vertices.tolist())}
    point_indices = set()
    for pt in points:
        idx = coord_to_idx.get(tuple(pt))
        if idx is not None:
            point_indices.add(idx)
    if not point_indices:
        return points

    # connected components of the subgraph induced on the point set
    # (scipy csgraph over the boundary-restricted edge list)
    idx_arr = np.fromiter(point_indices, dtype=np.int64, count=len(point_indices))
    member = np.zeros(len(mesh.vertices), dtype=bool)
    member[idx_arr] = True
    f = mesh.faces
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = e[member[e].all(axis=1)]
    local = np.full(len(mesh.vertices), -1, dtype=np.int64)
    order = np.sort(idx_arr)
    local[order] = np.arange(len(order))
    n_local = len(order)
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as _cc

    if len(e):
        graph = coo_matrix(
            (np.ones(len(e), dtype=np.int8), (local[e[:, 0]], local[e[:, 1]])),
            shape=(n_local, n_local),
        )
        n_comp, labels = _cc(graph, directed=False)
    else:
        n_comp, labels = n_local, np.arange(n_local)
    sizes = np.bincount(labels, minlength=n_comp)
    best = int(np.argmax(sizes))
    largest = order[labels == best]

    if n_comp > 1:
        dropped = len(point_indices) - len(largest)
        print(
            f"  _keep_largest_connected_component: kept {len(largest)}/"
            f"{len(point_indices)} points ({n_comp - 1} island "
            f"component(s), {dropped} point(s) dropped)"
        )
    vl = mesh.vertices[largest].tolist()
    return [tuple(row) for row in vl]


def label_anomalous_region(
    centerline,
    frames,
    results: dict,
    results_key: str = "rca_points",
    debug_plot: bool = False,
) -> dict:
    """Partition a coronary region into proximal / anomalous / distal
    sub-regions using the aligned intravascular frames.
    Parity: labeling.py:357-463."""
    proximal_raw, distal_raw, anomalous_raw = find_points_by_cl_region(
        centerline=centerline, frames=frames, points=results[results_key]
    )

    mesh = results["mesh"]
    proximal_points = _keep_largest_connected_component(mesh, proximal_raw)
    distal_points = _keep_largest_connected_component(mesh, distal_raw)
    anomalous_points = _keep_largest_connected_component(mesh, anomalous_raw)

    dropped = (
        (set(proximal_raw) - set(proximal_points))
        | (set(distal_raw) - set(distal_points))
        | (set(anomalous_raw) - set(anomalous_points))
    )
    if dropped:
        results[results_key] = [p for p in results[results_key] if p not in dropped]
        print(
            f"  {len(dropped)} island point(s) reassigned from "
            f"'{results_key}' sub-regions to aorta_points"
        )

    results["proximal_points"] = proximal_points
    results["distal_points"] = distal_points
    results["anomalous_points"] = anomalous_points

    all_coronary = (
        set(results.get("rca_points", []))
        | set(results.get("lca_points", []))
        | set(proximal_points)
        | set(distal_points)
        | set(anomalous_points)
    )
    results["aorta_points"] = [
        tuple(v) for v in results["mesh"].vertices if tuple(v) not in all_coronary
    ]

    print("\nApplying anomalous labeling based on aligned intravascular frames...")
    print(f"proximal_points: {len(results['proximal_points'])}")
    print(f"distal_points: {len(results['distal_points'])}")
    print(f"anomalous_points: {len(results['anomalous_points'])}")

    if debug_plot:
        plot_results_key(
            results=results,
            aorta_points=False,
            rca_points=False,
            lca_points=False,
            rca_removed_points=False,
            proximal_points=True,
            distal_points=True,
            anomalous_points=True,
            cl_rca=centerline,
            cl_lca=None,
            cl_aorta=None,
        )

    return results


def label_branches(
    centerline,
    results: dict,
    results_key: str = "rca_points",
    branch_id=0,
    bounding_sphere_radius_mm: float = 3.0,
) -> dict:
    """Partition a coronary region into main-branch and per-side-branch
    point sets.  Parity: labeling.py:466-538."""
    branch_ids = [branch_id] if isinstance(branch_id, int) else list(branch_id)
    main_id_set = set(branch_ids)

    main_set: set = set()
    for bid in branch_ids:
        branch = centerline.get_branch(bid)
        main_set.update(
            find_centerline_bounded_points_simple(
                branch, results[results_key], bounding_sphere_radius_mm
            )
        )

    main_points = [p for p in results[results_key] if p in main_set]
    side_points = [p for p in results[results_key] if p not in main_set]

    results[f"{results_key}_main"] = main_points
    results[f"{results_key}_side"] = side_points

    n_branches = len(centerline.branch_start_indices)
    side_branch_ids = [k for k in range(n_branches) if k not in main_id_set]

    print(f"\nBranch labeling for '{results_key}' (branch_ids={branch_ids}):")
    print(f"  {results_key}_main: {len(main_points)}")
    print(f"  {results_key}_side: {len(side_points)}")

    for k in side_branch_ids:
        branch_k = centerline.get_branch(k)
        branch_k_points = find_centerline_bounded_points_simple(
            branch_k, side_points, bounding_sphere_radius_mm
        )
        results[f"{results_key}_side_{k}"] = branch_k_points
        print(f"  {results_key}_side_{k}: {len(branch_k_points)}")

    return results
