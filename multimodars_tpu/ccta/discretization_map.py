"""Vessel-tree discretization wrappers (+ optional B-spline contour refit).

Parity: ``multimodars/ccta/discretization_map.py`` of the reference.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy.interpolate import splev, splprep

from ..models.centerline import PyCenterline
from ..models.contour import PyContour
from ..models.point import PyContourPoint
from ..models.vessel_tree import PyDiscretizedVesselTree
from .kernels import discretize_vessel_tree as _discretize_vessel_tree
from .labeling import label_branches as _label_branches


def _fit_bspline_contour(
    contour: PyContour, smoothing: float = 0.0, degree: int = 3
) -> PyContour:
    """Closed B-spline refit of a contour (scipy splprep/splev).
    Parity: discretization_map.py:16-84."""
    n = contour.n_points
    if n < degree + 1:
        return contour
    arr = contour.xyz_view()
    try:
        tck, _ = splprep([arr[:, 0], arr[:, 1], arr[:, 2]], s=smoothing, k=degree, per=True)
    except Exception:
        return contour
    u_new = np.linspace(0.0, 1.0, n, endpoint=False)
    xs, ys, zs = splev(u_new, tck)
    coords = np.stack([xs, ys, zs], axis=-1)
    return PyContour.from_arrays(
        contour.id,
        contour.original_frame,
        coords,
        tuple(coords.mean(axis=0)),
        contour.frame_indices.copy(),
        contour.point_indices.copy(),
        contour.aortic_flags.copy(),
        contour.aortic_thickness,
        contour.pulmonary_thickness,
        contour.kind,
    )


def _replace_contours_with_bsplines(
    tree: PyDiscretizedVesselTree, smoothing: float = 0.0, degree: int = 3
) -> PyDiscretizedVesselTree:
    """Parity: discretization_map.py:87-101."""

    def fit(c):
        return _fit_bspline_contour(c, smoothing, degree)

    tree.discretized_aorta = [fit(c) for c in tree.discretized_aorta]
    tree.discretized_rca_main = [fit(c) for c in tree.discretized_rca_main]
    tree.discretized_lca_main = [fit(c) for c in tree.discretized_lca_main]
    tree.rca_branches = [[fit(c) for c in branch] for branch in tree.rca_branches]
    tree.lca_branches = [[fit(c) for c in branch] for branch in tree.lca_branches]
    return tree


def _extract_side_branches(results_dict: dict, prefix: str) -> List[list]:
    branches = []
    i = 1
    while True:
        key = f"{prefix}_side_{i}"
        if key not in results_dict:
            break
        branches.append(results_dict[key])
        i += 1
    return branches


def discretize_vessel_tree(
    ao_cl: PyCenterline,
    rca_cl: PyCenterline,
    lca_cl: PyCenterline,
    results_dict: dict,
    branch_id_rca: int = 0,
    branch_id_lca: int = 0,
    step_size: float = 1.0,
    n_points: int = 100,
    b_spline: bool = False,
    bspline_smoothing: float = 100.0,
    bspline_degree: int = 3,
    control_plot: bool = False,
) -> PyDiscretizedVesselTree:
    """Discretize a full coronary vessel tree from labelled branch points.
    Parity: discretization_map.py:117-209."""
    tree = _discretize_vessel_tree(
        ao_cl,
        rca_cl,
        lca_cl,
        results_dict["aorta_points"],
        results_dict["rca_points_main"],
        results_dict["lca_points_main"],
        _extract_side_branches(results_dict, "rca_points"),
        _extract_side_branches(results_dict, "lca_points"),
        branch_id_rca=branch_id_rca,
        branch_id_lca=branch_id_lca,
        step_size=step_size,
        n_points=n_points,
        calculate_ref_pts=not b_spline,
    )
    if b_spline:
        tree = _replace_contours_with_bsplines(tree, bspline_smoothing, bspline_degree)
        tree.calculate_ref_pts()

    if control_plot:
        from .debug_plots import plot_vessel_tree

        plot_vessel_tree(tree)
    return tree


def prepare_centerlines(
    rca_cl: PyCenterline,
    lca_cl: PyCenterline,
    results_dict: dict,
    branch_sigma: float = 2.0,
    vtp_data: bool = False,
    control_plot: bool = False,
) -> Tuple[PyCenterline, PyCenterline, dict]:
    """Compute branches, validate, and label both coronary centerlines.
    Parity: discretization_map.py:212-291."""
    if vtp_data:
        rca_cl = rca_cl.check_centerline()
        lca_cl = lca_cl.check_centerline()
    else:
        rca_cl = rca_cl.calculate_branches(branch_sigma)
        rca_cl = rca_cl.check_centerline()
        lca_cl = lca_cl.calculate_branches(branch_sigma)
        lca_cl = lca_cl.check_centerline()

    results_dict = _label_branches(rca_cl, results_dict)
    results_dict = _label_branches(lca_cl, results_dict, results_key="lca_points")

    if control_plot:
        from .debug_plots import plot_centerline_branches

        plot_centerline_branches(rca_cl, lca_cl, results_dict)
    return rca_cl, lca_cl, results_dict


def find_sharp_angles(
    cl: PyCenterline,
    branch_id: int,
    cos_threshold: float = 0.0,
    control_plot: bool = False,
) -> List[int]:
    """Parity: discretization_map.py:294-333."""
    positions = cl.find_sharp_angles(branch_id, cos_threshold)
    print(f"Branch {branch_id}: {len(positions)} sharp angle(s) at positions {positions}")
    if control_plot:
        from .debug_plots import plot_sharp_angles

        plot_sharp_angles(cl, branch_id, positions)
    return positions
