"""Debug visualisations for CCTA labeling / discretization.

Parity of surface: ``multimodars/ccta/debug_plots.py`` of the reference
(pyglet/trimesh scenes + plotly figures).  Interactive viewers are not
available in this environment, so every plot function degrades gracefully:
with plotly installed it writes standalone HTML next to the cwd; otherwise
it prints a compact textual summary.  Signatures match the reference so
calling code ports unchanged.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

try:  # optional
    import plotly.graph_objects as go  # type: ignore
except ImportError:
    go = None

_REGION_COLORS = {
    "aorta_points": "yellow",
    "rca_points": "blue",
    "lca_points": "green",
    "rca_removed_points": "red",
    "lca_removed_points": "red",
    "proximal_points": "cyan",
    "distal_points": "magenta",
    "anomalous_points": "orange",
}


def _cl_array(cl) -> np.ndarray:
    return np.array(
        [(p.contour_point.x, p.contour_point.y, p.contour_point.z) for p in cl.points]
    )


def _summarize(name: str, pts) -> str:
    arr = np.asarray(pts, dtype=float).reshape(-1, 3)
    if len(arr) == 0:
        return f"  {name}: 0 points"
    lo = arr.min(axis=0)
    hi = arr.max(axis=0)
    return (
        f"  {name}: {len(arr)} points, bbox "
        f"[{lo[0]:.1f},{lo[1]:.1f},{lo[2]:.1f}] - [{hi[0]:.1f},{hi[1]:.1f},{hi[2]:.1f}]"
    )


def _emit(title: str, traces: Dict[str, np.ndarray], html_name: str) -> None:
    print(f"[{title}]")
    for name, arr in traces.items():
        print(_summarize(name, arr))
    if go is not None:
        fig = go.Figure()
        for name, arr in traces.items():
            arr = np.asarray(arr, dtype=float).reshape(-1, 3)
            if len(arr) == 0:
                continue
            fig.add_trace(
                go.Scatter3d(
                    x=arr[:, 0], y=arr[:, 1], z=arr[:, 2],
                    mode="markers",
                    marker=dict(size=2, color=_REGION_COLORS.get(name)),
                    name=name,
                )
            )
        fig.write_html(html_name)
        print(f"  wrote {html_name}")


def plot_results_key(
    results: dict,
    aorta_points: bool = True,
    rca_points: bool = False,
    lca_points: bool = False,
    rca_removed_points: bool = False,
    proximal_points: bool = False,
    distal_points: bool = False,
    anomalous_points: bool = False,
    cl_rca=None,
    cl_lca=None,
    cl_aorta=None,
):
    """Visualise selected labelled regions (parity: debug_plots.py:34-132)."""
    flags = {
        "aorta_points": aorta_points,
        "rca_points": rca_points,
        "lca_points": lca_points,
        "rca_removed_points": rca_removed_points,
        "proximal_points": proximal_points,
        "distal_points": distal_points,
        "anomalous_points": anomalous_points,
    }
    traces = {
        key: results.get(key, [])
        for key, enabled in flags.items()
        if enabled and results.get(key)
    }
    for name, cl in (("cl_rca", cl_rca), ("cl_lca", cl_lca), ("cl_aorta", cl_aorta)):
        if cl is not None:
            traces[name] = _cl_array(cl)
    _emit("plot_results_key", traces, "plot_results_key.html")


def compare_centerline_scaling(cl_before, cl_after, results: Optional[dict] = None):
    """Parity: debug_plots.py:135-199."""
    traces = {"before": _cl_array(cl_before), "after": _cl_array(cl_after)}
    _emit("compare_centerline_scaling", traces, "compare_centerline_scaling.html")


def plot_vessel_tree(tree):
    """Parity: debug_plots.py:202-304."""
    traces: Dict[str, np.ndarray] = {}

    def stack(contours):
        rows = [c.xyz_view() for c in contours if c.n_points]
        return np.concatenate(rows) if rows else np.zeros((0, 3))

    traces["aorta"] = stack(tree.discretized_aorta)
    traces["rca_main"] = stack(tree.discretized_rca_main)
    traces["lca_main"] = stack(tree.discretized_lca_main)
    for i, branch in enumerate(tree.rca_branches):
        traces[f"rca_side_{i + 1}"] = stack(branch)
    for i, branch in enumerate(tree.lca_branches):
        traces[f"lca_side_{i + 1}"] = stack(branch)
    _emit("plot_vessel_tree", traces, "plot_vessel_tree.html")


def plot_centerline_branches(rca_cl, lca_cl, results_dict: Optional[dict] = None):
    """Parity: debug_plots.py:307-380."""
    traces: Dict[str, np.ndarray] = {}
    for label, cl in (("rca", rca_cl), ("lca", lca_cl)):
        by_branch = defaultdict(list)
        for p in cl.points:
            by_branch[p.branch_id].append(
                (p.contour_point.x, p.contour_point.y, p.contour_point.z)
            )
        for bid, pts in by_branch.items():
            traces[f"{label}_branch_{bid}"] = np.array(pts)
    if results_dict:
        for key in ("rca_points_main", "lca_points_main"):
            if results_dict.get(key):
                traces[key] = np.asarray(results_dict[key])
    _emit("plot_centerline_branches", traces, "plot_centerline_branches.html")


def plot_centerline_edges(cl, results: Optional[dict] = None):
    """Parity: debug_plots.py:383-432."""
    _emit("plot_centerline_edges", {"centerline": _cl_array(cl)}, "plot_centerline_edges.html")


def plot_sharp_angles(cl, branch_id: int, positions: List[int]):
    """Parity: debug_plots.py:435-495."""
    branch = cl.get_branch(branch_id)
    pos = _cl_array(branch)
    traces = {"branch": pos}
    if positions:
        traces["sharp_angles"] = pos[np.asarray(positions, dtype=int)]
    _emit("plot_sharp_angles", traces, "plot_sharp_angles.html")
