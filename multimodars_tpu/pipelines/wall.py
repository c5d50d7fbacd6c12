"""Vessel-wall contour synthesis.

Parity: ``src/intravascular/processing/wall.rs`` of the reference.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ..models.contour import PyContour
from ..models.frame import PyFrame
from ..models.point import PyContourPoint


def offset_contour(
    contour: PyContour,
    distance: float,
    point_range: Optional[Tuple[int, int]] = None,
) -> PyContour:
    """Offset every point radially away from the (recomputed) centroid by
    ``distance``; an optional inclusive point_index range limits the offset.
    Parity: wall.rs:52-100."""
    out = contour.copy()
    out.compute_centroid()
    cx, cy, cz = out.centroid
    for p in out.points:
        if point_range is not None and not (point_range[0] <= p.point_index <= point_range[1]):
            continue
        dx = p.x - cx
        dy = p.y - cy
        dz = p.z - cz
        length = math.sqrt(dx * dx + dy * dy + dz * dz)
        if length > np.finfo(np.float64).eps:
            p.x += dx / length * distance
            p.y += dy / length * distance
            p.z += dz / length * distance
    out.kind = "Wall"
    return out


def create_aortic_wall(contour: PyContour) -> PyContour:
    """Composite wall for aortic-adjacent (anomalous) vessels: offset lumen
    half on the coronary side + rectangular aortic-thickness profile.
    Parity: wall.rs:109-213."""
    n = len(contour.points)
    first_quarter = n // 4
    half = n // 2
    third_quarter = first_quarter * 3

    ref_pt = contour.points[third_quarter]
    thickness = contour.aortic_thickness
    assert thickness is not None, "aortic_thickness must be present for this contour"
    outer_x = ref_pt.x + thickness
    z = ref_pt.z

    up_mid = (contour.points[0].x, contour.points[0].y + 1.0)
    up_right = (outer_x, up_mid[1])
    low_mid = (contour.points[half].x, contour.points[half].y - 1.0)
    low_right = (outer_x, low_mid[1])

    dist_up = abs(up_right[0] - up_mid[0])
    dist_right = abs(up_right[1] - low_right[1])
    dist_low = abs(low_right[0] - low_mid[0])
    total_dist = dist_up + dist_right + dist_low

    n_points_up = int(round(dist_up / total_dist * half))
    n_points_mid = int(round(dist_right / total_dist * half))
    n_points_low = half - n_points_up - n_points_mid
    total = n_points_up + n_points_mid + n_points_low
    if total != half:
        n_points_low += half - total

    right_points: List[Tuple[float, float]] = []
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(n_points_low):
            t = np.float64(i) / np.float64(n_points_low - 1)
            x = low_mid[0] + t * (low_right[0] - low_mid[0])
            right_points.append((float(x), low_mid[1]))
        for i in range(n_points_mid):
            t = np.float64(i) / np.float64(n_points_mid - 1)
            y = low_right[1] + t * (up_right[1] - low_right[1])
            right_points.append((low_right[0], float(y)))
        for i in range(n_points_up):
            t = np.float64(i) / np.float64(max(n_points_up, 1) - 1)
            x = up_right[0] - t * (up_right[0] - up_mid[0])
            right_points.append((float(x), up_right[1]))

    left_wall = offset_contour(contour, 1.0, (0, half)).points
    if len(left_wall) % 2 != 0:
        left_wall = left_wall[: half + 1]
    else:
        left_wall = left_wall[:half]
    left_len = len(left_wall)

    right_wall: List[PyContourPoint] = []
    for i, (x, y) in enumerate(right_points):
        src_index = left_len + i
        assert src_index < n, f"Index out of bounds: {src_index} >= {n}"
        src = contour.points[src_index]
        right_wall.append(
            PyContourPoint(src.frame_index, src.point_index, x, y, z, src.aortic)
        )

    return PyContour(
        contour.id,
        contour.original_frame,
        left_wall + right_wall,
        contour.centroid,
        contour.aortic_thickness,
        contour.pulmonary_thickness,
        "Wall",
    )


def _create_wall_contour_aortic_only(contour: PyContour) -> PyContour:
    if contour.aortic_thickness is None:
        return offset_contour(contour, 1.0, None)
    return create_aortic_wall(contour)


def create_wall_frames(
    frames: List[PyFrame], anomalous: bool, with_pulmonary: bool = False
) -> List[PyFrame]:
    """Add a Wall contour to every frame.  Parity: wall.rs:7-34."""
    if with_pulmonary:
        raise NotImplementedError("pulmonary wall synthesis not yet implemented")
    out: List[PyFrame] = []
    for frame in frames:
        if anomalous or "Eem" not in frame.extras:
            wall = _create_wall_contour_aortic_only(frame.lumen)
        else:
            wall = _create_wall_contour_aortic_only(frame.extras["Eem"])
        new_frame = frame.copy()
        new_frame.extras["Wall"] = wall
        out.append(new_frame)
    return out
