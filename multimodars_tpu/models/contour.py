"""Closed 3-D contours and their geometric primitives.

Parity: ``src/types/native/contour.rs`` (ops) and
``src/types/binding/py_contour.rs`` (Python surface) of the reference.

The per-contour primitives here are vectorised host-side numpy in float64:
they are O(n..n^2) on ~500-point contours, called from Python object code, and
the reference computes them in f64.  The *batched* versions used inside the
TPU pipelines live in :mod:`multimodars_tpu.ops.contour_ops`.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .point import PyContourPoint, PyContourType, CONTOUR_TYPE_NAMES


def downsample_contour_points(
    points: Sequence[PyContourPoint], n: int
) -> List[PyContourPoint]:
    """Up-to-``n`` evenly strided samples, preserving order.

    Parity: ``downsample_contour_points`` (contour.rs:47-58).
    """
    m = len(points)
    if m <= n:
        return list(points)
    step = m / n
    return [points[int(i * step)] for i in range(n)]


def downsample_indices(m: int, n: int) -> np.ndarray:
    """Index form of :func:`downsample_contour_points` for array pipelines."""
    if m <= n:
        return np.arange(m)
    step = m / n
    return (np.arange(n) * step).astype(np.int64)


def _xyz(points: Sequence[PyContourPoint]) -> np.ndarray:
    out = np.empty((len(points), 3), dtype=np.float64)
    for i, p in enumerate(points):
        out[i, 0] = p.x
        out[i, 1] = p.y
        out[i, 2] = p.z
    return out


def polygon_area_3d(xyz: np.ndarray) -> float:
    """Area of a closed 3-D polygon: half the norm of the summed cross
    products over consecutive edges (contour.rs:345-362)."""
    n = xyz.shape[0]
    if n < 3:
        return 0.0
    nxt = np.roll(xyz, -1, axis=0)
    cross = np.cross(xyz, nxt)
    total = cross.sum(axis=0)
    return 0.5 * float(np.sqrt((total * total).sum()))


def farthest_pair(xyz: np.ndarray) -> Tuple[int, int, float]:
    """Indices and distance of the farthest point pair (3-D, O(n^2)).

    Ties resolve to the first (i, j) in i-outer / j-inner scan order with a
    strictly-greater comparison, matching contour.rs:227-242.
    """
    n = xyz.shape[0]
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(n, k=1)
    vals = d2[iu]
    if vals.size == 0:
        return 0, 0, 0.0
    k = int(np.argmax(vals))
    return int(iu[0][k]), int(iu[1][k]), float(math.sqrt(vals[k]))


def closest_opposite(xyz: np.ndarray, centroid_xy: Optional[Tuple[float, float]] = None):
    """Minimum 2-D chord between angularly opposite points.

    For each point i, find j whose angular separation about the centroid best
    approximates pi, then keep the (i, j) pair with the smallest 2-D distance.
    Parity: contour.rs:247-309 (first-wins tie-breaking on both argmins).
    """
    n = xyz.shape[0]
    assert n > 2, "Need at least 3 points"
    if centroid_xy is None:
        cx = float(xyz[:, 0].mean())
        cy = float(xyz[:, 1].mean())
    else:
        cx, cy = centroid_xy
    thetas = np.arctan2(xyz[:, 1] - cy, xyz[:, 0] - cx)
    thetas = np.where(thetas < 0.0, thetas + 2.0 * math.pi, thetas)

    delta = np.abs(thetas[None, :] - thetas[:, None])
    delta = np.where(delta > math.pi, 2.0 * math.pi - delta, delta)
    diff = np.abs(delta - math.pi)
    np.fill_diagonal(diff, np.inf)
    best_j = np.argmin(diff, axis=1)

    dx = xyz[np.arange(n), 0] - xyz[best_j, 0]
    dy = xyz[np.arange(n), 1] - xyz[best_j, 1]
    dist = np.sqrt(dx * dx + dy * dy)
    i = int(np.argmin(dist))
    return i, int(best_j[i]), float(dist[i])


def closest_opposite_3d(xyz: np.ndarray) -> Tuple[int, int, float]:
    """Minimum 3-D chord pairing each point with the one at index i + n/2.

    Parity: contour.rs:313-333 (strictly-less, first wins).
    """
    n = xyz.shape[0]
    assert n > 2, "Need at least 3 points"
    half = n // 2
    j = (np.arange(n) + half) % n
    d = np.sqrt(((xyz - xyz[j]) ** 2).sum(-1))
    i = int(np.argmin(d))
    return i, int(j[i]), float(d[i])


def elliptic_ratio(xyz: np.ndarray) -> float:
    major = farthest_pair(xyz)[2]
    minor = closest_opposite_3d(xyz)[2]
    if major < minor:
        return minor / major
    return major / minor


def ccw_sort_order(xy: np.ndarray) -> np.ndarray:
    """Permutation sorting points by ascending angle about the centroid, then
    rotated so the highest-Y point lands at index 0.

    Parity: ``Contour::sort_contour_points`` (contour.rs:368-405): stable sort
    by angle; Rust ``max_by`` keeps the *last* of equal maxima.
    """
    n = xy.shape[0]
    if n == 0:
        return np.arange(0)
    cx = xy[:, 0].mean()
    cy = xy[:, 1].mean()
    ang = np.arctan2(xy[:, 1] - cy, xy[:, 0] - cx)
    order = np.argsort(ang, kind="stable")
    y_sorted = xy[order, 1]
    start = n - 1 - int(np.argmax(y_sorted[::-1]))  # last max, like Rust max_by
    return np.roll(order, -start)


class PyContour:
    """A closed 3-D contour of ordered contour points.

    Attributes mirror the reference binding: id, original_frame, points,
    centroid, aortic_thickness, pulmonary_thickness, kind (string).
    """

    __slots__ = (
        "id",
        "original_frame",
        "points",
        "centroid",
        "aortic_thickness",
        "pulmonary_thickness",
        "kind",
    )

    def __init__(
        self,
        id: int,
        original_frame: int,
        points: List[PyContourPoint],
        centroid: Tuple[float, float, float],
        aortic_thickness: Optional[float] = None,
        pulmonary_thickness: Optional[float] = None,
        kind: str = "Lumen",
    ) -> None:
        if kind not in CONTOUR_TYPE_NAMES:
            # accept PyContourType too
            if isinstance(kind, PyContourType):
                kind = kind.name
            else:
                raise ValueError(f"Unknown contour type: {kind}")
        self.id = int(id)
        self.original_frame = int(original_frame)
        self.points = list(points)
        self.centroid = tuple(float(c) for c in centroid)
        self.aortic_thickness = aortic_thickness
        self.pulmonary_thickness = pulmonary_thickness
        self.kind = kind

    # -- array bridges -----------------------------------------------------
    def xyz(self) -> np.ndarray:
        return _xyz(self.points)

    def set_xyz(self, xyz: np.ndarray) -> None:
        for p, row in zip(self.points, xyz):
            p.x = float(row[0])
            p.y = float(row[1])
            p.z = float(row[2])

    def copy(self) -> "PyContour":
        return PyContour(
            self.id,
            self.original_frame,
            [p.copy() for p in self.points],
            self.centroid,
            self.aortic_thickness,
            self.pulmonary_thickness,
            self.kind,
        )

    # -- API surface -------------------------------------------------------
    def __len__(self) -> int:
        return len(self.points)

    def __repr__(self) -> str:
        return (
            f"Contour(id={self.id}, frame={self.original_frame}, "
            f"points={len(self.points)}, centroid=({self.centroid[0]:.2f}, "
            f"{self.centroid[1]:.2f}, {self.centroid[2]:.2f}), kind={self.kind})"
        )

    def compute_centroid(self) -> None:
        if not self.points:
            self.centroid = (0.0, 0.0, 0.0)
            return
        xyz = self.xyz()
        self.centroid = (
            float(xyz[:, 0].mean()),
            float(xyz[:, 1].mean()),
            float(xyz[:, 2].mean()),
        )

    def points_as_tuples(self) -> List[Tuple[float, float, float]]:
        return [(p.x, p.y, p.z) for p in self.points]

    def find_farthest_points(self):
        i, j, dist = farthest_pair(self.xyz())
        return (self.points[i].copy(), self.points[j].copy()), dist

    def find_closest_opposite(self):
        cxy = None
        if self.centroid is not None:
            cxy = (self.centroid[0], self.centroid[1])
        i, j, dist = closest_opposite(self.xyz(), cxy)
        return (self.points[i].copy(), self.points[j].copy()), dist

    def find_closest_opposite_3d(self):
        i, j, dist = closest_opposite_3d(self.xyz())
        return (self.points[i].copy(), self.points[j].copy()), dist

    def get_elliptic_ratio(self) -> float:
        return elliptic_ratio(self.xyz())

    def get_area(self) -> float:
        return polygon_area_3d(self.xyz())

    def rotate(self, angle_deg: float) -> "PyContour":
        """Rotate around the contour's own (recomputed) centroid, degrees."""
        out = self.copy()
        out.compute_centroid()
        cx, cy, _ = out.centroid
        angle = math.radians(angle_deg)
        out.rotate_rad_inplace(angle, (cx, cy))
        return out

    def rotate_rad_inplace(self, angle_rad: float, center: Tuple[float, float]) -> None:
        if angle_rad == 0.0 or not self.points:
            return
        xyz = self.xyz()
        cx, cy = center
        c = math.cos(angle_rad)
        s = math.sin(angle_rad)
        x = xyz[:, 0] - cx
        y = xyz[:, 1] - cy
        xyz[:, 0] = x * c - y * s + cx
        xyz[:, 1] = x * s + y * c + cy
        self.set_xyz(xyz)

    def translate(self, dx: float, dy: float, dz: float) -> "PyContour":
        out = self.copy()
        for p in out.points:
            p.x += dx
            p.y += dy
            p.z += dz
        return out

    def sort_contour_points(self) -> "PyContour":
        out = self.copy()
        out.sort_contour_points_inplace()
        return out

    def sort_contour_points_inplace(self) -> None:
        if not self.points:
            return
        xyz = self.xyz()
        order = ccw_sort_order(xyz[:, :2])
        self.points = [self.points[k] for k in order]
        for i, p in enumerate(self.points):
            p.point_index = i

    def rotate_and_reindex(self, shift: int) -> None:
        n = len(self.points)
        if n == 0 or shift == 0:
            return
        shift = shift % n
        self.points = self.points[shift:] + self.points[:shift]
        for i, p in enumerate(self.points):
            p.point_index = i
