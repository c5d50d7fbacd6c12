"""Vessel discretization parity tests, mirroring the reference's Rust unit
tests (src/ccta/discretizing/resampling.rs:230-460 and projecting.rs)."""

import math

import numpy as np
import pytest

from multimodars_tpu.ccta.kernels import (
    _has_full_angular_coverage,
    create_uniform_contours,
    walk_centerline_slices,
)
from multimodars_tpu.models.centerline import PyCenterline, PyCenterlinePoint
from multimodars_tpu.models.contour import PyContour
from multimodars_tpu.models.point import PyContourPoint


def _contour(id_, coords, centroid):
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 3)
    n = len(coords)
    return PyContour.from_arrays(
        id_, id_, coords, centroid,
        np.zeros(n, dtype=np.int64), np.zeros(n, dtype=np.int64),
        np.zeros(n, dtype=bool), None, None, "Lumen",
    )


def _circle(center, radius, n, plane="xy"):
    a = 2 * math.pi * np.arange(n) / n
    if plane == "xy":
        return np.stack(
            [center[0] + radius * np.cos(a), center[1] + radius * np.sin(a),
             np.full(n, center[2])], -1
        )
    # xz plane (tilted test)
    return np.stack(
        [radius * np.cos(a), np.zeros(n), radius * np.sin(a)], -1
    )


def _half_circle(radius, n):
    a = math.pi * np.arange(n) / (n - 1)
    return np.stack([radius * np.cos(a), radius * np.sin(a), np.zeros(n)], -1)


class TestAngularCoverage:
    def test_empty_contour(self):
        assert not _has_full_angular_coverage(_contour(0, np.zeros((0, 3)), (0, 0, 0)))

    def test_fewer_than_four_points(self):
        assert not _has_full_angular_coverage(
            _contour(0, _circle((0, 0, 0), 3.0, 3), (0, 0, 0))
        )

    def test_half_circle_missing(self):
        assert not _has_full_angular_coverage(
            _contour(0, _half_circle(3.0, 10), (0, 0, 0))
        )

    def test_full_circle(self):
        assert _has_full_angular_coverage(
            _contour(0, _circle((0, 0, 0), 3.0, 16), (0, 0, 0))
        )

    def test_full_circle_tilted_plane(self):
        assert _has_full_angular_coverage(
            _contour(0, _circle((0, 0, 0), 3.0, 16, plane="xz"), (0, 0, 0))
        )


class TestCreateUniformContours:
    def test_empty_contours_removed(self):
        out = create_uniform_contours(
            [
                _contour(0, np.zeros((0, 3)), (0, 0, 0)),
                _contour(1, _circle((0, 0, 0), 3.0, 16), (0, 0, 0)),
            ],
            50,
        )
        assert len(out) == 1

    def test_half_circle_contours_removed(self):
        out = create_uniform_contours(
            [
                _contour(0, _half_circle(3.0, 12), (0, 0, 0)),
                _contour(1, _circle((0, 0, 0), 3.0, 16), (0, 0, 0)),
            ],
            50,
        )
        assert len(out) == 1

    @pytest.mark.parametrize("n", [8, 50, 200])
    def test_output_has_exact_n_points(self, n):
        out = create_uniform_contours(
            [_contour(0, _circle((0, 0, 0), 3.0, 20), (0, 0, 0))], n
        )
        assert out[0].n_points == n

    def test_contour_metadata_preserved(self):
        out = create_uniform_contours(
            [_contour(7, _circle((1, 2, 3), 3.0, 16), (1.0, 2.0, 3.0))], 50
        )
        assert out[0].id == 7
        assert out[0].centroid == (1.0, 2.0, 3.0)
        assert out[0].kind == "Lumen"

    def test_resampled_points_close_to_input_circle(self):
        out = create_uniform_contours(
            [_contour(0, _circle((0, 0, 0), 5.0, 24), (0, 0, 0))], 200
        )
        r = np.linalg.norm(out[0].xyz_view(), axis=1)
        assert (np.abs(r - 5.0) < 0.05).all()

    def test_resampled_points_lie_on_input_plane(self):
        out = create_uniform_contours(
            [_contour(0, _circle((0, 0, 4.0), 3.0, 20), (0, 0, 4.0))], 100
        )
        assert (np.abs(out[0].xyz_view()[:, 2] - 4.0) < 1e-10).all()

    def test_point_indices_are_sequential(self):
        out = create_uniform_contours(
            [_contour(0, _circle((0, 0, 0), 3.0, 16), (0, 0, 0))], 50
        )
        np.testing.assert_array_equal(out[0].point_indices, np.arange(50))
        np.testing.assert_array_equal(out[0].frame_indices, np.zeros(50))

    def test_multiple_contours_pipeline(self):
        # 3 full circles + 1 empty + 1 interior half-circle -> 4 kept
        # (interior partial slices are preserved to avoid wall holes)
        contours = [
            _contour(0, _circle((0, 0, 0), 3.0, 16), (0, 0, 0)),
            _contour(1, np.zeros((0, 3)), (0, 0, 1.0)),
            _contour(2, _circle((0, 0, 2.0), 3.0, 16), (0, 0, 2.0)),
            _contour(3, _half_circle(3.0, 10), (0, 0, 0)),
            _contour(4, _circle((0, 0, 4.0), 3.0, 16), (0, 0, 4.0)),
        ]
        out = create_uniform_contours(contours, 100)
        assert len(out) == 4
        assert all(c.n_points == 100 for c in out)


class TestWalkCenterlineSlices:
    def _straight_cl(self, n=11, spacing=1.0):
        pts = []
        for i in range(n):
            cp = PyContourPoint(0, i, 0.0, 0.0, i * spacing, False)
            pts.append(PyCenterlinePoint(cp, (0.0, 0.0, 1.0)))
        return PyCenterline(pts)

    def _cloud_around(self, cl_z, radius=2.0, n_ring=12):
        rows = []
        for z in cl_z:
            a = 2 * math.pi * np.arange(n_ring) / n_ring
            for k in range(n_ring):
                rows.append(
                    (radius * math.cos(a[k]), radius * math.sin(a[k]), z + 0.01 * math.sin(k))
                )
        return rows

    def test_walk_straight_step_equals_spacing(self):
        cl = self._straight_cl(11, 1.0)
        pts = self._cloud_around(np.arange(11, dtype=float))
        slices = walk_centerline_slices(cl, pts, 0, step_size=1.0)
        # ~one slice per centerline point
        assert 9 <= len(slices) <= 12

    def test_walk_coarser_step_fewer_slices(self):
        cl = self._straight_cl(11, 1.0)
        pts = self._cloud_around(np.arange(11, dtype=float))
        fine = walk_centerline_slices(cl, pts, 0, step_size=1.0)
        coarse = walk_centerline_slices(cl, pts, 0, step_size=2.0)
        assert len(coarse) < len(fine)

    def test_walk_finer_step_more_slices(self):
        cl = self._straight_cl(11, 1.0)
        pts = self._cloud_around(np.arange(11, dtype=float))
        fine = walk_centerline_slices(cl, pts, 0, step_size=0.5)
        base = walk_centerline_slices(cl, pts, 0, step_size=1.0)
        assert len(fine) > len(base)

    def test_straight_centerline_removes_z_jitter(self):
        # points projected onto each slice plane lose their z jitter
        cl = self._straight_cl(11, 1.0)
        pts = self._cloud_around(np.arange(11, dtype=float))
        slices = walk_centerline_slices(cl, pts, 0, step_size=1.0)
        for contour in slices:
            z = contour.xyz_view()[:, 2]
            if len(z):
                assert z.std() < 0.02  # jitter (0.01 amplitude) flattened

    def test_voronoi_no_cross_contamination(self):
        # projecting.rs:427-457 — two rings at z=0 and z=20 on a straight
        # centerline must land in separate slices
        cl = PyCenterline(
            [
                PyCenterlinePoint(PyContourPoint(0, 0, 0.0, 0.0, 0.0, False), (0.0, 0.0, 1.0)),
                PyCenterlinePoint(PyContourPoint(0, 1, 0.0, 0.0, 20.0, False), (0.0, 0.0, 1.0)),
            ]
        )
        cloud = self._cloud_around([0.0], radius=3.0, n_ring=8)
        cloud += self._cloud_around([20.0], radius=3.0, n_ring=8)
        slices = walk_centerline_slices(cl, cloud, 0, step_size=20.0)
        assert len(slices) == 2
        for p in slices[0].xyz_view():
            assert abs(p[2]) < 1.0
        for p in slices[1].xyz_view():
            assert abs(p[2] - 20.0) < 1.0

    def _arc_cl(self, n=8, r=10.0):
        # quarter circle in the xz plane with analytic tangents
        pts = []
        for i in range(n):
            t = (math.pi / 2.0) * i / (n - 1)
            cp = PyContourPoint(0, i, r * math.cos(t), 0.0, r * math.sin(t), False)
            pts.append(PyCenterlinePoint(cp, (-math.sin(t), 0.0, math.cos(t))))
        return pts

    def test_walk_curved_centerline_points_on_planes(self):
        # projecting.rs:459-520 — slices of a curved centerline contain only
        # points lying exactly on their own anchor's perpendicular plane
        n, r, step = 8, 10.0, 2.0
        cl_pts = self._arc_cl(n, r)
        cl = PyCenterline(cl_pts)
        rng = np.random.default_rng(31)
        cloud = []
        for p in cl_pts:
            c = p.contour_point
            ring = np.asarray(self._cloud_around([0.0], radius=2.0, n_ring=7))
            ring += rng.uniform(-0.3, 0.3, ring.shape)
            cloud += [(x + c.x, y + c.y, z + c.z) for x, y, z in ring]
        slices = walk_centerline_slices(cl, cloud, 0, step_size=step)

        # expected anchor count: floor(arc / step) + 1
        pos = np.array([[p.contour_point.x, p.contour_point.y, p.contour_point.z] for p in cl_pts])
        tan = np.array([p.tangent for p in cl_pts])
        seg = np.linalg.norm(np.diff(pos, axis=0), axis=1)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        total = float(cum[-1])
        expected = int(total // step) + 1
        assert len(slices) == expected

        # recompute the anchors with the same arc-length interpolation and
        # assert every projected point sits on its anchor plane
        for k, contour in enumerate(slices):
            target = k * step
            si = min(max(int(np.searchsorted(cum, target, side="right")) - 1, 0), len(pos) - 2)
            t = (target - cum[si]) / (cum[si + 1] - cum[si])
            a_pos = pos[si] + t * (pos[si + 1] - pos[si])
            a_tan = tan[si] * (1 - t) + tan[si + 1] * t
            a_tan /= np.linalg.norm(a_tan)
            xyz = contour.xyz_view()
            assert len(xyz) > 0
            d = (xyz - a_pos) @ a_tan
            assert np.abs(d).max() < 1e-9


class TestPlaneProjection:
    """Projection properties through the walk's single-anchor case
    (projecting.rs:299-341)."""

    def _single_anchor_cl(self, origin, tangent, length=20.0):
        t = np.asarray(tangent, dtype=float)
        t /= np.linalg.norm(t)
        p1 = np.asarray(origin, dtype=float) + length * t
        return PyCenterline(
            [
                PyCenterlinePoint(
                    PyContourPoint(0, 0, origin[0], origin[1], origin[2], False), tuple(t)
                ),
                PyCenterlinePoint(PyContourPoint(0, 1, p1[0], p1[1], p1[2], False), tuple(t)),
            ]
        )

    def test_projection_is_idempotent(self):
        # projecting.rs:299-309 — projecting an already-projected cloud again
        # leaves every point unchanged
        cl = self._single_anchor_cl((1.0, 2.0, 3.0), (1.0, 1.0, 1.0))
        cloud = [(4.0, 5.0, 7.0), (0.0, -2.0, 9.0), (1.5, 2.5, 3.5)]
        once = walk_centerline_slices(cl, cloud, 0, step_size=100.0)[0].xyz_view()
        twice = walk_centerline_slices(
            cl, [tuple(p) for p in once], 0, step_size=100.0
        )[0].xyz_view()
        assert np.abs(once - twice).max() < 1e-10

    def test_tilted_normal_projection(self):
        # projecting.rs:325-341 — every projected point lies on the plane of
        # a 45-degree-tilted anchor normal
        sq2 = math.sqrt(2.0) / 2.0
        tangent = np.array([sq2, 0.0, sq2])
        cl = self._single_anchor_cl((0.0, 0.0, 0.0), tangent)
        cloud = [
            (1.0, 0.0, 1.0),
            (-1.0, 0.0, -1.0),
            (0.0, 2.0, 0.0),
            (1.0, -1.5, 0.5),
            (0.5, 0.5, -0.5),
        ]
        proj = walk_centerline_slices(cl, cloud, 0, step_size=100.0)[0].xyz_view()
        assert len(proj) == len(cloud)
        dist = proj @ tangent  # plane passes through the origin
        assert np.abs(dist).max() < 1e-10
