"""Centerline registration tests mirroring the reference's
tests/test_intravascular.py (align_three_point / align_manual /
calculate_branches)."""

from pathlib import Path

import math

import numpy as np
import pytest

from multimodars import (
    PyGeometry,
    PyGeometryPair,
    align_manual,
    align_three_point,
    numpy_to_centerline,
    numpy_to_geometry,
)

FIXTURES = Path(__file__).resolve().parent / "data" / "fixtures"
EXAMPLES = Path("/root/reference/examples/data")

AORTIC_REF_PT = (12.2605, -201.3643, 1751.0554)
UPPER_REF_PT = (11.7567, -202.1920, 1754.7975)
LOWER_REF_PT = (15.6605, -202.1920, 1749.9655)


def _geom_to_points_array(geom):
    rows = []
    for frame in geom.frames:
        for pt in frame.lumen.points:
            rows.append((pt.x, pt.y, pt.z))
    return np.array(rows, dtype=float)


@pytest.fixture(scope="module")
def geom_a():
    if not FIXTURES.exists():
        pytest.skip("fixtures not mounted")
    raw = np.genfromtxt(FIXTURES / "idealized_geometry/diastolic_contours.csv", delimiter=",")
    ref = np.genfromtxt(
        FIXTURES / "idealized_geometry/diastolic_reference_points.csv", delimiter=","
    )
    return numpy_to_geometry(
        lumen_arr=raw, catheter_arr=np.zeros((0, 4)), wall_arr=np.zeros((0, 4)),
        reference_arr=ref,
    )


@pytest.fixture(scope="module")
def geom_b():
    if not FIXTURES.exists():
        pytest.skip("fixtures not mounted")
    raw = np.genfromtxt(FIXTURES / "idealized_geometry/systolic_contours.csv", delimiter=",")
    ref = np.genfromtxt(
        FIXTURES / "idealized_geometry/systolic_reference_points.csv", delimiter=","
    )
    return numpy_to_geometry(
        lumen_arr=raw, catheter_arr=np.zeros((0, 4)), wall_arr=np.zeros((0, 4)),
        reference_arr=ref,
    )


@pytest.fixture(scope="module")
def geometry_pair(geom_a, geom_b):
    return PyGeometryPair(geom_a=geom_a, geom_b=geom_b, label="test")


@pytest.fixture(scope="module")
def centerline():
    if not EXAMPLES.exists():
        pytest.skip("examples not mounted")
    arr = np.genfromtxt(EXAMPLES / "centerline_raw.csv", delimiter=",")
    return numpy_to_centerline(arr)


class TestAlignThreePoint:
    def test_pair_returns_geometry_pair(self, centerline, geometry_pair):
        result, _ = align_three_point(
            centerline, geometry_pair, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT,
            write=False,
        )
        assert isinstance(result, PyGeometryPair)

    def test_single_returns_geometry(self, centerline, geom_a):
        result, _ = align_three_point(
            centerline, geom_a, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT, write=False
        )
        assert isinstance(result, PyGeometry)

    def test_pair_geom_a_matches_single(self, centerline, geom_a, geometry_pair):
        result_pair, _ = align_three_point(
            centerline, geometry_pair, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT,
            write=False,
        )
        result_geom, _ = align_three_point(
            centerline, geom_a, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT, write=False
        )
        np.testing.assert_allclose(
            _geom_to_points_array(result_pair.geom_a),
            _geom_to_points_array(result_geom),
            atol=1e-10,
        )

    def test_geometry_lands_on_centerline(self, centerline, geom_a):
        """After alignment every frame centroid sits on its centerline
        sample (z-monotone along the vessel)."""
        result, cl = align_three_point(
            centerline, geom_a, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT, write=False
        )
        cl_ref_idx = cl.find_reference_cl_point_idx(AORTIC_REF_PT)
        for i, frame in enumerate(result.frames):
            cp = cl.points[cl_ref_idx + i].contour_point
            assert abs(frame.centroid[0] - cp.x) < 1e-6
            assert abs(frame.centroid[1] - cp.y) < 1e-6
            assert abs(frame.centroid[2] - cp.z) < 1e-6

    def test_frame_count_preserved(self, centerline, geom_a):
        n = len(geom_a.frames)
        result, _ = align_three_point(
            centerline, geom_a, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT, write=False
        )
        assert len(result.frames) == n


class TestAlignManual:
    def test_pair_returns_geometry_pair(self, centerline, geometry_pair):
        result, _ = align_manual(
            centerline, geometry_pair, rotation_angle=286.0, ref_point=AORTIC_REF_PT,
            write=False,
        )
        assert isinstance(result, PyGeometryPair)

    def test_pair_geom_a_matches_single(self, centerline, geom_a, geometry_pair):
        result_pair, _ = align_manual(
            centerline, geometry_pair, rotation_angle=286.0, ref_point=AORTIC_REF_PT,
            write=False,
        )
        result_geom, _ = align_manual(
            centerline, geom_a, rotation_angle=286.0, ref_point=AORTIC_REF_PT,
            write=False,
        )
        np.testing.assert_allclose(
            _geom_to_points_array(result_pair.geom_a),
            _geom_to_points_array(result_geom),
            atol=1e-10,
        )


@pytest.fixture(scope="module")
def rca_centerline():
    if not EXAMPLES.exists():
        pytest.skip("examples not mounted")
    raw = np.genfromtxt(EXAMPLES / "centerline_rca_short.csv", delimiter=",")
    return numpy_to_centerline(raw)


class TestCalculateBranches:
    def test_branch_count(self, rca_centerline):
        cl = rca_centerline.calculate_branches(2.0)
        assert len(cl.branch_start_indices) == 4

    def test_main_branch_is_largest(self, rca_centerline):
        cl = rca_centerline.calculate_branches(2.0)
        counts = {}
        for p in cl.points:
            counts[p.branch_id] = counts.get(p.branch_id, 0) + 1
        assert counts[0] == max(counts.values())

    def test_posterolateral_in_main_branch(self, rca_centerline):
        cl = rca_centerline.calculate_branches(2.0)
        main_frames = {p.contour_point.frame_index for p in cl.points if p.branch_id == 0}
        for row in range(463, 639):
            assert row in main_frames

    def test_acute_marginal_is_side_branch(self, rca_centerline):
        cl = rca_centerline.calculate_branches(2.0)
        for p in cl.points:
            if p.contour_point.frame_index <= 130:
                assert p.branch_id != 0

    def test_pda_is_single_side_branch(self, rca_centerline):
        cl = rca_centerline.calculate_branches(2.0)
        pda_ids = {p.branch_id for p in cl.points if 639 <= p.contour_point.frame_index <= 669}
        assert len(pda_ids) == 1
        assert 0 not in pda_ids

    def test_immutability(self, rca_centerline):
        before = [p.branch_id for p in rca_centerline.points]
        _ = rca_centerline.calculate_branches(2.0)
        assert [p.branch_id for p in rca_centerline.points] == before


class TestAlignCombined:
    def test_combined_runs_and_refines(self, centerline, geom_a):
        from multimodars import align_combined

        # synthetic CCTA cloud: the aligned geometry's own points, so the
        # refinement has a meaningful target
        aligned, cl = align_three_point(
            centerline, geom_a, AORTIC_REF_PT, UPPER_REF_PT, LOWER_REF_PT, write=False
        )
        cloud = _geom_to_points_array(aligned)[::5]
        result, cl2 = align_combined(
            centerline,
            geom_a,
            AORTIC_REF_PT,
            UPPER_REF_PT,
            LOWER_REF_PT,
            [tuple(p) for p in cloud],
            angle_step_deg=2.0,
            angle_range_deg=6.0,
            index_range=1,
            write=False,
        )
        assert isinstance(result, PyGeometry)
        assert len(result.frames) == len(geom_a.frames)
        # refined result should land close to the three-point alignment
        d = np.abs(_geom_to_points_array(result) - _geom_to_points_array(aligned))
        assert float(np.median(d)) < 2.0


class TestPreprocessCenterline:
    """Parity with the reference's preprocessing unit tests
    (centerline_align/preprocessing.rs:283-600)."""

    def _cl(self, zs, branch=0):
        from multimodars_tpu.models.centerline import (
            PyCenterline,
            PyCenterlinePoint,
        )
        from multimodars_tpu.models.point import PyContourPoint

        pts = []
        for i, z in enumerate(zs):
            p = PyCenterlinePoint(
                PyContourPoint(i, i, 0.0, 0.0, float(z), False), (0.0, 0.0, -1.0)
            )
            p.branch_id = branch
            pts.append(p)
        return PyCenterline(pts)

    def _mesh(self, zs):
        from multimodars_tpu.models.contour import PyContour
        from multimodars_tpu.models.frame import PyFrame
        from multimodars_tpu.models.geometry import PyGeometry

        frames = []
        for i, z in enumerate(zs):
            coords = np.array([[1.0, 0.0, z], [0.0, 1.0, z], [-1.0, 0.0, z]])
            lumen = PyContour.from_arrays(
                i, i, coords, (0.0, 0.3333333333333333, z),
                np.full(3, i, dtype=np.int64), np.arange(3, dtype=np.int64),
                np.zeros(3, dtype=bool), None, None, "Lumen",
            )
            frames.append(PyFrame(i, (0.0, 1.0 / 3.0, z), lumen, {}, None))
        return PyGeometry(frames, "mesh")

    def test_ensure_descending_z_preserved(self):
        # rs test_ensure_descending_z, first case: already descending
        from multimodars_tpu.pipelines.centerline_align import (
            preprocess_centerline,
        )

        out = preprocess_centerline(self._cl([1.0, 0.0]), self._mesh([0.0, 0.5]))
        zs = [p.contour_point.z for p in out.points]
        assert zs[0] == 1.0 and zs[-1] == 0.0

    def test_ensure_descending_z_reverses(self):
        # rs test_ensure_descending_z, second case: ascending input reversed
        from multimodars_tpu.pipelines.centerline_align import (
            preprocess_centerline,
        )

        out = preprocess_centerline(self._cl([0.0, 1.0]), self._mesh([0.0, 0.5]))
        zs = [p.contour_point.z for p in out.points]
        assert zs[0] == 1.0 and zs[-1] == 0.0

    def test_side_branches_stripped(self):
        from multimodars_tpu.models.centerline import (
            PyCenterline,
            PyCenterlinePoint,
        )
        from multimodars_tpu.models.point import PyContourPoint
        from multimodars_tpu.pipelines.centerline_align import (
            preprocess_centerline,
        )

        main = self._cl([3.0, 2.0, 1.0, 0.0]).points
        side = self._cl([5.0, 4.0], branch=1).points
        cl = PyCenterline(main + side)
        out = preprocess_centerline(cl, self._mesh([0.0, 1.0]))
        assert all(p.branch_id == 0 for p in out.points)
        assert max(p.contour_point.z for p in out.points) <= 3.0 + 1e-9

    def test_resample_spacing_matches_mesh(self):
        # rs test_cumulative_arc_length_and_decide_spacing: spacing = mean
        # frame-centroid distance (here 0.5)
        from multimodars_tpu.pipelines.centerline_align import (
            preprocess_centerline,
        )

        out = preprocess_centerline(
            self._cl([3.0, 2.0, 1.0, 0.0]), self._mesh([0.0, 0.5, 1.0])
        )
        zs = np.array([p.contour_point.z for p in out.points])
        spacings = np.abs(np.diff(zs))
        np.testing.assert_allclose(spacings, 0.5, atol=1e-9)

    def test_interpolated_midpoint(self):
        # rs test_build_samples_and_interpolate: sample halfway along a unit
        # segment lerps position and keeps the tangent/radius
        from multimodars_tpu.pipelines.centerline_align import (
            _resample_centerline_by_contours,
        )

        cl = self._cl([3.0, 2.0, 1.0, 0.0])
        out = _resample_centerline_by_contours(cl, self._mesh([0.0, 1.5]))
        zs = [p.contour_point.z for p in out.points]
        assert zs[0] == 3.0
        assert any(abs(z - 1.5) < 1e-9 for z in zs)
        assert all(abs(np.linalg.norm(np.asarray(p.tangent)) - 1.0) < 1e-9
                   for p in out.points)


class TestFrameTransformation:
    """Parity with align_algorithms.rs unit tests (rs:574-930)."""

    def _contour(self, coords, centroid=None):
        from multimodars_tpu.models.contour import PyContour

        coords = np.asarray(coords, dtype=np.float64)
        n = len(coords)
        return PyContour.from_arrays(
            0, 0, coords,
            centroid if centroid is not None else tuple(coords.mean(axis=0)),
            np.zeros(n, dtype=np.int64), np.arange(n, dtype=np.int64),
            np.zeros(n, dtype=bool), None, None, "Lumen",
        )

    def _cl_point(self, x, y, z, tangent=(0.0, 0.0, 1.0)):
        from multimodars_tpu.models.centerline import PyCenterlinePoint
        from multimodars_tpu.models.point import PyContourPoint

        return PyCenterlinePoint(PyContourPoint(0, 0, x, y, z, False), tangent)

    def test_apply_translation_only(self):
        # rs test_frame_transformation_apply_to_point
        from multimodars_tpu.pipelines.centerline_align import FrameTransformation

        tr = FrameTransformation(
            0, np.array([1.0, 2.0, 3.0]), np.eye(3), np.zeros(3)
        )
        out = tr.apply_to_xyz(np.array([[1.0, 1.0, 1.0]]))[0]
        np.testing.assert_allclose(out, [2.0, 3.0, 4.0], atol=1e-12)

    def test_apply_with_rotation(self):
        # rs test_frame_transformation_with_rotation: 90 deg about Z
        from multimodars_tpu.pipelines.centerline_align import (
            FrameTransformation,
            rotation_matrix_axis_angle,
        )

        rot = rotation_matrix_axis_angle(np.array([0.0, 0.0, 1.0]), math.pi / 2)
        tr = FrameTransformation(0, np.zeros(3), rot, np.zeros(3))
        out = tr.apply_to_xyz(np.array([[1.0, 0.0, 0.0]]))[0]
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-12)

    def test_align_frame(self):
        # rs test_align_frame: XY square centroid (0,0,0) onto cl (10,10,10)
        from multimodars_tpu.pipelines.centerline_align import align_frame

        c = self._contour(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], (0.0, 0.0, 0.0)
        )
        tr = align_frame(c, self._cl_point(10.0, 10.0, 10.0))
        np.testing.assert_allclose(tr.translation, [10.0, 10.0, 10.0], atol=1e-12)
        np.testing.assert_allclose(tr.pivot, [10.0, 10.0, 10.0], atol=1e-12)

    def test_apply_transformation_to_contour(self):
        # rs test_apply_transformation_to_contour: identity rotation +
        # translation moves points and centroid
        from multimodars_tpu.pipelines.centerline_align import (
            FrameTransformation,
            _apply_transform_to_contour,
        )

        c = self._contour([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], (0.5, 0.0, 0.0))
        tr = FrameTransformation(
            0, np.array([2.0, 3.0, 4.0]), np.eye(3), np.zeros(3)
        )
        _apply_transform_to_contour(c, tr)
        pts = c.xyz_view()
        np.testing.assert_allclose(pts[0], [2.0, 3.0, 4.0], atol=1e-12)
        np.testing.assert_allclose(pts[1], [3.0, 3.0, 4.0], atol=1e-12)
        np.testing.assert_allclose(c.centroid, [2.5, 3.0, 4.0], atol=1e-12)

    def test_newell_normal_unit_length(self):
        # rs test_calculate_normal: XY triangle -> unit +-Z normal
        from multimodars_tpu.pipelines.centerline_align import newell_normal

        xyz = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        n = newell_normal(xyz, (0.0, 0.0, 0.0))
        assert abs(np.linalg.norm(n) - 1.0) < 1e-12
        assert abs(abs(n[2]) - 1.0) < 1e-12

    def test_get_transformations_maps_sequential_cl_points(self):
        # rs test_get_transformations: frame i -> cl point ref_idx + i
        from multimodars_tpu.models.centerline import PyCenterline
        from multimodars_tpu.models.frame import PyFrame
        from multimodars_tpu.models.geometry import PyGeometry
        from multimodars_tpu.pipelines.centerline_align import get_transformations

        cl_pts = [self._cl_point(0.0, 0.0, float(5 - i)) for i in range(6)]
        cl = PyCenterline(cl_pts)
        frames = []
        for i in range(2):
            c = self._contour(
                [[-1, -1, i], [1, -1, i], [1, 1, i], [-1, 1, i]], (0.0, 0.0, float(i))
            )
            frames.append(PyFrame(i, (0.0, 0.0, float(i)), c, {}, None))
        geom = PyGeometry(frames, "g")
        trs = get_transformations(geom, cl, (0.0, 0.0, 5.0))
        assert len(trs) == 2
        # frame 0 -> cl[0] at z=5, frame 1 -> cl[1] at z=4
        np.testing.assert_allclose(trs[0].pivot, [0.0, 0.0, 5.0], atol=1e-12)
        np.testing.assert_allclose(trs[1].pivot, [0.0, 0.0, 4.0], atol=1e-12)


class TestCenterlineOps:
    """Parity with centerline.rs unit tests (rs:762-1000): reference lookup,
    sharp angles, split/merge, tangents, cleanup_vtp_data."""

    def _cl(self, coords, branch=0):
        from multimodars_tpu.models.centerline import PyCenterline
        from multimodars_tpu.models.point import PyContourPoint

        pts = [
            PyContourPoint(i + 1, i, float(x), float(y), float(z), False)
            for i, (x, y, z) in enumerate(coords)
        ]
        return PyCenterline.from_contour_points(pts)

    def _multi(self, branch_coords):
        from multimodars_tpu.models.centerline import (
            PyCenterline,
            PyCenterlinePoint,
        )
        from multimodars_tpu.models.point import PyContourPoint

        pts = []
        starts = []
        k = 0
        for bid, coords in enumerate(branch_coords):
            starts.append(k)
            prev = None
            for (x, y, z) in coords:
                tangent = (1.0, 0.0, 0.0)
                p = PyCenterlinePoint(
                    PyContourPoint(k, k, float(x), float(y), float(z), False), tangent
                )
                p.branch_id = bid
                pts.append(p)
                k += 1
        return PyCenterline(pts, starts)

    def test_find_reference_cl_point(self):
        cl = self._cl([(0, 0, 0), (1, 0, 0), (2, 0, 0)])
        assert cl.find_reference_cl_point_idx((0.0, 0.0, 0.0)) == 0

    def test_tangents_forward_difference(self):
        cl = self._cl([(0, 0, 0), (1, 0, 0), (2, 0, 0)])
        t = cl.tangents()
        np.testing.assert_allclose(t, [[1, 0, 0]] * 3, atol=1e-12)

    def test_find_sharp_angles_straight(self):
        cl = self._cl([(0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0), (4, 0, 0)])
        assert cl.find_sharp_angles(0, 0.0) == []

    def test_find_sharp_angles_v_shape(self):
        cl = self._cl(
            [(0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0), (2.5, 0.5, 0), (2, 1, 0)]
        )
        assert cl.find_sharp_angles(0, 0.0) == [3]
        assert cl.find_sharp_angles(0, 0.8) == []
        assert cl.find_sharp_angles(5, 0.0) == []

    def test_split_branch_main_longer_stays(self):
        cl = self._cl([(float(i), 0, 0) for i in range(9)])
        out = cl.split_branch(0, 3)
        assert len(out.branch_start_indices) == 2
        assert len(out.points) == 10  # junction duplicated
        len0 = out.branch_start_indices[1]
        assert len0 == 6, "longer segment must be branch 0"
        assert len(out.points) - len0 == 4
        for i, p in enumerate(out.points):
            assert p.branch_id == (0 if i < 6 else 1)
            assert p.contour_point.point_index == i

    def test_split_branch_equal_length_first_is_main(self):
        cl = self._cl([(float(i), 0, 0) for i in range(5)])
        out = cl.split_branch(0, 2)
        assert len(out.branch_start_indices) == 2
        assert out.branch_start_indices[1] == 3, "branch 0 has 3 pts"

    def test_merge_branches_result_is_main(self):
        cl = self._cl([(float(i), 0, 0) for i in range(5)])
        out = cl.split_branch(0, 2)
        merged = out.merge_branches(0, 1)
        assert len(merged.branch_start_indices) == 1
        assert len(merged.points) == 6
        assert all(p.branch_id == 0 for p in merged.points)
        for i, p in enumerate(merged.points):
            assert p.contour_point.point_index == i

    def test_cleanup_vtp_trims_overlap_prefix(self):
        main = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0), (4, 0, 0)]
        side = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (2, 1.5, 0), (2, 3, 0)]
        cl = self._multi([main, side])
        out = cl.cleanup_vtp_data(0.0, False, 0.0)
        assert len(out.branch_start_indices) == 2, "side branch must survive"
        b0 = [p for p in out.points if p.branch_id == 0]
        b1 = [p for p in out.points if p.branch_id == 1]
        assert len(b0) == 5, "main branch unchanged"
        assert len(b1) == 3  # junction + 2 diverged points
        j = b1[0].contour_point
        assert abs(j.x - 2.0) < 1e-9 and abs(j.y) < 1e-9

    def test_cleanup_vtp_drops_fully_overlapping_branch(self):
        main = [(0, 0, 0), (1, 0, 0), (2, 0, 0)]
        side = [(0, 0, 0), (1, 0, 0)]
        out = self._multi([main, side]).cleanup_vtp_data(0.0, False, 0.0)
        assert len(out.branch_start_indices) == 1

    def test_cleanup_vtp_inlet_trim(self):
        main = [(float(i), 0, 0) for i in range(6)]
        out = self._multi([main]).cleanup_vtp_data(3.0, False, 0.0)
        assert len(out.branch_start_indices) == 1
        assert len(out.points) == 3
        assert abs(out.points[0].contour_point.x - 3.0) < 1e-9

    def test_cleanup_vtp_no_overlap_leaves_branch_intact(self):
        main = [(0, 0, 0), (1, 0, 0), (2, 0, 0)]
        side = [(0, 5, 0), (0, 6, 0), (0, 7, 0)]
        out = self._multi([main, side]).cleanup_vtp_data(0.0, False, 0.0)
        b1 = [p for p in out.points if p.branch_id == 1]
        assert len(out.branch_start_indices) == 2
        assert len(b1) == 3, "no trimming when no overlap"


class TestSmoothCenterline:
    """Ported semantics of the reference's smooth_centerline tests
    (types/utils.rs:172-233): symmetric 3-sigma-truncated Gaussian per
    branch with tangent recompute."""

    @staticmethod
    def _line(pts):
        return numpy_to_centerline(np.asarray(pts, dtype=float))

    def test_straight_line_is_unchanged(self):
        from multimodars_tpu.models.centerline import smooth_centerline

        cl = self._line([(float(i), 0.0, 0.0) for i in range(20)])
        sm = smooth_centerline(cl, 3.0)
        for orig, new in zip(cl.points, sm.points):
            assert abs(orig.contour_point.x - new.contour_point.x) < 1e-10
            assert abs(orig.contour_point.y - new.contour_point.y) < 1e-10
            assert abs(orig.contour_point.z - new.contour_point.z) < 1e-10

    def test_spike_is_damped_not_erased(self):
        from multimodars_tpu.models.centerline import smooth_centerline

        pts = [(float(i), 0.0, 0.0) for i in range(15)]
        pts[7] = (7.0, 5.0, 0.0)
        sm = smooth_centerline(self._line(pts), 2.0)
        spike_y = sm.points[7].contour_point.y
        assert spike_y < 5.0
        assert spike_y > 0.0

    def test_tangents_are_unit_vectors(self):
        from multimodars_tpu.models.centerline import smooth_centerline

        pts = [(float(i), 0.0, 0.0) for i in range(20)]
        pts[10] = (10.0, 3.0, 0.0)
        sm = smooth_centerline(self._line(pts), 2.0)
        for p in sm.points:
            norm = math.sqrt(sum(c * c for c in p.tangent))
            assert abs(norm - 1.0) < 1e-10 or norm < 1e-12

    def test_sigma_zero_returns_clone(self):
        from multimodars_tpu.models.centerline import smooth_centerline

        cl = self._line([(float(i), 0.0, 0.0) for i in range(10)])
        sm = smooth_centerline(cl, 0.0)
        assert len(sm.points) == len(cl.points)
        for orig, new in zip(cl.points, sm.points):
            assert orig.contour_point.x == new.contour_point.x
            assert orig.contour_point.y == new.contour_point.y
            assert orig.contour_point.z == new.contour_point.z
            assert orig.tangent == new.tangent


class TestMeanSpacingResample:
    """Ported semantics of test_calculate_mean_spacing
    (centerline_align/preprocessing.rs:356-433): the resample spacing is the
    mean frame-centroid distance, and a single-frame mesh falls back to the
    centerline's own mean segment length."""

    @staticmethod
    def _mesh(centroids):
        from multimodars_tpu.models.contour import PyContour
        from multimodars_tpu.models.frame import PyFrame
        from multimodars_tpu.models.geometry import PyGeometry
        from multimodars_tpu.models.point import PyContourPoint

        frames = []
        for i, c in enumerate(centroids):
            pt = PyContourPoint(i, 0, c[0], c[1], c[2], False)
            lumen = PyContour(i, i, [pt], tuple(c), None, None, "Lumen")
            frames.append(PyFrame(i, tuple(c), lumen, {}, None))
        return PyGeometry(frames, "test")

    def test_mean_centroid_spacing_drives_resampling(self):
        from multimodars_tpu.pipelines.centerline_align import (
            _resample_centerline_by_contours,
        )

        # centroids (0,0,0),(3,4,0),(6,8,0): gaps 5.0 and 5.0 -> spacing 5.0
        mesh = self._mesh([(0.0, 0.0, 0.0), (3.0, 4.0, 0.0), (6.0, 8.0, 0.0)])
        cl = numpy_to_centerline(
            np.array([[0.0, 0.0, float(z)] for z in range(21)])
        )
        out = _resample_centerline_by_contours(cl, mesh)
        pos = out.positions()
        gaps = np.sqrt(((pos[1:] - pos[:-1]) ** 2).sum(-1))
        # every gap except a clamped tail equals the mean spacing 5.0
        np.testing.assert_allclose(gaps[:-1], 5.0, atol=1e-9)
        assert len(out.points) == 5  # s = 0,5,10,15,20

    def test_single_frame_falls_back_to_centerline_spacing(self):
        from multimodars_tpu.pipelines.centerline_align import (
            _resample_centerline_by_contours,
        )

        mesh = self._mesh([(1.0, 2.0, 3.0)])
        cl = numpy_to_centerline(
            np.array([[0.0, 0.0, float(z)] for z in range(4)])
        )
        out = _resample_centerline_by_contours(cl, mesh)
        pos = out.positions()
        gaps = np.sqrt(((pos[1:] - pos[:-1]) ** 2).sum(-1))
        # no centroid spacing -> fallback total/segments = 1.0
        np.testing.assert_allclose(gaps, 1.0, atol=1e-9)

    def test_vectorized_resample_bitwise_matches_scalar_loop(self):
        """The vectorised interpolation must reproduce the original
        per-sample scalar loop BIT-exactly on irregular random centerlines —
        including the tangent norm, whose BLAS dot path rounds differently
        from a vectorised (t*t).sum in ~11% of random 3-vectors."""
        from multimodars_tpu.pipelines.centerline_align import (
            _resample_centerline_by_contours,
        )

        rng = np.random.default_rng(7)
        for trial in range(4):
            n = int(rng.integers(5, 40))
            pts = np.cumsum(rng.standard_normal((n, 3)) * 0.8, axis=0)
            cl = numpy_to_centerline(pts)
            for p in cl.points:  # irregular radii too
                p.radius = float(rng.uniform(0.5, 2.0))
            mesh = self._mesh(
                [tuple(c) for c in np.cumsum(
                    rng.uniform(0.2, 1.0, (3, 3)), axis=0)]
            )
            out = _resample_centerline_by_contours(cl, mesh)

            # scalar reference: the exact pre-vectorisation expression tree
            pos = cl.positions()
            seg = np.sqrt(((pos[1:] - pos[:-1]) ** 2).sum(-1))
            cum = np.concatenate([[0.0], np.cumsum(seg)])
            total = float(cum[-1])
            centroids = np.array([f.centroid for f in mesh.frames])
            spacing = float(
                np.sqrt(((centroids[1:] - centroids[:-1]) ** 2).sum(-1)).mean()
            )
            s_new = []
            s = 0.0
            while s <= total + 1e-9:
                s_new.append(s)
                s += spacing
            if s_new and s_new[-1] > total + 1e-6:
                s_new[-1] = total
            tangents = cl.tangents()
            radii = cl.radii()
            assert len(out.points) == len(s_new)
            for k, target_s in enumerate(s_new):
                got = out.points[k]
                idx = int(np.searchsorted(cum, target_s, side="right")) - 1
                idx = max(idx, 0)
                if idx >= len(cl.points) - 1:
                    src = cl.points[-1]
                    exp_xyz = (src.contour_point.x, src.contour_point.y,
                               src.contour_point.z)
                    exp_tan, exp_rad = src.tangent, src.radius
                else:
                    s0, s1 = cum[idx], cum[idx + 1]
                    denom = s1 - s0
                    t = 0.0 if abs(denom) < 1e-12 else (target_s - s0) / denom
                    p = pos[idx] + t * (pos[idx + 1] - pos[idx])
                    tangent = tangents[idx] * (1.0 - t) + tangents[idx + 1] * t
                    tn = float(np.linalg.norm(tangent))
                    exp_tan = (
                        tuple(tangent / tn) if tn > 1e-12 else (0.0, 0.0, 0.0)
                    )
                    exp_rad = float(radii[idx] * (1.0 - t) + radii[idx + 1] * t)
                    exp_xyz = (float(p[0]), float(p[1]), float(p[2]))
                cp = got.contour_point
                assert (cp.x, cp.y, cp.z) == exp_xyz, (trial, k)
                assert got.tangent == exp_tan, (trial, k)
                assert got.radius == exp_rad, (trial, k)
