"""Interpolated-sequence parity tests, mirroring the reference's Rust unit
tests (src/intravascular/to_object/interpolation.rs:150-530)."""

import numpy as np
import pytest

from multimodars_tpu.models.contour import PyContour
from multimodars_tpu.models.frame import PyFrame
from multimodars_tpu.models.geometry import PyGeometry
from multimodars_tpu.models.point import PyContourPoint
from multimodars_tpu.pipelines.to_object import (
    _interp_contour,
    _interp_point,
    _interp_thickness,
    interpolate_contours,
)


def _contour(id_, coords, centroid, aortic_th=None, pulm_th=None,
             kind="Lumen", aortic_flags=None):
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    flags = (
        np.asarray(aortic_flags, dtype=bool)
        if aortic_flags is not None
        else np.zeros(n, dtype=bool)
    )
    return PyContour.from_arrays(
        id_, id_, coords, centroid,
        np.full(n, id_, dtype=np.int64), np.arange(n, dtype=np.int64),
        flags, aortic_th, pulm_th, kind,
    )


def _mock_frame(id_, z_off):
    lumen = _contour(
        id_,
        [[1 + z_off, 2 + z_off, 3 + z_off], [4 + z_off, 5 + z_off, 6 + z_off]],
        (2.5 + z_off, 3.5 + z_off, 4.5 + z_off),
        aortic_th=1.0 + z_off, pulm_th=2.0 + z_off,
        aortic_flags=[True, True],
    )
    catheter = _contour(
        id_, [[10 + z_off, 20 + z_off, 30 + z_off]],
        (10 + z_off, 20 + z_off, 30 + z_off), kind="Catheter",
    )
    eem = _contour(
        id_, [[7 + z_off, 8 + z_off, 9 + z_off]],
        (7 + z_off, 8 + z_off, 9 + z_off), kind="Eem",
    )
    rp = PyContourPoint(id_, 0, z_off, z_off, z_off, False)
    return PyFrame(
        id_, (5 + z_off, 6 + z_off, 7 + z_off), lumen,
        {"Catheter": catheter, "Eem": eem}, rp,
    )


def _mock_geometry(label, n):
    return PyGeometry([_mock_frame(i, i * 10.0) for i in range(n)], label)


def test_interpolate_contours_basic():
    # rs test_interpolate_contours_basic
    result = interpolate_contours(
        _mock_geometry("start", 2), _mock_geometry("end", 2), 2,
        ["Lumen", "Catheter", "Eem"],
    )
    assert len(result) == 4
    assert result[0].label == "start"
    assert result[0].frames[0].lumen.points[0].x == 1.0
    assert result[-1].label == "end"
    assert result[-1].frames[0].lumen.points[0].x == 1.0
    mid = result[1]
    assert mid.label == "start_inter_0"
    assert mid.frames[0].lumen.points[0].x == pytest.approx(1.0, abs=1e-5)
    assert mid.frames[0].lumen.points[1].y == pytest.approx(5.0, abs=1e-5)
    assert mid.frames[0].centroid[0] == pytest.approx(5.0, abs=1e-5)
    assert mid.frames[0].extras["Catheter"].points[0].z == pytest.approx(30.0, abs=1e-5)
    assert mid.frames[0].extras["Eem"].points[0].x == pytest.approx(7.0, abs=1e-5)


def test_interpolate_contours_different_frame_counts():
    result = interpolate_contours(
        _mock_geometry("start", 2), _mock_geometry("end", 3), 1, ["Lumen"]
    )
    assert len(result[0].frames) == 2
    assert len(result[1].frames) == 2
    assert len(result[2].frames) == 3  # end keeps its original frames


def test_interpolate_contours_partial_contour_types():
    result = interpolate_contours(
        _mock_geometry("start", 1), _mock_geometry("end", 1), 1, ["Lumen"]
    )
    interp = result[1].frames[0]
    assert interp.lumen.n_points > 0
    assert "Catheter" not in interp.extras
    assert "Eem" not in interp.extras


def test_interpolate_contours_with_missing_contours():
    start = _mock_geometry("start", 1)
    del start.frames[0].extras["Catheter"]
    result = interpolate_contours(start, _mock_geometry("end", 1), 1,
                                  ["Lumen", "Catheter"])
    interp = result[1].frames[0]
    assert interp.lumen.n_points > 0
    assert "Catheter" not in interp.extras


def test_interpolate_contour_point():
    # rs test_interpolate_contour_point: halfway, keeps start's flags/ids
    ps = PyContourPoint(0, 0, 1.0, 2.0, 3.0, True)
    pe = PyContourPoint(1, 1, 11.0, 12.0, 13.0, False)
    out = _interp_point(ps, pe, 0.5)
    assert (out.x, out.y, out.z) == pytest.approx((6.0, 7.0, 8.0), abs=1e-5)
    assert out.aortic is True
    assert out.frame_index == 0 and out.point_index == 0


def test_interpolate_contour():
    # rs test_interpolate_contour
    start = _contour(1, [[1.0, 2.0, 3.0]], (1.0, 2.0, 3.0), 1.0, 2.0,
                     aortic_flags=[True])
    end = _contour(1, [[11.0, 12.0, 13.0]], (11.0, 12.0, 13.0), 3.0, 4.0,
                   aortic_flags=[False])
    out = _interp_contour(start, end, 0.5)
    assert out.id == 1 and out.original_frame == 1 and out.kind == "Lumen"
    pt = out.points[0]
    assert (pt.x, pt.y, pt.z) == pytest.approx((6.0, 7.0, 8.0), abs=1e-5)
    assert pt.aortic is True  # keeps start's flag
    assert out.centroid[0] == pytest.approx(6.0, abs=1e-5)
    assert out.aortic_thickness == pytest.approx(2.0, abs=1e-5)
    assert out.pulmonary_thickness == pytest.approx(3.0, abs=1e-5)


def test_interpolate_contour_mismatched_points():
    start = _contour(1, [[1.0, 2.0, 3.0]], (1.0, 2.0, 3.0))
    end = _contour(1, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], (2.5, 3.5, 4.5))
    with pytest.raises(ValueError):
        _interp_contour(start, end, 0.5)


def test_interpolate_thickness():
    # rs test_interpolate_thickness: any missing side -> None
    assert _interp_thickness(1.0, 3.0, 0.5) == 2.0
    assert _interp_thickness(None, 3.0, 0.5) is None
    assert _interp_thickness(1.0, None, 0.5) is None
    assert _interp_thickness(None, None, 0.5) is None


def test_interpolate_contours_zero_steps():
    result = interpolate_contours(
        _mock_geometry("start", 1), _mock_geometry("end", 1), 0, ["Lumen"]
    )
    assert len(result) == 2
    assert result[0].label == "start"
    assert result[1].label == "end"


def test_interpolate_contours_missing_reference_points():
    start = _mock_geometry("start", 1)
    start.frames[0].reference_point = None
    result = interpolate_contours(start, _mock_geometry("end", 1), 1, ["Lumen"])
    assert result[1].frames[0] is not None
