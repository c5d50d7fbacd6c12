"""Integrity-gate parity tests, mirroring the reference's Rust unit tests
(src/intravascular/io/integrity_check.rs:240-530)."""

import numpy as np
import pytest

from multimodars_tpu.io.build import check_geometry_integrity
from multimodars_tpu.models.contour import PyContour
from multimodars_tpu.models.frame import PyFrame
from multimodars_tpu.models.geometry import PyGeometry
from multimodars_tpu.models.point import PyContourPoint


def _points(count, z):
    return np.array([[i, i * 2.0, z] for i in range(count)], dtype=np.float64)


def _contour(id_, original_frame, coords, kind="Lumen"):
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    centroid = tuple(coords.mean(axis=0)) if n else (0.0, 0.0, 0.0)
    return PyContour.from_arrays(
        id_, original_frame, coords, centroid,
        np.full(n, original_frame, dtype=np.int64),
        np.arange(n, dtype=np.int64),
        np.zeros(n, dtype=bool), None, None, kind,
    )


def _frame(id_, original_frame, has_reference, z, n_points=4):
    coords = _points(n_points, z)
    lumen = _contour(id_, original_frame, coords)
    centroid = tuple(coords.mean(axis=0)) if n_points else (0.0, 0.0, 0.0)
    ref = (
        PyContourPoint(original_frame, 0, centroid[0], centroid[1], centroid[2], False)
        if has_reference
        else None
    )
    return PyFrame(id_, centroid, lumen, {}, ref)


def test_valid_geometry():
    geometry = PyGeometry(
        [_frame(0, 10, False, 0.0), _frame(1, 11, True, 1.0), _frame(2, 12, False, 2.0)],
        "test",
    )
    geometry.ensure_proximal_at_position_zero()
    check_geometry_integrity(geometry)  # must not raise


def test_non_consecutive_frame_ids():
    geometry = PyGeometry([_frame(0, 10, True, 0.0), _frame(2, 11, False, 1.0)], "test")
    with pytest.raises(ValueError, match="consecutive"):
        check_geometry_integrity(geometry)


def test_missing_lumen():
    f = _frame(0, 10, True, 0.0, n_points=0)
    with pytest.raises(ValueError, match="no points"):
        check_geometry_integrity(PyGeometry([f], "test"))


def test_multiple_reference_points():
    geometry = PyGeometry([_frame(0, 10, True, 0.0), _frame(1, 11, True, 1.0)], "test")
    with pytest.raises(ValueError, match="exactly one reference point"):
        check_geometry_integrity(geometry)


def test_point_count_mismatch_across_frames():
    geometry = PyGeometry(
        [_frame(0, 10, True, 0.0, n_points=4), _frame(1, 11, False, 1.0, n_points=5)],
        "test",
    )
    with pytest.raises(ValueError, match="Lumen contour point count mismatch"):
        check_geometry_integrity(geometry)


def test_extra_contour_point_count_mismatch():
    f1 = _frame(0, 10, False, 0.0)
    f2 = _frame(1, 11, True, 1.0)
    f1.extras["Catheter"] = _contour(0, 10, _points(6, 0.0), "Catheter")
    f2.extras["Catheter"] = _contour(1, 11, _points(6, 1.0), "Catheter")
    geometry = PyGeometry([f1.copy(), f2.copy()], "test")
    geometry.ensure_proximal_at_position_zero()
    check_geometry_integrity(geometry)  # consistent counts pass

    f3 = _frame(2, 12, False, 2.0)
    f3.extras["Catheter"] = _contour(2, 12, _points(8, 2.0), "Catheter")
    geometry = PyGeometry([f1, f2, f3], "test")
    with pytest.raises(ValueError):
        check_geometry_integrity(geometry)


def test_original_frame_mismatch():
    f1 = _frame(0, 10, True, 0.0)
    f1.extras["Catheter"] = _contour(0, 99, _points(4, 0.0), "Catheter")
    with pytest.raises(ValueError):
        check_geometry_integrity(PyGeometry([f1], "test"))
