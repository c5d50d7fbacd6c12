"""Converter round-trip tests mirroring the reference tests/test_converters.py."""

import numpy as np
import pytest

from multimodars import (
    PyCenterline,
    PyContour,
    PyContourPoint,
    numpy_to_centerline,
    numpy_to_geometry,
    numpy_to_inputdata,
    to_array,
)


def _make_simple_contour(contour_id, n=4, offset=0.0):
    pts = [
        PyContourPoint(contour_id, i, float(i) + offset, 2.0 * i + offset, 3.0 * i + offset, i % 2 == 0)
        for i in range(n)
    ]
    cx = sum(p.x for p in pts) / n
    cy = sum(p.y for p in pts) / n
    cz = sum(p.z for p in pts) / n
    return PyContour(contour_id, contour_id, pts, (cx, cy, cz), None, None, "Lumen")


def _make_simple_centerline(n=5):
    pts = [PyContourPoint(i, 0, float(i), i + 0.5, i + 1.0, False) for i in range(n)]
    return PyCenterline.from_contour_points(pts)


def test_to_array_and_back_contour():
    c = _make_simple_contour(7, n=3, offset=1.0)
    arr = to_array(c)
    assert arr.shape == (3, 4)
    rebuilt = numpy_to_geometry(
        lumen_arr=arr,
        catheter_arr=np.zeros((0, 4)),
        wall_arr=np.zeros((0, 4)),
        reference_arr=np.array([[0.0, 0.0, 0.0, 0.0]]),
    )
    assert len(rebuilt.frames) > 0
    frame = rebuilt.frames[0]
    assert len(frame.lumen.points) == 3
    for orig, new in zip(c.points, frame.lumen.points):
        assert pytest.approx(orig.x) == new.x
        assert pytest.approx(orig.y) == new.y
        assert pytest.approx(orig.z) == new.z


def test_to_array_centerline_and_back():
    cl = _make_simple_centerline(n=4)
    arr = to_array(cl)
    assert arr.shape == (4, 4)
    new_cl = numpy_to_centerline(arr[:, 1:4])
    arr2 = to_array(new_cl)
    np.testing.assert_allclose(arr2[:, 1:4], arr[:, 1:4], rtol=1e-6, atol=0)


def test_centerline_nan_interpolation():
    arr = np.array([[0.0, 0.0, 0.0], [np.nan, 1.0, 1.0], [2.0, 2.0, 2.0]])
    cl = numpy_to_centerline(arr)
    assert cl.points[1].contour_point.x == pytest.approx(1.0)


def test_centerline_invalid_shapes():
    with pytest.raises(ValueError):
        numpy_to_centerline(np.zeros((3, 2)))
    with pytest.raises(ValueError):
        numpy_to_centerline(np.zeros((0, 3)))
    with pytest.raises(ValueError):
        numpy_to_centerline(np.full((3, 3), np.nan))


def test_geometry_roundtrip_multi_frame():
    c0 = _make_simple_contour(0, n=2, offset=0.0)
    c1 = _make_simple_contour(1, n=3, offset=10.0)
    lumen_arr = np.vstack([to_array(c0), to_array(c1)])
    geom = numpy_to_geometry(lumen_arr=lumen_arr)
    assert len(geom.frames) == 2
    assert len(geom.frames[0].lumen.points) == 2
    assert len(geom.frames[1].lumen.points) == 3
    out = to_array(geom)
    np.testing.assert_allclose(out["lumen"], lumen_arr)


def test_numpy_to_inputdata():
    lumen = np.array(
        [[0, 0.0, 0.0, 0.0], [0, 1.0, 0.0, 0.0], [1, 0.0, 1.0, 1.0], [1, 1.0, 1.0, 1.0]]
    )
    ref = np.array([0, 0.5, 0.5, 0.0])
    input_data = numpy_to_inputdata(lumen, ref, True, label="x")
    assert len(input_data.lumen) == 2
    assert input_data.ref_point.x == 0.5
    assert input_data.diastole
    d = to_array(input_data)
    np.testing.assert_allclose(d["lumen"], lumen)


def test_records_numeric_phase_mapping():
    recs = np.array([[0, 0, np.nan, np.nan], [1, 1, 0.5, np.nan]], dtype=float)
    lumen = np.array([[0, 0.0, 0.0, 0.0]])
    input_data = numpy_to_inputdata(lumen, np.array([0, 0, 0, 0.0]), True, record=recs)
    assert input_data.record[0].phase == "D"
    assert input_data.record[1].phase == "S"
    assert input_data.record[1].measurement_1 == 0.5
    assert input_data.record[0].measurement_1 is None


def test_geometry_to_trimesh():
    from multimodars import geometry_to_trimesh

    c0 = _make_round(0, z=0.0)
    c1 = _make_round(1, z=1.0)
    lumen_arr = np.vstack([to_array(c0), to_array(c1)])
    geom = numpy_to_geometry(lumen_arr=lumen_arr)
    mesh = geometry_to_trimesh(geom)
    n = 16
    assert len(mesh.vertices) == 2 * n
    assert len(mesh.faces) == 2 * n
    # outward normals: dot(normal, point - axis) > 0 on average
    centers = mesh.triangles_center
    normals = mesh.face_normals
    radial = centers - np.array([0.0, 0.0, 0.0]) * 0
    radial[:, 2] = 0
    assert float((normals * radial).sum(axis=1).mean()) > 0


def _make_round(cid, z, n=16, r=2.0):
    import math

    pts = [
        PyContourPoint(cid, i, r * math.cos(2 * math.pi * i / n), r * math.sin(2 * math.pi * i / n), z, False)
        for i in range(n)
    ]
    return PyContour(cid, cid, pts, (0, 0, z), None, None, "Lumen")
