"""Pair post-processing parity tests, mirroring the reference's Rust unit
tests (src/intravascular/processing/postprocessing.rs:470-960)."""

import contextlib
import io

import numpy as np
import pytest

from multimodars_tpu.models.contour import PyContour
from multimodars_tpu.models.frame import PyFrame
from multimodars_tpu.models.geometry import PyGeometry, PyGeometryPair
from multimodars_tpu.models.point import PyContourPoint
from multimodars_tpu.pipelines.postprocess import (
    adjust_walls_anomalous_geom_pair,
    blend_contour,
    get_avg_z_diff,
    new_frames_by_sample_rate,
    postprocess_geom_pair,
    predict_z_positions,
    resample_by_diff,
    trim_geom_pair,
)


def _contour(id_, z, thickness=None, kind="Lumen"):
    coords = np.array([[1.0, 2.0, z], [3.0, 4.0, z]])
    return PyContour.from_arrays(
        id_, id_, coords, (2.0, 3.0, z),
        np.full(2, id_, dtype=np.int64), np.arange(2, dtype=np.int64),
        np.zeros(2, dtype=bool), thickness, None, kind,
    )


def _frame(id_, z, thickness=None, set_ref=False):
    lumen = _contour(id_, z, thickness, "Lumen")
    extras = {"Eem": _contour(id_, z, None, "Eem")}
    ref = PyContourPoint(id_, 0, 0.0, 0.0, z, False) if set_ref else None
    return PyFrame(id_, (2.0, 3.0, z), lumen, extras, ref)


def _geometry(label, z_values, thicknesses=()):
    frames = []
    for i, z in enumerate(z_values):
        th = thicknesses[i] if i < len(thicknesses) else None
        frames.append(_frame(i, z, th, set_ref=(i == len(z_values) // 2)))
    if frames and all(f.reference_point is None for f in frames):
        frames[0].reference_point = PyContourPoint(0, 0, 0.0, 0.0, frames[0].centroid[2], False)
    return PyGeometry(frames, label)


def _pair():
    a = _geometry("geom_a", [0.0, 1.0, 2.0, 3.0, 4.0], [1.0] * 5)
    b = _geometry("geom_b", [0.0, 2.0, 4.0, 6.0, 8.0], [2.0] * 5)
    return PyGeometryPair(a, b, "test_pair")


def test_get_avg_z_diff():
    # postprocessing.rs test_get_avg_z_diff: diffs 1,2,3 -> avg 2.0
    assert get_avg_z_diff(_geometry("t", [0.0, 1.0, 3.0, 6.0])) == 2.0


def test_resample_by_diff():
    # rs test_resample_by_diff: z rewritten to start + i*diff
    resampled = resample_by_diff(_geometry("t", [0.0, 2.0, 5.0]), 1.0)
    assert len(resampled.frames) == 3
    assert [f.centroid[2] for f in resampled.frames] == [0.0, 1.0, 2.0]


def test_resample_by_diff_with_rotation():
    # rs test_resample_by_diff_with_rotation: smallest z first
    frames = [_frame(0, 5.0), _frame(1, 0.0, set_ref=True), _frame(2, 2.0)]
    resampled = resample_by_diff(PyGeometry(frames, "t"), 1.0)
    assert [f.centroid[2] for f in resampled.frames] == [0.0, 1.0, 2.0]


def test_predict_z_positions_forward():
    # rs test_predict_z_positions_forward
    assert predict_z_positions(0.0, 0.0, 5.0, 1.0) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]


def test_predict_z_positions_backward():
    zs = predict_z_positions(5.0, 0.0, 5.0, 1.0)
    assert zs and 5.0 in zs


def test_predict_z_positions_middle_ref():
    zs = predict_z_positions(2.5, 0.0, 5.0, 1.0)
    assert 2.5 in zs
    assert any(z <= 1.0 for z in zs)
    assert any(z >= 4.0 for z in zs)


def test_new_frames_by_sample_rate():
    # rs test_new_frames_by_sample_rate: 3 frames regridded onto 5 z slots,
    # sequential ids
    out = new_frames_by_sample_rate(_geometry("t", [0.0, 2.0, 4.0]), [0.0, 1.0, 2.0, 3.0, 4.0])
    assert len(out.frames) == 5
    for i, f in enumerate(out.frames):
        assert f.centroid[2] == float(i)
        assert f.id == i
        assert f.lumen.id == i


def test_blend_contour():
    # rs test_blend_contour: halfway lerp of points and centroid
    c1 = _contour(0, 0.0)
    c2 = _contour(1, 2.0)
    xyz = c2.xyz()
    xyz[0] = [5.0, 6.0, 2.0]
    xyz[1] = [7.0, 8.0, 2.0]
    c2.set_xyz(xyz)
    out = blend_contour(c1, c2, 0.5)
    pts = out.xyz_view()
    assert pts[0][0] == 3.0 and pts[0][1] == 4.0
    assert pts[1][0] == 5.0 and pts[1][1] == 6.0
    assert out.centroid == (2.0, 3.0, 1.0)


def test_trim_geom_pair():
    # rs test_trim_geom_pair: symmetric windows around the reference frames,
    # ids renumbered
    a = _geometry("a", [0.0, 1.0, 2.0, 3.0, 4.0])
    b = _geometry("b", [0.0, 1.0, 2.0])
    trimmed = trim_geom_pair(PyGeometryPair(a, b, "test"))
    assert len(trimmed.geom_a.frames) == 3
    assert len(trimmed.geom_b.frames) == 3
    assert [f.id for f in trimmed.geom_a.frames] == [0, 1, 2]
    assert [f.id for f in trimmed.geom_b.frames] == [0, 1, 2]


def test_adjust_walls_anomalous_geom_pair():
    # rs test_adjust_walls_anomalous_geom_pair: per-frame average
    a = _geometry("a", [0.0, 1.0], [1.0, 2.0])
    b = _geometry("b", [0.0, 1.0], [3.0, 4.0])
    adjusted = adjust_walls_anomalous_geom_pair(PyGeometryPair(a, b, "t"))
    assert adjusted.geom_a.frames[0].lumen.aortic_thickness == 2.0
    assert adjusted.geom_a.frames[1].lumen.aortic_thickness == 3.0
    assert adjusted.geom_b.frames[0].lumen.aortic_thickness == 2.0
    assert adjusted.geom_b.frames[1].lumen.aortic_thickness == 3.0


def test_adjust_walls_missing_thickness():
    # rs ..._missing_thickness: fall back to the available side
    a = _geometry("a", [0.0, 1.0], [1.0, None])
    b = _geometry("b", [0.0, 1.0], [None, 4.0])
    adjusted = adjust_walls_anomalous_geom_pair(PyGeometryPair(a, b, "t"))
    assert adjusted.geom_a.frames[0].lumen.aortic_thickness == 1.0
    assert adjusted.geom_b.frames[1].lumen.aortic_thickness == 4.0


@pytest.mark.parametrize("anomalous", [False, True])
def test_postprocess_geom_pair_runs(anomalous):
    # rs test_postprocess_geom_pair_basic/_anomalous: no panic, non-empty
    with contextlib.redirect_stdout(io.StringIO()):
        out = postprocess_geom_pair(_pair(), 0.1, anomalous)
    assert out.geom_a.frames
    assert out.geom_b.frames


def _hex_contour(id_, z):
    # the reference's 6-point test hexagon (test_utils.rs:27-87)
    coords = np.array(
        [[1.0, 3.0, z], [0.0, 2.0, z], [0.0, 0.0, z],
         [1.0, 0.0, z], [2.0, 0.0, z], [2.0, 2.0, z]]
    )
    centroid = tuple(coords.mean(axis=0))
    return PyContour.from_arrays(
        id_, id_, coords, centroid,
        np.full(6, id_, dtype=np.int64), np.arange(6, dtype=np.int64),
        np.zeros(6, dtype=bool), None, None, "Lumen",
    ), centroid


def _dummy_geometry_custom(z_spacing, n_frames):
    # dummy_geometry_custom (test_utils.rs:8-109): hexagon frames at
    # i * z_spacing, reference point (3, 1, z) on frame n/2
    frames = []
    for i in range(n_frames):
        z = i * z_spacing
        lumen, centroid = _hex_contour(i, z)
        ref = (
            PyContourPoint(i, 0, 3.0, 1.0, z, False)
            if i == n_frames // 2
            else None
        )
        frames.append(PyFrame(i, centroid, lumen, {}, ref))
    return PyGeometry(frames, "dummy_geom")


def test_complex_resampling():
    # postprocessing.rs:920-978 — mixed-rate pair: predicted z grid,
    # regridded frames, and element-exact pair equality after postprocess
    geom_a = _dummy_geometry_custom(1.0, 3)
    geom_b = _dummy_geometry_custom(0.5, 6)
    pair = PyGeometryPair(geom_a, geom_b, "dummy_pair")

    assert get_avg_z_diff(geom_a) == 1.0
    assert get_avg_z_diff(geom_b) == 0.5

    ref_idx_b = geom_b.find_ref_frame_idx()
    ref_z_b = geom_b.frames[ref_idx_b].centroid[2]
    z_coords = predict_z_positions(ref_z_b, 0.0, 2.5, 0.5)
    assert z_coords == [i * 0.5 for i in range(6)]

    interpolated = new_frames_by_sample_rate(geom_a, z_coords)
    for i, frame in enumerate(interpolated.frames):
        assert frame.centroid[2] == i * 0.5

    resampled = resample_by_diff(geom_a, 0.5)
    for i, frame in enumerate(resampled.frames):
        assert frame.centroid[2] == i * 0.5

    out = postprocess_geom_pair(pair, 0.1, True)
    assert len(out.geom_a.frames) == len(out.geom_b.frames) > 0
    for frame_a, frame_b in zip(out.geom_a.frames, out.geom_b.frames):
        assert frame_a.id == frame_b.id
        assert frame_a.centroid[0] == frame_b.centroid[0]
        assert frame_a.centroid[1] == frame_b.centroid[1]
        assert frame_a.centroid[2] == frame_b.centroid[2]
        assert np.array_equal(frame_a.lumen.xyz_view(), frame_b.lumen.xyz_view())
