"""I/O + geometry-builder golden tests mirroring build.rs io_tests and
input.rs input_tests.  Fixture CSVs are read from the mounted reference
checkout and skipped when absent."""

import os
from pathlib import Path

import pytest

from multimodars_tpu.io import (
    build_geometry_from_inputdata,
    read_centerline_vtp,
    read_contour_data,
)
from multimodars_tpu.io.csv_io import InputData, process_directory
from multimodars_tpu.models.point import PyContourPoint

FIXTURES = Path(__file__).resolve().parent / "data" / "fixtures"
EXAMPLES = Path("/root/reference/examples/data")

needs_fixtures = pytest.mark.skipif(
    not FIXTURES.exists(), reason="reference fixtures not mounted"
)
needs_examples = pytest.mark.skipif(
    not EXAMPLES.exists(), reason="reference examples not mounted"
)


@needs_fixtures
def test_process_directory_idealized():
    input_data = process_directory(FIXTURES / "idealized_geometry", None, True, "")
    assert len(input_data.lumen) > 0
    assert input_data.eem is not None
    assert input_data.calcification is not None
    assert input_data.record is None
    assert input_data.ref_point.x > 0.0


@needs_fixtures
def test_rest_directory_area_elliptic():
    """Parity: build.rs test_rest_directory_area_elliptic (golden values)."""
    geometry = build_geometry_from_inputdata(
        None, FIXTURES / "ivus_rest", "full", True, (4.5, 4.5), 0.5, 20, verbose=False
    )
    lumen0 = geometry.frames[0].lumen
    assert lumen0.original_frame == 385
    assert abs(lumen0.get_area() - 5.42) < 0.1
    (_, _), long_d = lumen0.find_farthest_points()
    (_, _), short_d = lumen0.find_closest_opposite()
    assert abs(long_d - 5.2) < 0.1
    assert abs(short_d - 1.15) < 0.1
    assert abs(lumen0.get_elliptic_ratio() - 4.52) < 0.1
    assert lumen0.aortic_thickness == 0.96
    assert lumen0.pulmonary_thickness == 1.68
    assert geometry.frames[0].reference_point.frame_index == lumen0.original_frame


@needs_fixtures
def test_catheter_contour_properties():
    geometry = build_geometry_from_inputdata(
        None, FIXTURES / "ivus_rest", "test", True, (4.5, 4.5), 0.5, 20, verbose=False
    )
    for frame in geometry.frames:
        catheter = frame.extras.get("Catheter")
        assert catheter is not None
        assert len(catheter.points) == 20
        assert abs(catheter.centroid[2] - frame.lumen.centroid[2]) < 1e-6


@needs_fixtures
def test_full_directory_consistent_ids():
    geometry = build_geometry_from_inputdata(
        None, FIXTURES / "ivus_full", "full", True, (4.5, 4.5), 0.5, 20, verbose=False
    )
    assert geometry.frames
    for i, frame in enumerate(geometry.frames):
        assert frame.id == i
        for kind in ("Eem", "Catheter"):
            assert kind in frame.extras, f"frame {i} missing {kind}"
            assert frame.extras[kind].id == frame.lumen.id
            assert frame.extras[kind].original_frame == frame.lumen.original_frame


def test_build_geometry_with_input_data():
    pt = PyContourPoint(0, 0, 1.0, 2.0, 3.0, False)
    input_data = InputData(
        lumen=[pt],
        eem=[pt.copy()],
        ref_point=pt.copy(),
        diastole=True,
        label="test",
    )
    geometry = build_geometry_from_inputdata(
        input_data, None, "test_label", True, (0.0, 0.0), 1.0, 10, verbose=False
    )
    assert geometry.frames
    assert geometry.label == "test_label"


def test_error_on_no_input():
    with pytest.raises(ValueError, match="Either input_data or path"):
        build_geometry_from_inputdata(None, None, "test", True, (0.0, 0.0), 1.0, 10)


@needs_examples
def test_read_centerline_vtp():
    cl = read_centerline_vtp(EXAMPLES / "lca_cl.vtp")
    assert len(cl.points) > 0
    assert cl.branch_start_indices[0] == 0
    # branch 0 must be the longest by arc length
    import numpy as np

    branches = cl._branches_as_lists()
    def arc(b):
        pos = np.array([[p.contour_point.x, p.contour_point.y, p.contour_point.z] for p in b])
        return float(np.sqrt(((pos[1:] - pos[:-1]) ** 2).sum(-1)).sum()) if len(pos) > 1 else 0.0
    lengths = [arc(b) for b in branches]
    assert lengths[0] == max(lengths)
    # tangents are unit where defined
    t = cl.tangents()
    import numpy as np
    norms = np.linalg.norm(t, axis=1)
    assert ((np.abs(norms - 1.0) < 1e-6) | (norms < 1e-9)).all()


@needs_examples
def test_read_contour_csv_tab_or_comma():
    pts = read_contour_data(FIXTURES / "ivus_rest" / "diastolic_contours.csv")
    assert pts
    assert pts[0].frame_index == 347


def test_debug_io_dumps(dummy_geom, tmp_path):
    """utils.debug_io writes geometry/contour CSVs and a bare OBJ."""
    import numpy as np

    from multimodars_tpu.utils.debug_io import (
        write_contour_to_csv,
        write_debug_obj_mesh,
        write_geometry_to_csv,
    )

    write_geometry_to_csv(dummy_geom, tmp_path / "geom.csv")
    arr = np.genfromtxt(tmp_path / "geom.csv", delimiter=",")
    assert arr.shape[0] == sum(f.lumen.n_points for f in dummy_geom.frames)
    assert arr.shape[1] == 6

    write_contour_to_csv(dummy_geom.frames[0].lumen, tmp_path / "c.csv")
    c = np.genfromtxt(tmp_path / "c.csv", delimiter=",")
    assert c.shape[0] == dummy_geom.frames[0].lumen.n_points

    write_debug_obj_mesh([f.lumen for f in dummy_geom.frames], tmp_path / "m.obj")
    text = (tmp_path / "m.obj").read_text()
    assert text.count("v ") >= arr.shape[0]
    assert "f " in text


def test_read_centerline_vtp_picks_longest_by_arc_length_not_point_count(tmp_path):
    """Ported semantics of input.rs:547-620: a sparse 5-point 40mm line must
    become branch 0 over a dense 20-point 1.9mm line."""
    line_a = [(i * 10.0, 0.0, 0.0) for i in range(5)]
    line_b = [(0.0, i * 0.1, 0.0) for i in range(20)]
    all_pts = line_a + line_b
    n = len(all_pts)
    points_text = " ".join(f"{x} {y} {z}" for x, y, z in all_pts)
    radii_text = " ".join(["1.0"] * n)
    connectivity = " ".join(str(i) for i in range(n))
    offsets = f"{len(line_a)} {n}"
    xml = f"""<?xml version="1.0"?>
<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian" header_type="UInt32">
  <PolyData>
    <Piece NumberOfPoints="{n}" NumberOfVerts="0" NumberOfLines="2" NumberOfStrips="0" NumberOfPolys="0">
      <PointData>
        <DataArray type="Float64" Name="MaximumInscribedSphereRadius" format="ascii">
          {radii_text}
        </DataArray>
      </PointData>
      <Points>
        <DataArray type="Float64" Name="Points" NumberOfComponents="3" format="ascii">
          {points_text}
        </DataArray>
      </Points>
      <Lines>
        <DataArray type="Int64" Name="connectivity" format="ascii">
          {connectivity}
        </DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii">
          {offsets}
        </DataArray>
      </Lines>
    </Piece>
  </PolyData>
</VTKFile>
"""
    vtp = tmp_path / "arc_length_branch0.vtp"
    vtp.write_text(xml)
    cl = read_centerline_vtp(str(vtp))
    assert len(cl.branch_start_indices) == 2
    b0_len = cl.branch_start_indices[1] - cl.branch_start_indices[0]
    assert b0_len == len(line_a)


def test_build_contour_attaches_measurements_for_lumen():
    # contour.rs:482-510 — a Record's measurement_1/2 become the lumen
    # contour's aortic/pulmonary thickness
    from multimodars_tpu.io.build import build_contours_with_mapping
    from multimodars_tpu.models.record import PyRecord

    pts = [PyContourPoint(1, 0, 0.0, 0.0, 0.0, False)]
    records = [PyRecord(1, "systolic", 1.23, 4.56)]
    contours = build_contours_with_mapping(pts, records, "Lumen", {1: 0})
    assert len(contours) == 1
    c = contours[0]
    assert c.id == 0
    assert c.aortic_thickness == 1.23
    assert c.pulmonary_thickness == 4.56


def test_build_contour_ignores_measurements_for_non_lumen():
    # contour.rs:512-540 — non-lumen contours never carry measurements
    from multimodars_tpu.io.build import build_contours_with_mapping
    from multimodars_tpu.models.record import PyRecord

    pts = [PyContourPoint(1, 0, 0.0, 0.0, 0.0, False)]
    records = [PyRecord(1, "systolic", 7.0, 8.0)]
    contours = build_contours_with_mapping(pts, records, "Catheter", {1: 0})
    assert len(contours) == 1
    assert contours[0].aortic_thickness is None
    assert contours[0].pulmonary_thickness is None
