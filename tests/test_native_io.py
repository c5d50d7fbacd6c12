"""Native (C++/ctypes) I/O library tests: CSV parser and OBJ writer parity
with the pure-Python implementations."""

import numpy as np
import pytest

from multimodars_tpu.io.native import get_library, read_contour_csv_native


needs_native = pytest.mark.skipif(
    get_library() is None, reason="native mmio library unavailable"
)


@needs_native
def test_csv_parser_matches_python(tmp_path):
    from multimodars_tpu.io.csv_io import read_contour_data

    csv = tmp_path / "contours.csv"
    csv.write_text(
        "1,0.5,1.25,2.0\n"
        "1,0.6,1.35,2.0\n"
        "garbage,row,here\n"
        "2,-0.25,0.125,3.5\n"
    )
    native = read_contour_csv_native(csv)
    python_pts = read_contour_data(csv)
    assert native.shape == (3, 5)
    assert len(python_pts) == 3
    for row, p in zip(native, python_pts):
        assert row[0] == p.frame_index
        assert row[1] == p.x and row[2] == p.y and row[3] == p.z


@needs_native
def test_csv_parser_tab_delimited(tmp_path):
    csv = tmp_path / "contours.csv"
    csv.write_text("4\t1.0\t2.0\t3.0\n4\t1.5\t2.5\t3.0\n")
    native = read_contour_csv_native(csv)
    assert native.shape == (2, 5)
    assert native[0].tolist() == [4.0, 1.0, 2.0, 3.0, 0.0]


@needs_native
def test_obj_writer_roundtrip(tmp_path):
    import math

    from multimodars import numpy_to_geometry
    from multimodars_tpu.io.obj_io import extract_contours_by_type, write_obj_mesh
    from multimodars_tpu.pipelines.to_object import compute_uv_coordinates

    rows = []
    for f in range(3):
        for i in range(8):
            th = 2 * math.pi * i / 8
            rows.append([f, 2 * math.cos(th), 2 * math.sin(th), float(f)])
    geom = numpy_to_geometry(np.array(rows))
    contours = extract_contours_by_type(geom, "Lumen")
    uv = compute_uv_coordinates(contours)

    write_obj_mesh(contours, uv, str(tmp_path / "native.obj"), "m.mtl", True)

    text = (tmp_path / "native.obj").read_text()
    n_v = sum(1 for l in text.splitlines() if l.startswith("v "))
    n_f = sum(1 for l in text.splitlines() if l.startswith("f "))
    assert n_v == 3 * 8 + 2  # vertices + 2 cap centroids
    assert n_f == 2 * 8 * 2 + 2 * 8  # shell quads*2 + 2 caps
    # vertex values round-trip exactly
    first_v = text.splitlines()[0].split()[1:]
    assert float(first_v[0]) == geom.frames[0].lumen.xyz_view()[0, 0]
