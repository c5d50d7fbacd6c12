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


def test_native_and_fallback_accept_identical_edge_rows(tmp_path):
    """ADVICE parity: malformed frame ids ('3.0', '-3', '1e2') and loose
    aortic tokens ('10') must be handled identically by the native parser
    and the pure-Python fallback."""
    import numpy as np

    from multimodars_tpu.io import native as native_mod
    from multimodars_tpu.io.csv_io import read_contour_data

    rows = (
        "0\t1.0\t2.0\t3.0\ttrue\n"   # kept, aortic
        "1\t1.0\t2.0\t3.0\t10\n"     # kept, NOT aortic ('10' != '1')
        "3.0\t1.0\t2.0\t3.0\n"        # skipped: float frame id
        "-3\t1.0\t2.0\t3.0\n"         # skipped: negative frame id
        "1e2\t1.0\t2.0\t3.0\n"        # skipped: exponent frame id
        "+7\t1.0\t2.0\t3.0\t1\n"     # kept, aortic ('+' sign ok, like u32)
        "2\tx\t2.0\t3.0\n"            # skipped: bad float
    )
    path = tmp_path / "edge.csv"
    path.write_text(rows)

    fallback = [
        (p.frame_index, p.x, p.y, p.z, p.aortic) for p in read_contour_data(path)
    ]

    lib = native_mod.get_library()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    arr = native_mod.read_contour_csv_native(str(path))
    assert arr is not None
    native = [(int(r[0]), r[1], r[2], r[3], bool(r[4])) for r in arr.tolist()]

    assert native == fallback
    assert [f for f, *_ in native] == [0, 1, 7]
    assert [a for *_, a in native] == [True, False, True]


class TestCsvFrameFieldParity:
    """Native and Python CSV readers must accept/reject identical rows
    (u32 frame semantics like the reference's serde deserialize)."""

    CASES = [
        ("3,1.0,2.0,0.5", True),
        ("+3,1.0,2.0,0.5", True),
        (" 3 ,1.0,2.0,0.5", True),      # strip()
        ("3.0,1.0,2.0,0.5", False),      # float frame: reject
        ("-3,1.0,2.0,0.5", False),       # negative: reject
        ("1_0,1.0,2.0,0.5", False),      # underscore: reject
        ("5000000000,1.0,2.0,0.5", False),  # > u32: reject
        ("3,1.0,2.0,0.5,1", True),       # aortic 1
        ("3,1.0,2.0,0.5,true", True),
        ("3,1.0,2.0,0.5,10", True),      # '10' is a kept row, aortic False
    ]

    def _write(self, tmp_path, text):
        p = tmp_path / "contours.csv"
        p.write_text(text + "\n")
        return p

    @pytest.mark.parametrize("row,kept", CASES)
    def test_python_native_agree(self, tmp_path, row, kept):
        from multimodars_tpu.io.csv_io import read_contour_data
        from multimodars_tpu.io.native import read_contour_csv_native

        p = self._write(tmp_path, row)
        py_rows = read_contour_data(p)
        assert (len(py_rows) == 1) == kept
        native = read_contour_csv_native(str(p))
        if native is None:
            pytest.skip("native library unavailable")
        assert (len(native) == 1) == kept
        if kept:
            assert int(native[0][0]) == py_rows[0].frame_index
            assert bool(native[0][4]) == py_rows[0].aortic

    def test_aortic_padded_token_value(self, tmp_path):
        from multimodars_tpu.io.csv_io import read_contour_data
        from multimodars_tpu.io.native import read_contour_csv_native

        p = self._write(tmp_path, "3,1.0,2.0,0.5, true ")
        py_rows = read_contour_data(p)
        assert py_rows[0].aortic is True
        native = read_contour_csv_native(str(p))
        if native is None:
            pytest.skip("native library unavailable")
        assert bool(native[0][4]) is True


class TestMinSqdistColsNative:
    """mm_min_sqdist_cols must be bit-identical to the numpy column sweep
    (first-j-wins ties, ((dx2+dy2)+dz2) summation order)."""

    def test_matches_numpy_sweep(self):
        from multimodars_tpu.io.native import min_sqdist_cols_native

        rng = np.random.default_rng(8)
        a = np.ascontiguousarray(rng.uniform(-10, 10, (5000, 3)))
        b = np.ascontiguousarray(rng.uniform(-10, 10, (60, 3)))
        res = min_sqdist_cols_native(a, b)
        if res is None:
            pytest.skip("native library without mm_min_sqdist_cols")
        mins, args = res
        # hand-run the exact numpy sweep
        best = np.full(len(a), np.inf)
        bj = np.zeros(len(a), dtype=np.int64)
        for j in range(len(b)):
            d = (a[:, 0] - b[j, 0]) ** 2
            d = d + (a[:, 1] - b[j, 1]) ** 2
            d = d + (a[:, 2] - b[j, 2]) ** 2
            upd = d < best
            bj[upd] = j
            best[upd] = d[upd]
        assert (args == bj).all()
        assert (mins == best).all()

    def test_exact_tie_first_wins(self):
        from multimodars_tpu.io.native import min_sqdist_cols_native

        a = np.ascontiguousarray([[0.0, 0.0, 0.0]])
        b = np.ascontiguousarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
        res = min_sqdist_cols_native(a, b)
        if res is None:
            pytest.skip("native library without mm_min_sqdist_cols")
        mins, args = res
        assert args[0] == 0 and mins[0] == 1.0
