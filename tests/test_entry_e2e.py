"""End-to-end smoke of the pair/full orchestrators on the shipped fixtures
(mirrors the reference's notebook-driven integration coverage)."""

from pathlib import Path

import pytest

from multimodars import from_file_doublepair, from_file_full, from_file_singlepair

FIXTURES = Path(__file__).resolve().parent / "data" / "fixtures"

pytestmark = pytest.mark.skipif(
    not FIXTURES.exists(), reason="reference fixtures not mounted"
)


def test_from_file_singlepair(tmp_path):
    pair, (logs_a, logs_b) = from_file_singlepair(
        str(FIXTURES / "ivus_rest"),
        step_rotation_deg=1.0,
        range_rotation_deg=10.0,
        sample_size=100,
        write_obj=False,
        smooth=False,
        postprocessing=True,
        output_path=str(tmp_path),
    )
    assert pair.geom_a.frames and pair.geom_b.frames
    # postprocessing trims to symmetric counts
    assert len(pair.geom_a.frames) == len(pair.geom_b.frames)
    # every frame carries a wall contour after alignment
    assert all("Wall" in f.extras for f in pair.geom_a.frames)
    assert logs_a and logs_b


def test_from_file_full(tmp_path):
    rest, stress, dia, sys_, logs = from_file_full(
        str(FIXTURES / "ivus_rest"),
        str(FIXTURES / "ivus_stress"),
        step_rotation_deg=1.0,
        range_rotation_deg=10.0,
        sample_size=100,
        write_obj=True,
        interpolation_steps=2,
        smooth=False,
        postprocessing=True,
        output_path_ab=str(tmp_path / "rest"),
        output_path_cd=str(tmp_path / "stress"),
        output_path_ac=str(tmp_path / "diastole"),
        output_path_bd=str(tmp_path / "systole"),
    )
    assert len(logs) == 4
    for pair in (rest, stress, dia, sys_):
        assert pair.geom_a.frames and pair.geom_b.frames
    # OBJ sequences written: start + 2 interpolated + end = 4 per type
    objs = list((tmp_path / "rest").glob("lumen_*.obj"))
    assert len(objs) == 4
    # textures and MTLs alongside
    assert list((tmp_path / "rest").glob("lumen_*.png"))
    assert list((tmp_path / "rest").glob("lumen_*.mtl"))


class TestFullPipelineLabels:
    """Ported semantics of the reference's fast_full label tests
    (functions.rs:1607-1662): the four GeometryPair labels are
    '{a} - {b}' of the input labels, identically for the file path and
    the prebuilt-InputData path."""

    EXPECTED = (
        "rest_dia - rest_sys",
        "stress_dia - stress_sys",
        "rest_dia - stress_dia",
        "rest_sys - stress_sys",
    )
    KW = dict(
        step_rotation_deg=5.0,
        range_rotation_deg=10.0,
        sample_size=50,
        write_obj=False,
        smooth=False,
        postprocessing=False,
    )

    def _file_labels(self):
        from multimodars import from_file_full

        pairs = from_file_full(
            str(FIXTURES / "ivus_rest"),
            str(FIXTURES / "ivus_stress"),
            labels=["rest_dia", "rest_sys", "stress_dia", "stress_sys"],
            **self.KW,
        )[:4]
        return tuple(p.label for p in pairs)

    def _array_labels(self):
        from multimodars import from_array_full
        from multimodars_tpu.io.csv_io import process_directory

        rest, stress = str(FIXTURES / "ivus_rest"), str(FIXTURES / "ivus_stress")
        names = {"Lumen": "lumen"}
        inputs = [
            process_directory(rest, names, True, "rest_dia"),
            process_directory(rest, names, False, "rest_sys"),
            process_directory(stress, names, True, "stress_dia"),
            process_directory(stress, names, False, "stress_sys"),
        ]
        pairs = from_array_full(*inputs, **self.KW)[:4]
        return tuple(p.label for p in pairs)

    def test_file_full_labels(self):
        assert self._file_labels() == self.EXPECTED

    def test_array_full_labels(self):
        assert self._array_labels() == self.EXPECTED

    def test_file_and_array_full_same_labels(self):
        assert self._file_labels() == self._array_labels()
