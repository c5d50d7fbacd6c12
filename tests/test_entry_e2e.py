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
