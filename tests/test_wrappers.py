"""End-to-end smoke tests of the public processing API (mirrors the
reference tests/test_wrappers.py, plus OBJ output checks)."""

import os
from pathlib import Path

import numpy as np
import pytest

from multimodars import (
    from_array_single,
    from_array_singlepair,
    from_file_single,
    numpy_to_inputdata,
    to_obj,
)

FIXTURES = Path(__file__).resolve().parent / "data" / "fixtures"

needs_fixtures = pytest.mark.skipif(
    not FIXTURES.exists(), reason="reference fixtures not mounted"
)


def _synthetic_input(diastole=True, n_frames=4, n_pts=24, label="test"):
    import math

    rows = []
    for f in range(n_frames):
        for i in range(n_pts):
            theta = 2 * math.pi * i / n_pts
            rows.append(
                [f, 4.5 + 2.0 * math.cos(theta), 4.5 + 2.0 * math.sin(theta), float(f)]
            )
    lumen = np.array(rows)
    ref = np.array([0, 7.0, 4.5, 0.0])
    return numpy_to_inputdata(lumen, ref, diastole, label=label)


def test_from_array_single(tmp_path):
    geom, logs = from_array_single(
        _synthetic_input(),
        step_rotation_deg=1.0,
        range_rotation_deg=10.0,
        image_center=(4.5, 4.5),
        radius=0.5,
        n_points=10,
        write_obj=True,
        output_path=str(tmp_path),
    )
    assert geom is not None
    assert isinstance(logs, list)
    assert len(logs) == 3
    assert all(len(entry) == 7 for entry in logs)
    # OBJ written for lumen/catheter/wall
    objs = list(tmp_path.glob("*.obj"))
    assert len(objs) == 3


def test_from_array_singlepair(tmp_path):
    pair, (logs_a, logs_b) = from_array_singlepair(
        _synthetic_input(True, label="dia"),
        _synthetic_input(False, label="sys"),
        step_rotation_deg=1.0,
        range_rotation_deg=10.0,
        n_points=10,
        write_obj=False,
    )
    assert pair.geom_a.frames and pair.geom_b.frames
    assert len(pair.geom_a.frames) == len(pair.geom_b.frames)
    assert isinstance(logs_a, list) and isinstance(logs_b, list)


@needs_fixtures
def test_from_file_single(tmp_path):
    geom, logs = from_file_single(
        str(FIXTURES / "idealized_geometry"),
        diastole=True,
        step_rotation_deg=1.0,
        range_rotation_deg=10.0,
        write_obj=False,
        output_path=str(tmp_path),
    )
    assert geom is not None
    assert len(logs) == len(geom.frames) - 1


def test_to_obj(tmp_path):
    geom, _ = from_array_single(
        _synthetic_input(), step_rotation_deg=1.0, range_rotation_deg=10.0,
        n_points=10, write_obj=False,
    )
    to_obj(geom, str(tmp_path), watertight=True)
    assert (tmp_path / "lumen.obj").exists()
    # parse the OBJ back: vertex count = frames * points (+2 watertight caps)
    text = (tmp_path / "lumen.obj").read_text()
    n_v = sum(1 for line in text.splitlines() if line.startswith("v "))
    assert n_v == len(geom.frames) * len(geom.frames[0].lumen.points) + 2


def test_from_array_cohort_matches_singles(tmp_path):
    """from_array_cohort registers N cases in one batched search and matches
    per-case from_array_single output exactly."""
    import numpy as np

    from multimodars import from_array_cohort, from_array_single, numpy_to_inputdata

    def make_case(seed):
        rng = np.random.default_rng(seed)
        theta = np.linspace(0, 2 * np.pi, 40, endpoint=False)
        rows = []
        for f in range(6):
            r = 1.5 + 0.3 * np.abs(rng.standard_normal(theta.shape))
            phi = theta + rng.uniform(-0.3, 0.3)
            rows.append(
                np.column_stack(
                    [
                        np.full(40, f),
                        4.5 + r * np.cos(phi),
                        4.5 + r * np.sin(phi),
                        np.full(40, f * 0.2),
                    ]
                )
            )
        ref = np.array([0, 7.0, 4.5, 0.0])
        return numpy_to_inputdata(np.concatenate(rows), ref, True, label=f"case{seed}")

    cases = [make_case(s) for s in (1, 2, 3)]
    cohort = from_array_cohort(
        cases, step_rotation_deg=1.0, range_rotation_deg=10.0,
        sample_size=40, smooth=False, verbose=False,
    )
    assert len(cohort) == 3
    for case, (geom, logs, _) in zip(cases, cohort):
        single, slogs = from_array_single(
            case, step_rotation_deg=1.0, range_rotation_deg=10.0,
            sample_size=40, smooth=False, write_obj=False,
        )
        assert len(logs) == len(slogs)
        for fg, fs in zip(geom.frames, single.frames):
            np.testing.assert_allclose(
                fg.lumen.xyz_view(), fs.lumen.xyz_view(), atol=1e-12
            )
