"""Alignment pipeline tests mirroring the reference's align_within unit
tests (align_within.rs:781-1001)."""

import math

import numpy as np
import pytest

from multimodars_tpu.pipelines.align_within import (
    align_frames_in_geometry,
    detect_holes,
    fill_holes,
    fix_one_frame_hole,
)


def test_simple_geometry(dummy_geom):
    """Parity: align_within.rs test_simple_geometry — recovers -15 deg per
    frame and tx = ty = -idx."""
    ref_idx = dummy_geom.find_ref_frame_idx()
    assert ref_idx == 0

    geom, logs, _ = align_frames_in_geometry(
        dummy_geom, 0.01, 30.0, smooth=False, bruteforce=False, sample_size=6,
        verbose=False,
    )

    assert geom.frames
    for a, b in [(0, 1), (0, 2)]:
        assert abs(geom.frames[a].lumen.points[0].x - geom.frames[b].lumen.points[0].x) < 1e-6
        assert abs(geom.frames[a].lumen.points[0].y - geom.frames[b].lumen.points[0].y) < 1e-6

    for i, log in enumerate(logs):
        idx = i + 1.0
        assert abs(log.rot_deg - (-15.0)) < 1e-6
        assert abs(log.tx - (-idx)) < 1e-6
        assert abs(log.ty - (-idx)) < 1e-6


def test_simple_geometry_bruteforce(dummy_geom):
    geom, logs, _ = align_frames_in_geometry(
        dummy_geom, 1.0, 30.0, smooth=False, bruteforce=True, sample_size=6,
        verbose=False,
    )
    for log in logs:
        assert abs(log.rot_deg - (-15.0)) < 1e-6


def test_detect_holes_and_fill_one_frame(dummy_geom_aligned_long):
    """Parity: align_within.rs test_detect_holes_and_fill_one_frame."""
    geometry = dummy_geom_aligned_long
    geometry.frames[5].translate_inplace(0.0, 0.0, 1.0)

    has_hole, baseline = detect_holes(geometry)
    assert has_hole
    assert abs(baseline - 1.0) < 1e-6

    new_frame = fix_one_frame_hole(geometry.frames[1], geometry.frames[2])
    assert abs(new_frame.centroid[2] - 1.5) < 1e-6
    for p in new_frame.lumen.points:
        assert abs(p.z - 1.5) < 1e-6

    new_geom = fill_holes(geometry)
    assert len(new_geom.frames) == 7
    for i, frame in enumerate(new_geom.frames):
        assert frame.id == i
        assert frame.lumen.id == i
        assert frame.centroid[2] == float(i)
        for p in frame.lumen.points:
            assert p.z == float(i)


def test_detect_holes_and_fill_two_frame(dummy_geom_aligned_long):
    geometry = dummy_geom_aligned_long
    geometry.frames[5].translate_inplace(0.0, 0.0, 2.0)
    new_geom = fill_holes(geometry)
    assert len(new_geom.frames) == 8
    for i, frame in enumerate(new_geom.frames):
        assert frame.id == i
        assert frame.centroid[2] == float(i)


def test_smoothing_effect(dummy_geom):
    geom_unsmoothed, _, _ = align_frames_in_geometry(
        dummy_geom.copy(), 0.1, 30.0, smooth=False, bruteforce=False, sample_size=10,
        verbose=False,
    )
    geom_smoothed, _, _ = align_frames_in_geometry(
        dummy_geom, 0.1, 30.0, smooth=True, bruteforce=False, sample_size=10,
        verbose=False,
    )
    assert len(geom_unsmoothed.frames) == len(geom_smoothed.frames)


def test_validation_errors(dummy_geom):
    from multimodars_tpu import PyGeometry

    with pytest.raises(ValueError):
        align_frames_in_geometry(PyGeometry([], "x"), 1.0, 10.0, False, False, 10)
    with pytest.raises(ValueError):
        align_frames_in_geometry(dummy_geom, 1.0, 10.0, False, False, 0)


FIXTURES_DIR = "/root/reference/data/fixtures"


@pytest.mark.skipif(
    not __import__("os").path.isdir(FIXTURES_DIR), reason="fixtures not mounted"
)
def test_idealized_geometry():
    """Parity: align_within.rs test_idealized_geometry — recovers ±15 deg
    rotations and ±0.01·idx translations on the shipped idealized fixture."""
    from multimodars_tpu.io import build_geometry_from_inputdata

    geometry = build_geometry_from_inputdata(
        None, FIXTURES_DIR + "/idealized_geometry", "stress", True,
        (4.5, 4.5), 0.5, 20, verbose=False,
    )
    geom, logs, anomalous = align_frames_in_geometry(
        geometry, 0.01, 20.0, smooth=True, bruteforce=False, sample_size=200,
        verbose=False,
    )
    assert geom.frames
    assert anomalous
    for log in logs:
        assert abs(abs(log.rot_deg) - 15.0) < 1.0
    for i, log in enumerate(logs):
        idx = i + 1.0
        assert abs(log.tx - (-0.01 * idx)) < 0.001
        assert abs(log.ty - (0.01 * idx)) < 0.001
