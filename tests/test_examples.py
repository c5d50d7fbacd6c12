"""Executable-docs tier: every example script runs end to end in a
subprocess (the reference's `pytest --nbmake docs/notebooks/` analog,
CI.yml:22-45) and leaves its advertised artifacts behind."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = ROOT / "examples"


def _run(script, args, tmp_path, timeout=900):
    env = dict(os.environ)
    # examples inherit the test session's CPU pinning so they never contend
    # with a concurrently-running TPU process — but NOT its 8-virtual-device
    # XLA_FLAGS, which would force fresh slow compiles of every program for
    # an 8-device topology the examples never use
    env["JAX_PLATFORMS"] = "cpu"  # force: the host profile exports =axon
    env.pop("XLA_FLAGS", None)
    # coarse search step: the examples demonstrate the API, not throughput;
    # a single-stage ladder keeps the per-subprocess CPU compile cheap
    env.setdefault("MMTPU_EXAMPLE_STEP", "1.0")
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / script), *args],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    return proc


def test_full_pipeline_example(tmp_path):
    proc = _run("full_pipeline.py", [str(tmp_path / "out")], tmp_path)
    assert "Successfully built geometry" in proc.stdout
    written = list((tmp_path / "out").rglob("*.obj"))
    assert written, "full_pipeline should write OBJ meshes"


def test_cohort_serving_example(tmp_path):
    proc = _run("cohort_serving.py", ["2"], tmp_path)
    assert "pullback" in proc.stdout.lower() or "cohort" in proc.stdout.lower()


def test_ccta_fusion_example(tmp_path):
    proc = _run("ccta_fusion.py", [str(tmp_path / "ccta")], tmp_path)
    written = list((tmp_path / "ccta").rglob("*.stl")) + list(
        (tmp_path / "ccta").rglob("*.obj")
    )
    assert written, "ccta_fusion should export meshes"


def test_centerline_editing_example(tmp_path):
    proc = _run("centerline_editing.py", [str(tmp_path / "cl")], tmp_path)
    assert "after cleanup" in proc.stdout
    assert (tmp_path / "cl" / "rca_centerline_edited.csv").exists()


def test_hole_filling_example(tmp_path):
    proc = _run("hole_filling.py", [str(tmp_path / "rep")], tmp_path)
    assert "watertight? True" in proc.stdout
    assert (tmp_path / "rep" / "repaired.stl").exists()


def test_centerline_registration_example(tmp_path):
    proc = _run("centerline_registration.py", [str(tmp_path / "reg")], tmp_path)
    assert "registered onto centerline" in proc.stdout
    assert list((tmp_path / "reg").glob("*.obj"))


def test_blender_import_example_guards_outside_blender(tmp_path):
    """blender_import.py is a bpy script; outside Blender it must exit with
    a clear message instead of a traceback."""
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / "blender_import.py"), str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "must run inside Blender" in (proc.stdout + proc.stderr)
