"""Run the reference's own Python test suite against this implementation.

The upstream tests import ``multimodars`` — resolved to our shim — and use
the reference checkout's bundled fixtures. Strongest available parity
check: every test the reference can run against itself must pass here,
with zero exclusions: ``import trimesh`` resolves to the
``multimodars_tpu/compat`` facade over the package-native Mesh.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")


@pytest.mark.skipif(
    not (REFERENCE / "tests").is_dir(), reason="reference checkout not mounted"
)
def test_reference_test_suite_passes():
    repo_root = str(Path(__file__).resolve().parents[1])
    driver = f"""
import os, sys
sys.path.insert(0, {repo_root!r})
sys.path.insert(1, os.path.join({repo_root!r}, "multimodars_tpu", "compat"))
import multimodars
import trimesh  # the compat facade over the native Mesh
os.chdir({str(REFERENCE)!r})
sys.path = [p for p in sys.path if p not in ("", os.getcwd())]
import pytest
raise SystemExit(pytest.main([
    "tests/", "-q", "-p", "no:cacheprovider",
]))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # force: the host profile exports =axon
    proc = subprocess.run(
        [sys.executable, "-c", driver],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, (
        f"reference suite failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
