"""Test configuration: CPU backend with a virtual 8-device mesh so sharding
paths compile and run without TPU hardware (the reference's "fake backend"
analog — SURVEY.md §4)."""

import os

os.environ.setdefault("MMTPU_HOST_MALLOC_TUNING", "1")

# FORCE cpu (not setdefault): login profiles on axon hosts export
# JAX_PLATFORMS=axon, and inheriting that sends every test subprocess to the
# single-client TPU tunnel — the root cause of multi-minute example stalls
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MMTPU_COMPUTE_DTYPE"] = "float64"  # reference parity is f64
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import math  # noqa: E402
from pathlib import Path  # noqa: E402

import jax  # noqa: E402

# vendored golden fixtures (anonymized clinical CSV pullbacks shipped by the
# reference); parity tests must never silently skip
FIXTURES_DIR = Path(__file__).resolve().parent / "data" / "fixtures"

import pytest  # noqa: E402

# The axon image preimports jax at interpreter startup (sitecustomize on
# PYTHONPATH) with the login profile's JAX_PLATFORMS=axon, freezing the
# platform list before this file's env assignment is seen — so re-assert
# the CPU platform through the config API (works while no backend is live).
jax.config.update("jax_platforms", "cpu")
# The update silently no-ops when a backend is already live (it never
# raises), so verify with a positive check and pin the default device if
# the platform switch did not take.
if jax.default_backend() != "cpu":  # pragma: no cover - preinitialized backend
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

from multimodars_tpu import (  # noqa: E402
    PyContour,
    PyContourPoint,
    PyFrame,
    PyGeometry,
)

SQUAREISH = [(1.0, 3.0), (0.0, 2.0), (0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 2.0)]


def make_contour(id_, xy, z, original_frame=None, kind="Lumen"):
    points = [
        PyContourPoint(id_, i, x, y, z, False) for i, (x, y) in enumerate(xy)
    ]
    c = PyContour(
        id_,
        original_frame if original_frame is not None else id_,
        points,
        (0.0, 0.0, z),
        None,
        None,
        kind,
    )
    c.compute_centroid()
    return c


def dummy_geometry():
    """Replica of the reference synthetic fixture ``dummy_geometry``
    (src/intravascular/utils/test_utils.rs:111-336): three square-ish frames
    with baked-in rotations of 0/15/30 deg and translations (0,0)/(1,1)/(2,2).
    """
    contours = []
    for fid, (orig, dz, rot_deg, t) in enumerate(
        [(1, 0.0, 0.0, (0.0, 0.0)), (2, 1.0, 15.0, (1.0, 1.0)), (3, 2.0, 30.0, (2.0, 2.0))]
    ):
        c = make_contour(fid, SQUAREISH, dz, original_frame=orig)
        c = c.translate(t[0], t[1], 0.0)
        c.compute_centroid()
        cx, cy, _ = c.centroid
        c.rotate_rad_inplace(math.radians(rot_deg), (cx, cy))
        contours.append(c)

    frames = []
    for i, c in enumerate(contours):
        ref = PyContourPoint(1, 0, 3.0, 1.0, 0.0, False) if i == 0 else None
        frames.append(PyFrame(c.id, c.centroid, c, {}, ref))
    return PyGeometry(frames, "dummy_geometry")


def dummy_geometry_aligned_long():
    """Replica of ``dummy_geometry_aligned_long`` (test_utils.rs:338-384):
    six aligned frames at z = 0..5."""
    g1 = dummy_geometry()
    g1.frames[1].translate_inplace(-1.0, -1.0, 0.0)
    g1.frames[2].translate_inplace(-2.0, -2.0, 0.0)
    c1 = g1.frames[1].centroid
    g1.frames[1].rotate_inplace(math.radians(-15.0), (c1[0], c1[1]))
    c2 = g1.frames[2].centroid
    g1.frames[2].rotate_inplace(math.radians(-30.0), (c2[0], c2[1]))

    g2 = g1.copy()
    for i, frame in enumerate(g2.frames):
        idx = i + 3
        frame.translate_inplace(0.0, 0.0, 4.0)
        frame.set_value(idx, None, frame.lumen.centroid, float(idx))

    frames = g1.frames + g2.frames
    frames[3].reference_point = None
    return PyGeometry(frames, "dummy_geometry_center_reference")


@pytest.fixture
def dummy_geom():
    return dummy_geometry()


@pytest.fixture
def dummy_geom_aligned_long():
    return dummy_geometry_aligned_long()
