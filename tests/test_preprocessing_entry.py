"""Ported semantics of the reference's geometry-preparation tests
(processing/preprocessing.rs:243-520): input selection for Single/Pair/Full
— InputData preferred over paths, fallback to paths when InputData is
insufficient, and the failure cases."""

from pathlib import Path

import pytest

from multimodars_tpu.io.csv_io import process_directory
from multimodars_tpu.pipelines.entry import prepare_n_geometries

FIXTURES = Path(__file__).resolve().parent / "data" / "fixtures"
REST = FIXTURES / "ivus_rest"
STRESS = FIXTURES / "ivus_stress"

pytestmark = pytest.mark.skipif(
    not REST.is_dir(), reason="reference fixtures not mounted"
)

CENTER = (4.5, 4.5)
NAMES = {"Lumen": "lumen"}


def _inp(path, diastole, label):
    return process_directory(path, NAMES, diastole, label)


def _prepare(mode, input_data=None, path_a=None, path_b=None, labels=()):
    return prepare_n_geometries(
        labels, CENTER, 0.5, 20, input_data, True, path_a, path_b, mode,
        verbose=False,
    )


def _nframes(g):
    # path-built geometries arrive as the TensorGeometry array spine,
    # InputData-built ones as PyGeometry — both carry label + frame count
    return g.n_frames if hasattr(g, "n_frames") else len(g.frames)


def test_prepare_one_geometry_path():
    geoms = _prepare("single", path_a=str(REST))
    assert len(geoms) == 1
    assert _nframes(geoms[0]) > 0
    assert geoms[0].label == "ivus_rest"  # basename when no label given


def test_single_with_one_input_data():
    geoms = _prepare("single", input_data=[_inp(REST, True, "mine")])
    assert len(geoms) == 1
    assert geoms[0].label == "mine"


def test_prepare_two_geometry_one_path():
    geoms = _prepare("pair", path_a=str(REST))
    assert len(geoms) == 2  # diastole + systole from the same directory
    assert _nframes(geoms[0]) > 0 and _nframes(geoms[1]) > 0
    z0 = list(geoms[0].centroids[:, 2]) if hasattr(geoms[0], "centroids") \
        else [f.centroid[2] for f in geoms[0].frames]
    assert z0 == sorted(z0)


def test_pair_with_two_input_data():
    geoms = _prepare(
        "pair",
        input_data=[_inp(REST, True, "dia"), _inp(REST, False, "sys")],
    )
    assert [g.label for g in geoms] == ["dia", "sys"]


def test_full_with_four_input_data():
    inputs = [
        _inp(REST, True, "a"), _inp(REST, False, "b"),
        _inp(STRESS, True, "c"), _inp(STRESS, False, "d"),
    ]
    geoms = _prepare("full", input_data=inputs)
    assert [g.label for g in geoms] == ["a", "b", "c", "d"]


def test_full_with_two_paths():
    geoms = _prepare("full", path_a=str(REST), path_b=str(STRESS))
    assert len(geoms) == 4
    assert all(_nframes(g) > 0 for g in geoms)


def test_prefers_input_data_over_paths():
    # both provided: the InputData label wins, proving the path was ignored
    geoms = _prepare(
        "single", input_data=[_inp(REST, True, "from_input")], path_a=str(STRESS)
    )
    assert geoms[0].label == "from_input"


def test_insufficient_input_data_falls_back_to_paths():
    # pair needs 2 InputData; with only 1 the path is used for both phases
    geoms = _prepare(
        "pair", input_data=[_inp(REST, True, "only_one")], path_a=str(REST)
    )
    assert len(geoms) == 2
    assert all(g.label != "only_one" for g in geoms)


def test_single_fails_with_no_inputs():
    with pytest.raises(ValueError, match="Single processing requires"):
        _prepare("single")


def test_pair_fails_with_insufficient_inputs():
    with pytest.raises(ValueError, match="Pair processing requires"):
        _prepare("pair", input_data=[_inp(REST, True, "x")])


def test_full_fails_with_insufficient_inputs():
    # 3 InputData and only one path: neither source suffices
    inputs = [_inp(REST, True, "a"), _inp(REST, False, "b"), _inp(STRESS, True, "c")]
    with pytest.raises(ValueError, match="Full processing requires"):
        _prepare("full", input_data=inputs, path_a=str(REST))
