"""Executable-docs: run every docs/notebooks/*.ipynb top to bottom
(the reference CI's `pytest --nbmake docs/notebooks/` tier, CI.yml:22-45;
executed with nbclient since nbmake isn't vendored here)."""

from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

NOTEBOOKS = sorted(
    (Path(__file__).resolve().parent.parent / "docs" / "notebooks").glob("*.ipynb")
)


def test_notebooks_exist():
    assert NOTEBOOKS, "docs/notebooks should ship executable tutorials"


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(path, tmp_path):
    nb = nbformat.read(path, as_version=4)
    # execute in place (like nbmake): the notebooks' path-setup cell finds
    # the repo root by walking up from their own directory
    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": str(path.parent)}},
    )
    client.execute()
