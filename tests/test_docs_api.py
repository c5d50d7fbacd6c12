"""docs/api.md is generated from live docstrings (docs/gen_api.py) — this
keeps it in sync: if a public signature or summary changes without
regenerating, the test fails with the drift."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_api_doc_in_sync(tmp_path):
    committed = (ROOT / "docs" / "api.md").read_text()
    # regenerate in a scratch checkout of the docs dir layout
    proc = subprocess.run(
        [sys.executable, str(ROOT / "docs" / "gen_api.py")],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr
    regenerated = (ROOT / "docs" / "api.md").read_text()
    try:
        assert regenerated == committed, (
            "docs/api.md is stale — run `python docs/gen_api.py` and commit"
        )
    finally:
        # restore the committed content so a failing run leaves no dirt
        (ROOT / "docs" / "api.md").write_text(committed)
