# Sphinx configuration for the multimodars_tpu documentation.
#
# The docs are authored in Markdown (myst_parser); the same files render on
# plain GitHub.  Build:  pip install sphinx myst-parser && make html
# (CI job `docs-build` runs exactly that with -W).
# Parity: the reference ships a buildable sphinx tree
# (/root/reference/docs/conf.py, Makefile, rst tutorials); this tree is the
# Markdown-first equivalent.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "multimodars_tpu"
author = "multimodars_tpu contributors"


def _version() -> str:
    meta = os.path.join(os.path.dirname(__file__), "..", "pyproject.toml")
    try:
        with open(meta) as f:
            for line in f:
                if line.strip().startswith("version"):
                    return line.split("=", 1)[1].strip().strip("\"'")
    except OSError:
        pass
    return "0.0.0"


version = release = _version()

extensions = ["myst_parser"]
# autodoc is optional: the package imports fine on a CPU-only CI box, but
# keep the build independent of importability
try:  # pragma: no cover - docs-build environment only
    import sphinx.ext.autodoc  # noqa: F401

    extensions.append("sphinx.ext.autodoc")
except ImportError:
    pass

source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
root_doc = "index"
exclude_patterns = ["_build", "notebooks/.ipynb_checkpoints"]

myst_enable_extensions = ["colon_fence", "deflist"]
myst_heading_anchors = 3

html_theme = "alabaster"
html_title = f"{project} {version}"
