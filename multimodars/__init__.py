"""Drop-in compatibility shim: exposes the TPU-native implementation under
the reference package name, so existing ``import multimodars as mm`` code
keeps working unchanged — including submodule imports like
``from multimodars.ccta import labeling``."""

import sys as _sys

from multimodars_tpu import *  # noqa: F401,F403
from multimodars_tpu import __all__, __version__  # noqa: F401

import multimodars_tpu.ccta as ccta  # noqa: F401,E402
import multimodars_tpu.io as io  # noqa: F401,E402
import multimodars_tpu.models as models  # noqa: F401,E402
import multimodars_tpu.ops as ops  # noqa: F401,E402
import multimodars_tpu.parallel as parallel  # noqa: F401,E402
import multimodars_tpu.pipelines as pipelines  # noqa: F401,E402
import multimodars_tpu.utils as utils  # noqa: F401,E402

# register package aliases so "import multimodars.ccta.labeling" etc.
# resolve through the real packages' __path__
for _name, _mod in (
    ("ccta", ccta), ("io", io), ("models", models), ("ops", ops),
    ("parallel", parallel), ("pipelines", pipelines), ("utils", utils),
):
    _sys.modules[__name__ + "." + _name] = _mod


# Deep dotted imports ("from multimodars.ccta.fixing_functions import x")
# resolve submodules by NAME through the parent's __path__, which would
# re-execute the module under the alias package and break its relative
# imports.  A meta-path alias finder hands back the one true
# multimodars_tpu module object instead.
import importlib as _importlib  # noqa: E402
import importlib.abc as _importlib_abc  # noqa: E402
import importlib.util as _importlib_util  # noqa: E402


class _AliasLoader(_importlib_abc.Loader):
    def __init__(self, real_name: str):
        self._real_name = real_name

    def create_module(self, spec):
        return _importlib.import_module(self._real_name)

    def exec_module(self, module):  # already executed under its real name
        pass


class _AliasFinder(_importlib_abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if not name.startswith("multimodars."):
            return None
        real = "multimodars_tpu." + name.split(".", 1)[1]
        try:
            if _importlib_util.find_spec(real) is None:
                return None
        except (ImportError, ValueError):
            return None
        return _importlib_util.spec_from_loader(name, _AliasLoader(real))


_sys.meta_path.insert(0, _AliasFinder())
