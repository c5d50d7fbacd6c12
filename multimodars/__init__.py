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
