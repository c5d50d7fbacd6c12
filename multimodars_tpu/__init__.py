"""multimodars_tpu — TPU-native multi-modality cardiac image fusion.

A from-scratch JAX/XLA/Pallas re-design of the multimoda-rs (multimodars)
package: intravascular pullback registration, centerline alignment and CCTA
mesh fusion, with the hot compute paths expressed as batched, jittable
array programs that scale over frames, angle candidates and patients.

Public API parity target: ``/root/reference/multimodars/__init__.py``.
"""

from . import config as _config  # noqa: F401  (enables x64, sets dtypes)

from .models import (
    PyContourPoint,
    PyContour,
    PyFrame,
    PyGeometry,
    PyGeometryPair,
    PyCenterline,
    PyCenterlinePoint,
    PyInputData,
    PyRecord,
    PyContourType,
    PyDiscretizedVesselTree,
)

__version__ = "0.1.0"

__all__ = [
    "PyContourPoint",
    "PyContour",
    "PyFrame",
    "PyGeometry",
    "PyGeometryPair",
    "PyCenterline",
    "PyCenterlinePoint",
    "PyInputData",
    "PyRecord",
    "PyContourType",
    "PyDiscretizedVesselTree",
]
