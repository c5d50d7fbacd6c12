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

from ._processing import (
    from_file_full,
    from_file_doublepair,
    from_file_singlepair,
    from_file_single,
    from_array_full,
    from_array_doublepair,
    from_array_singlepair,
    from_array_single,
    to_obj,
    read_centerline_vtp,
    align_three_point,
    align_manual,
    align_combined,
)
from ._converters import (
    to_array,
    numpy_to_geometry,
    numpy_to_centerline,
    numpy_to_inputdata,
    array_to_pyinputdata,
    geometry_to_frames_array,
    geometry_to_trimesh,
)

__version__ = "0.1.0"

__all__ = [
    # Core classes
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
    # Converter functions
    "to_array",
    "numpy_to_geometry",
    "numpy_to_centerline",
    "numpy_to_inputdata",
    "array_to_pyinputdata",
    "geometry_to_frames_array",
    "geometry_to_trimesh",
    # Processing functions
    "from_file_full",
    "from_file_doublepair",
    "from_file_singlepair",
    "from_file_single",
    "from_array_full",
    "from_array_doublepair",
    "from_array_singlepair",
    "from_array_single",
    "to_obj",
    "read_centerline_vtp",
    "align_three_point",
    "align_manual",
    "align_combined",
]
