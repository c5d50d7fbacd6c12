"""Core data model: user-facing Py* classes (API-compatible with the
reference multimodars package) plus the padded-array tensor form used by the
TPU compute pipelines.

Reference parity: the class surface mirrors
``/root/reference/multimodars/multimodars.pyi`` and the PyO3 bindings under
``src/types/binding/``.
"""

from .point import PyContourPoint, PyContourType, CONTOUR_TYPE_NAMES
from .contour import PyContour, downsample_contour_points
from .record import PyRecord, PyInputData
from .frame import PyFrame
from .geometry import PyGeometry, PyGeometryPair
from .centerline import PyCenterline, PyCenterlinePoint
from .vessel_tree import PyDiscretizedVesselTree
from .tensor import TensorGeometry, geometry_to_tensor, tensor_to_geometry

__all__ = [
    "PyContourPoint",
    "PyContourType",
    "PyContour",
    "PyRecord",
    "PyInputData",
    "PyFrame",
    "PyGeometry",
    "PyGeometryPair",
    "PyCenterline",
    "PyCenterlinePoint",
    "PyDiscretizedVesselTree",
    "TensorGeometry",
    "geometry_to_tensor",
    "tensor_to_geometry",
    "downsample_contour_points",
    "CONTOUR_TYPE_NAMES",
]
