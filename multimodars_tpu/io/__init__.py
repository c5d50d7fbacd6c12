"""File I/O: CSV contour readers, VTP centerline parser, geometry builder,
OBJ/MTL/texture writers, and the user-facing read/write helpers."""

from .csv_io import (
    read_contour_data,
    read_reference_point,
    read_records,
    read_centerline_vtp,
    InputData,
)
from .build import build_geometry_from_inputdata, check_geometry_integrity

__all__ = [
    "read_contour_data",
    "read_reference_point",
    "read_records",
    "read_centerline_vtp",
    "InputData",
    "build_geometry_from_inputdata",
    "check_geometry_integrity",
]
