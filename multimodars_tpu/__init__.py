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
    from_array_cohort,
    align_three_point,
    align_manual,
    align_combined,
    to_obj,
    read_centerline_vtp,
    find_centerline_bounded_points_simple,
    find_proximal_distal_scaling,
    build_adjacency_map,
    discretize_vessel,
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
from .io import read_geometrical, write_geometries
from .ccta import label, scale, stitch, export_section_stl, create_wall_mesh
from .ccta.labeling import (
    label_geometry,
    label_anomalous_region,
    label_branches,
)
from .ccta.manipulating import (
    scale_region_centerline_morphing,
    find_distal_and_proximal_scaling,
    find_aorta_scaling,
    find_aortic_wall_scaling,
    remove_labeled_points_from_mesh,
    keep_labeled_points_from_mesh,
    sync_results_to_mesh,
    stitch_ccta_to_intravascular,
)
from .ccta.discretization_map import (
    prepare_centerlines,
    discretize_vessel_tree,
    find_sharp_angles,
)
from .ccta.fixing_functions import (
    fix_and_remesh_stitched_mesh,
    manual_hole_fill,
    postprocess_stitched_mesh,
)
from .ccta.debug_plots import plot_results_key, plot_centerline_edges, plot_sharp_angles
from .ccta.kernels import (
    remove_occluded_points_ray_triangle,
    adjust_diameter_centerline_morphing_simple,
    find_points_by_cl_region,
    clean_outlier_points,
    find_aortic_scaling as _kernel_find_aortic_scaling,  # noqa: F401
    find_aortic_points,
    find_faces_near_points,
    final_reclassification,
    fix_mesh_winding,
    smooth_mesh_labels,
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
    "from_array_cohort",
    "from_array_single",
    "align_three_point",
    "align_manual",
    "align_combined",
    "to_obj",
    "read_centerline_vtp",
    "find_centerline_bounded_points_simple",
    "find_proximal_distal_scaling",
    "build_adjacency_map",
    # I/O
    "read_geometrical",
    "write_geometries",
    # CCTA module
    "label",
    "scale",
    "stitch",
    "export_section_stl",
    "create_wall_mesh",
    "label_geometry",
    "label_anomalous_region",
    "scale_region_centerline_morphing",
    "find_distal_and_proximal_scaling",
    "find_aorta_scaling",
    "find_aortic_wall_scaling",
    "remove_labeled_points_from_mesh",
    "keep_labeled_points_from_mesh",
    "sync_results_to_mesh",
    "stitch_ccta_to_intravascular",
    "fix_and_remesh_stitched_mesh",
    "postprocess_stitched_mesh",
    "manual_hole_fill",
    "plot_results_key",
    "plot_centerline_edges",
    "plot_sharp_angles",
    "discretize_vessel",
    "prepare_centerlines",
    "discretize_vessel_tree",
    "find_sharp_angles",
    "label_branches",
    # CCTA kernels (pyfunction parity)
    "remove_occluded_points_ray_triangle",
    "adjust_diameter_centerline_morphing_simple",
    "find_points_by_cl_region",
    "clean_outlier_points",
    "find_aortic_points",
    "find_faces_near_points",
    "final_reclassification",
    "fix_mesh_winding",
    "smooth_mesh_labels",
]
