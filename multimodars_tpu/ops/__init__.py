"""Jitted array kernels: the TPU compute path of multimodars_tpu.

- :mod:`hausdorff` — masked pairwise-distance Hausdorff reductions
- :mod:`rotation_search` — batched grid search with the reference's
  multi-resolution ladder semantics (vmapped over frames x angles)
- :mod:`pallas_kernels` — fused TPU kernels for the hot sweeps
"""

from .hausdorff import hausdorff_sq_masked, hausdorff_distance_masked
from .rotation_search import (
    search_range_batched,
    multires_rotation_search,
    rotation_cost_table,
)

__all__ = [
    "hausdorff_sq_masked",
    "hausdorff_distance_masked",
    "search_range_batched",
    "multires_rotation_search",
    "rotation_cost_table",
]
