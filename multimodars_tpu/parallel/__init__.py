"""Multi-chip scaling: device-mesh sharding of the registration workload."""

from ..utils.device import shard_rows_over
from .angle_shard import angle_mesh, sharded_multires_search
from .ccta_shard import rows_mesh, sharded_count_within_radius
from .cohort import (
    cohort_mesh,
    cohort_relative_rotations,
    batched_pairs_from_geometries,
)

__all__ = [
    "angle_mesh",
    "sharded_multires_search",
    "rows_mesh",
    "shard_rows_over",
    "sharded_count_within_radius",
    "cohort_mesh",
    "cohort_relative_rotations",
    "batched_pairs_from_geometries",
]
