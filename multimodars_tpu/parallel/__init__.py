"""Multi-chip scaling: device-mesh sharding of the registration workload."""

from .cohort import (
    cohort_mesh,
    cohort_relative_rotations,
    batched_pairs_from_geometries,
)

__all__ = [
    "cohort_mesh",
    "cohort_relative_rotations",
    "batched_pairs_from_geometries",
]
