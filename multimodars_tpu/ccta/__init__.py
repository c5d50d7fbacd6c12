"""CCTA mesh fusion: labeling, scaling/morphing, discretization and
stitching of CT surface meshes onto intravascular geometry."""

from .mesh import Mesh, read_mesh_file
