"""Vertex-index bookkeeping for the CCTA pipelines.

The reference carries mesh labels as Python lists of coordinate tuples and
does set algebra on them (labeling.py / manipulating.py of the reference);
at 50k+ vertices that is both the dominant cost of ``mm.label`` and a
correctness hazard once coordinates move.  Here every region is an int64
array of vertex indices into the current mesh:

- set algebra is boolean-mask work (microseconds, not seconds),
- vertex MOVEMENT (scaling/morphing) never invalidates a region,
- only topology changes (vertex removal / submesh extraction) remap.

The public ``results`` dict keeps its reference-compatible shape — values
are lists of (x, y, z) tuples — with a hidden ``_idx`` side channel so
chained pipeline stages skip the coordinate→index lookups.  Functions that
receive a plain dict (user- or test-built) fall back to a vectorised
bit-pattern lookup.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_IDX_KEY = "_idx"
_IDX_MESH_KEY = "_idx_mesh"

#: region keys whose values are mesh-vertex coordinate lists
REGION_KEYS = (
    "aorta_points",
    "rca_points",
    "lca_points",
    "rca_removed_points",
    "lca_removed_points",
    "proximal_points",
    "distal_points",
    "anomalous_points",
    "boundary_points",
    "prox_boundary_points",
    "dist_boundary_points",
)


def coord_keys(arr: np.ndarray) -> np.ndarray:
    """(N,) structured uint64 view for exact bit-pattern identity."""
    a = np.ascontiguousarray(arr, dtype=np.float64).view(np.uint64).reshape(-1, 3)
    return (
        np.ascontiguousarray(a)
        .view([("x", np.uint64), ("y", np.uint64), ("z", np.uint64)])
        .reshape(-1)
    )


class VertexLookup:
    """Vectorised coordinate→index resolver over one mesh's vertex array.

    Duplicate coordinates resolve to the highest index, matching the
    reference's ``{tuple(v): i for i, v in enumerate(...)}`` dicts where a
    later vertex overwrites an earlier twin.
    """

    def __init__(self, vertices: np.ndarray):
        self.n = len(vertices)
        keys = coord_keys(vertices)
        order = np.argsort(keys, kind="stable")
        self._sorted = keys[order]
        if len(keys):
            # stable sort keeps original indices ascending inside each
            # duplicate run, so the run's last element is its max index
            starts = np.nonzero(np.r_[True, self._sorted[1:] != self._sorted[:-1]])[0]
            ends = np.r_[starts[1:], len(keys)]
            self._run_rep = np.repeat(order[ends - 1], ends - starts)
        else:
            self._run_rep = np.zeros(0, dtype=np.int64)

    def find(self, points) -> np.ndarray:
        """int64 indices of ``points`` in the vertex array (-1 if absent)."""
        pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        if pts.size == 0 or len(self._sorted) == 0:
            return np.full(len(pts), -1, dtype=np.int64)
        keys = coord_keys(pts)
        pos = np.searchsorted(self._sorted, keys)
        pos = np.minimum(pos, len(self._sorted) - 1)
        hit = self._sorted[pos] == keys
        out = np.where(hit, self._run_rep[pos], -1)
        return out.astype(np.int64)

    def find_present(self, points) -> np.ndarray:
        """Like :meth:`find` but with absent points dropped."""
        idx = self.find(points)
        return idx[idx >= 0]


def mesh_lookup(mesh) -> VertexLookup:
    """Per-mesh memoised VertexLookup (the structured argsort over 50k+
    vertices costs ~20 ms — callers share it through the mesh's cache,
    which every topology/position mutation already clears)."""
    cache = getattr(mesh, "_cache", None)
    if cache is None:
        return VertexLookup(mesh.vertices)
    hit = cache.get("vertex_lookup")
    if isinstance(hit, tuple) and hit[0] is mesh.vertices:
        return hit[1]
    lk = VertexLookup(mesh.vertices)
    cache["vertex_lookup"] = (mesh.vertices, lk)
    return lk


def as_points(vertices: np.ndarray, idx: np.ndarray) -> list:
    """Materialise index array -> reference-compatible list of tuples.

    zip over the three column lists builds the tuples in C — ~3x the
    throughput of a per-row ``tuple(row)`` comprehension on 100k+ rows."""
    a = vertices[np.asarray(idx, dtype=np.int64)]
    return list(zip(a[:, 0].tolist(), a[:, 1].tolist(), a[:, 2].tolist()))


def get_idx(
    results: dict, key: str, lookup: Optional[VertexLookup] = None
) -> np.ndarray:
    """Region's vertex indices: side channel when valid, else lookup."""
    mesh = results["mesh"]
    side = results.get(_IDX_KEY)
    if side is not None and results.get(_IDX_MESH_KEY) is mesh and key in side:
        return side[key]
    pts = results.get(key) or []
    if lookup is None:
        lookup = mesh_lookup(mesh)
    return lookup.find_present(pts)


def store_regions(
    results: dict, regions: Dict[str, np.ndarray], materialize=None
) -> dict:
    """Write regions back: tuple lists for the public surface + the index
    side channel for the next pipeline stage.  Mutates and returns
    ``results``.

    ``materialize``: when given, only these keys re-materialise their public
    tuple list (the rest keep the existing list object) — used by vertex
    moves that touched a known subset of regions, where the other regions'
    coordinates are bit-identical and rebuilding 30k-tuple lists per sync
    is pure waste."""
    mesh = results["mesh"]
    verts = mesh.vertices
    side = dict(results.get(_IDX_KEY) or {})
    if results.get(_IDX_MESH_KEY) is not mesh:
        side = {}
    for key, idx in regions.items():
        idx = np.asarray(idx, dtype=np.int64)
        side[key] = idx
        if materialize is None or key in materialize:
            results[key] = as_points(verts, idx)
    results[_IDX_KEY] = side
    results[_IDX_MESH_KEY] = mesh
    return results


def invalidate_idx(results: dict) -> None:
    results.pop(_IDX_KEY, None)
    results.pop(_IDX_MESH_KEY, None)


def mask_of(idx: np.ndarray, n: int) -> np.ndarray:
    m = np.zeros(n, dtype=bool)
    m[idx] = True
    return m
