"""Padded-array ("tensor") form of a geometry for the TPU pipelines.

The reference's pointer-rich ``Vec<Frame>`` / ``HashMap<ContourType, Contour>``
becomes fixed-shape arrays with validity masks so every pipeline stage is a
single jittable batched op:

- ``points[kind]``: float[F, P_kind, 3] padded point stacks per contour type
- ``masks[kind]``:  bool [F, P_kind]    validity of each padded slot
- ``centroids``:    float[F, 3]         frame centroids

Padded slots replicate the frame's first valid point (not zeros) so reductions
that forget a mask degrade gracefully; all shipped kernels apply masks with
+/-inf sentinels anyway.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from .geometry import PyGeometry


@jax.tree_util.register_pytree_node_class
@dataclass
class TensorGeometry:
    points: Dict[str, jax.Array]  # kind -> [F, P, 3]
    masks: Dict[str, jax.Array]  # kind -> [F, P]
    centroids: jax.Array  # [F, 3]

    def tree_flatten(self):
        kinds = tuple(sorted(self.points))
        children = (
            [self.points[k] for k in kinds]
            + [self.masks[k] for k in kinds]
            + [self.centroids]
        )
        return children, kinds

    @classmethod
    def tree_unflatten(cls, kinds, children):
        n = len(kinds)
        points = dict(zip(kinds, children[:n]))
        masks = dict(zip(kinds, children[n : 2 * n]))
        return cls(points=points, masks=masks, centroids=children[2 * n])

    @property
    def n_frames(self) -> int:
        return int(self.centroids.shape[0])


def pack_contours(
    contours_xyz: List[np.ndarray], pad_to: Optional[int] = None, dtype=np.float64
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a ragged list of (n_i, 3) arrays to [F, P, 3] + mask [F, P]."""
    F = len(contours_xyz)
    P = pad_to if pad_to is not None else max((c.shape[0] for c in contours_xyz), default=0)
    pts = np.zeros((F, max(P, 1), 3), dtype=dtype)
    mask = np.zeros((F, max(P, 1)), dtype=bool)
    for i, c in enumerate(contours_xyz):
        n = min(c.shape[0], P)
        if n > 0:
            pts[i, :n] = c[:n]
            pts[i, n:] = c[0]  # replicate first point into padding
            mask[i, :n] = True
    return pts, mask


def geometry_to_tensor(
    geometry: PyGeometry, kinds: Optional[List[str]] = None, dtype=np.float64
) -> TensorGeometry:
    """Pack a PyGeometry into padded arrays (host -> device boundary)."""
    import jax.numpy as jnp

    frames = geometry.frames
    if kinds is None:
        kinds = ["Lumen"] + sorted(
            {k for f in frames for k in f.extras.keys()}
        )
    points: Dict[str, jax.Array] = {}
    masks: Dict[str, jax.Array] = {}
    for kind in kinds:
        per_frame = []
        for f in frames:
            contour = f.lumen if kind == "Lumen" else f.extras.get(kind)
            per_frame.append(
                contour.xyz().astype(dtype) if contour is not None else np.zeros((0, 3), dtype)
            )
        pts, mask = pack_contours(per_frame, dtype=dtype)
        points[kind] = jnp.asarray(pts)
        masks[kind] = jnp.asarray(mask)
    centroids = jnp.asarray(
        np.array([f.centroid for f in frames], dtype=dtype)
        if frames
        else np.zeros((0, 3), dtype)
    )
    return TensorGeometry(points=points, masks=masks, centroids=centroids)


def tensor_to_geometry(tensor: TensorGeometry, template: PyGeometry) -> PyGeometry:
    """Write tensor coordinates back into a copy of ``template`` (device ->
    host boundary).  The template supplies ids/flags/extras structure; only
    x/y/z move."""
    out = template.copy()
    host_points = {k: np.asarray(v) for k, v in tensor.points.items()}
    host_centroids = np.asarray(tensor.centroids)
    for i, frame in enumerate(out.frames):
        for kind, arr in host_points.items():
            contour = frame.lumen if kind == "Lumen" else frame.extras.get(kind)
            if contour is None:
                continue
            n = len(contour.points)
            contour.set_xyz(arr[i, :n])
        frame.centroid = tuple(float(c) for c in host_centroids[i])
    return out
