"""Mesh repair: fill holes in a surface and verify watertightness.

Mirrors the reference's examples/manual_hole.py on the in-house Mesh
toolkit (trimesh is not vendored here): build a tube with open ends and a
punched side hole, fan-fill every boundary loop, and export the repaired
surface.

Run:  python examples/hole_filling.py [output_dir]
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from multimodars_tpu.ccta.fixing_functions import filter_taubin, manual_hole_fill
from multimodars_tpu.ccta.mesh import Mesh


def tube_with_holes(n_rings=30, n_ring=24, radius=2.0) -> Mesh:
    verts, faces = [], []
    for i in range(n_rings):
        for k in range(n_ring):
            th = 2 * math.pi * k / n_ring
            verts.append((radius * math.cos(th), radius * math.sin(th), i * 0.5))
    for i in range(n_rings - 1):
        for k in range(n_ring):
            a0 = i * n_ring + k
            a1 = i * n_ring + (k + 1) % n_ring
            b0, b1 = a0 + n_ring, a1 + n_ring
            # punch a quad out of the side wall
            if i == n_rings // 2 and k in (0, 1, 2):
                continue
            faces.append([a0, a1, b0])
            faces.append([a1, b1, b0])
    return Mesh(np.asarray(verts), np.asarray(faces, dtype=np.int64))


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("output/repair")
    out.mkdir(parents=True, exist_ok=True)

    mesh = tube_with_holes()
    print(f"{mesh}; watertight? {mesh.is_watertight} "
          f"({len(mesh.boundary_loops())} boundary loops)")

    filter_taubin(mesh, iterations=5)
    repaired = manual_hole_fill(mesh)
    print(f"after manual_hole_fill: {repaired}; watertight? {repaired.is_watertight}")

    repaired.export(out / "repaired.stl")
    print(f"exported {out / 'repaired.stl'}")


if __name__ == "__main__":
    main()
