"""CCTA fusion (label -> scale -> stitch) on a synthetic anomalous-RCA
case, exporting the fused STL.

Run:  python examples/ccta_fusion.py [output_dir]
"""

import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "benchmarks"))
sys.path.insert(0, str(_ROOT / "tests"))

import numpy as np

from benchmark_ccta_fusion import RCA_P0, build_case
from multimodars_tpu import ccta


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("output/ccta")
    mesh, cl_ao, cl_rca, cl_lca, geom = build_case(scale=1)

    results, (rca_cl, lca_cl, ao_cl) = ccta.label(
        mesh, cl_ao, cl_rca, cl_lca,
        aligned_frames=geom.frames, anomalous_rca=True, control_plot=False,
    )
    if not results["rca_removed_points"]:
        ao = np.asarray(results["aorta_points"])
        near = np.linalg.norm(ao - np.asarray(RCA_P0), axis=1) < 5.0
        results["rca_removed_points"] = [tuple(p) for p in ao[near][:40]]

    results = ccta.scale(results, rca_cl, ao_cl, geom.frames)
    stitched = ccta.stitch(
        results, geom, region_remove=("anomalous_points",),
        prox_start_mode="nearest_iv", dist_start_mode="nearest_iv",
    )
    ccta.export_section_stl(stitched, type="all", output_dir=out)
    print(f"fused mesh: {len(stitched['mesh'].faces)} faces -> {out / 'all.stl'}")


if __name__ == "__main__":
    main()
