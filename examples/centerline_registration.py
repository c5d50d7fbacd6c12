"""Register an aligned IVUS pair onto a CCTA centerline.

Mirrors the reference's examples/stitching.py front half: singlepair
alignment of the bundled rest pullback, then three-point + Hausdorff
("combined") registration onto the RCA centerline.

Run:  python examples/centerline_registration.py [output_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import numpy as np

import multimodars as mm

STEP = float(os.environ.get("MMTPU_EXAMPLE_STEP", "0.5"))

REF_DATA = Path("/root/reference/examples/data")
ROOT = Path(__file__).resolve().parent.parent
V_FIX = ROOT / "tests" / "data" / "fixtures"
V_CL = ROOT / "tests" / "data" / "centerlines"


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("output/registration")
    out.mkdir(parents=True, exist_ok=True)
    ivus = REF_DATA / "ivus_rest" if (REF_DATA / "ivus_rest").is_dir() else V_FIX / "ivus_rest"
    cl_csv = (
        REF_DATA / "centerline_rca_short.csv"
        if (REF_DATA / "centerline_rca_short.csv").exists()
        else V_CL / "centerline_rca_short.csv"
    )

    rest, (dia_logs, sys_logs) = mm.from_file_singlepair(
        input_path=str(ivus),
        labels=["aligned_dia", "aligned_sys"],
        step_rotation_deg=STEP,
        write_obj=False,
    )
    print(f"aligned pair: {len(rest.geom_a.frames)} dia / "
          f"{len(rest.geom_b.frames)} sys frames")

    cl = mm.numpy_to_centerline(np.genfromtxt(cl_csv, delimiter=","))

    ref_frame = rest.geom_a.frames[0]
    rp = ref_frame.reference_point
    pts = ref_frame.lumen.points
    n = len(pts)
    # three-point registration (align_combined adds a Hausdorff refinement
    # against a labelled CCTA point cloud — see examples/ccta_fusion.py)
    aligned = mm.align_three_point(
        cl,
        rest,
        (rp.x, rp.y, rp.z),
        (pts[0].x, pts[0].y, pts[0].z),
        (pts[n // 2].x, pts[n // 2].y, pts[n // 2].z),
    )
    if isinstance(aligned, tuple):  # (aligned_target, resampled_centerline)
        aligned = aligned[0]
    geom = aligned.geom_a if hasattr(aligned, "geom_a") else aligned
    z = [f.centroid[2] for f in geom.frames]
    print(f"registered onto centerline: frame z span {min(z):.1f}..{max(z):.1f} mm")
    mm.to_obj(geom, str(out))
    print(f"wrote registered meshes to {out}")


if __name__ == "__main__":
    main()
