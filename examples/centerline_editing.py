"""Programmatic centerline editing.

The reference ships an interactive matplotlib editor
(examples/edit_centerline.py); headless environments get the same
operations as API calls: branch extraction, sharp-angle detection,
split / merge, VTP cleanup, and saving back out.

Run:  python examples/centerline_editing.py [output_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import multimodars as mm

REF_DATA = Path("/root/reference/examples/data")
VENDORED = Path(__file__).resolve().parent.parent / "tests" / "data" / "centerlines"


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("output/centerline")
    out.mkdir(parents=True, exist_ok=True)
    data = REF_DATA if (REF_DATA / "rca_cl.vtp").exists() else VENDORED

    # 1. parse the ASCII VTP (longest branch by arc length becomes branch 0)
    cl = mm.read_centerline_vtp(str(data / "rca_cl.vtp"))
    branches = sorted({p.branch_id for p in cl.points})
    print(f"loaded {len(cl.points)} points in {len(branches)} branches")

    # 2. standard VTP cleanup: trim side-branch prefixes overlapping the
    # main branch, strip the inlet, smooth
    cleaned = cl.cleanup_vtp_data(rm_start_mm=3.0, smooth=True, smooth_sigma=2.0)
    print(f"after cleanup: {len(cleaned.points)} points")

    # 3. find kinks sharper than ~45 degrees on the main branch
    sharp = cleaned.find_sharp_angles(0, 0.7)
    print(f"sharp angles on branch 0 at positions: {sharp}")

    # 4. split the main branch at the first sharp angle (if any), then merge
    # back — the round trip keeps point order and renumbers indices
    if sharp:
        split = cleaned.split_branch(0, sharp[0])
        print(f"split -> {len(split.branch_start_indices)} branches")
        merged = split.merge_branches(0, len(split.branch_start_indices) - 1)
        print(f"merged back -> {len(merged.branch_start_indices)} branches")
        cleaned = merged

    # 5. save the main branch as an OBJ polyline + CSV
    from multimodars_tpu.io.write_geometries import centerline_to_obj

    centerline_to_obj(cleaned, str(out / "rca_centerline.obj"))
    main_branch = cleaned.get_branch(0)
    arr = np.array(
        [(p.contour_point.x, p.contour_point.y, p.contour_point.z)
         for p in main_branch.points]
    )
    np.savetxt(out / "rca_centerline_edited.csv", arr, delimiter=",")
    print(f"saved {len(arr)} edited centerline points to {out}")


if __name__ == "__main__":
    main()
