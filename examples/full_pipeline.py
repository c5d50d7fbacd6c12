"""Four-phase intravascular registration end to end.

Mirrors the reference's examples on its bundled IVUS rest/stress data
(read in place from the mounted reference checkout when available).

Run:  python examples/full_pipeline.py [output_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import multimodars as mm

# coarse demo step via env (the executable-docs test tier uses 1.0 so the
# CPU-backend compile of the full ladder stays cheap; the default matches
# the reference's benchmark configuration)
STEP = float(os.environ.get("MMTPU_EXAMPLE_STEP", "0.1"))

REF_DATA = Path("/root/reference/examples/data")
VENDORED = Path(__file__).resolve().parent.parent / "tests" / "data" / "fixtures"


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("output")
    data = REF_DATA if (REF_DATA / "ivus_rest").is_dir() else VENDORED
    rest = data / "ivus_rest"
    stress = data / "ivus_stress"
    if not rest.is_dir():
        raise SystemExit(
            "example data not found — point REF_DATA at a directory with "
            "ivus_rest/ivus_stress in the AIVUS-CAA CSV layout"
        )
    pair_ab, pair_cd, pair_ac, pair_bd, *logs = mm.from_file_full(
        input_path_ab=str(rest),
        input_path_cd=str(stress),
        step_rotation_deg=STEP,
        range_rotation_deg=90.0,
        write_obj=True,
        output_path_ab=str(out / "rest"),
        output_path_cd=str(out / "stress"),
        output_path_ac=str(out / "diastole"),
        output_path_bd=str(out / "systole"),
    )
    print(pair_ab.get_summary())


if __name__ == "__main__":
    main()
