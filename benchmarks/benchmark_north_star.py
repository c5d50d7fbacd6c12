"""Benchmark 4: the driver-defined north star as a measured artifact.

BASELINE.json north star: full four-phase rest/stress x dia/sys registration
plus centerline alignment of a pullback in < 1 s on one TPU v5e chip.  This
script measures exactly that end-to-end config on the reference's own
example data:

  1. ``from_file_full`` on examples/data/{ivus_rest,ivus_stress}
     (step 0.5 deg, range +/-90 deg — the reference's canonical defaults,
     functions.rs:144-167; write_obj/smooth/postprocessing off per the
     reference's benchmark protocol, benchmarks/BENCHMARK_PLAN.md)
  2. ``read_centerline_vtp`` on examples/data/rca_cl.vtp
  3. ``align_three_point`` of the diastolic rest geometry onto the
     centerline

Warm runs excluded (compile cache + page faults), median of 5 recorded.
Output: benchmarks/results/north_star.json
"""

from __future__ import annotations

import os

os.environ.setdefault("MMTPU_HOST_MALLOC_TUNING", "1")
# prefault the measured benchmark working set upfront: this 1-vCPU
# host faults fresh anonymous pages pathologically slowly in its slow
# phases, and a mid-run burst of faults is the dominant worst-case
# noise source (north_star.json worst_observed; VERDICT r4 item 5)
os.environ.setdefault("MMTPU_PREFAULT_MB", "512")

import contextlib
import io
import json
import statistics
import sys
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

REF_DATA = Path("/root/reference/examples/data")
RESULTS_DIR = Path(__file__).resolve().parent / "results"
TARGET_SECONDS = 1.0  # BASELINE.json north star
REPEATS = 5
WARMUP = 2


def main() -> None:
    import multimodars as mm

    rest = REF_DATA / "ivus_rest"
    stress = REF_DATA / "ivus_stress"
    vtp = REF_DATA / "rca_cl.vtp"
    if not rest.is_dir() or not vtp.is_file():
        raise SystemExit(f"reference example data not found under {REF_DATA}")

    def run_once():
        t0 = time.perf_counter()
        pair_ab, pair_cd, pair_ac, pair_bd, *_ = mm.from_file_full(
            input_path_ab=str(rest),
            input_path_cd=str(stress),
            step_rotation_deg=0.5,
            range_rotation_deg=90.0,
            write_obj=False,
            smooth=False,
            postprocessing=False,
        )
        t1 = time.perf_counter()
        centerline = mm.read_centerline_vtp(str(vtp))
        t2 = time.perf_counter()
        geom = pair_ab.geom_a
        ref_pt = geom.frames[geom.ref_or_proximal_idx()].lumen.points[0]
        aligned, _cl = mm.align_three_point(
            centerline,
            geom,
            (ref_pt.x, ref_pt.y, ref_pt.z),
            (ref_pt.x + 1.0, ref_pt.y, ref_pt.z),
            (ref_pt.x, ref_pt.y + 1.0, ref_pt.z),
            write=False,
        )
        t3 = time.perf_counter()
        assert len(aligned.frames) == len(geom.frames)
        return t3 - t0, (t1 - t0, t2 - t1, t3 - t2)

    for i in range(WARMUP):
        with contextlib.redirect_stdout(io.StringIO()):
            run_once()

    times = []
    stages = []
    for _ in range(REPEATS):
        with contextlib.redirect_stdout(io.StringIO()):
            dt, st = run_once()
            times.append(dt)
            stages.append(st)
    median = statistics.median(times)

    import jax

    pinned_cpu = os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu"
    payload = {
        "config": {
            "stages": ["from_file_full", "read_centerline_vtp", "align_three_point"],
            "data": "reference examples/data (ivus_rest + ivus_stress + rca_cl.vtp)",
            "step_deg": 0.5,
            "range_deg": 90.0,
            "flags": {"write_obj": False, "smooth": False, "postprocessing": False},
            "repeats": REPEATS,
        },
        "platform": "cpu (pinned)" if pinned_cpu else jax.default_backend(),
        "seconds_median": round(median, 4),
        "seconds_max": round(max(times), 4),
        "seconds_all": [round(t, 4) for t in times],
        "stage_medians": {
            k: round(statistics.median(s[i] for s in stages), 4)
            for i, k in enumerate(
                ("from_file_full", "read_centerline_vtp", "align_three_point")
            )
        },
        "target_seconds": TARGET_SECONDS,
        "meets_target": median < TARGET_SECONDS,
    }
    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    out = RESULTS_DIR / "north_star.json"
    # accumulate session-separated (median, max) pairs so the worst case is
    # evidenced across host phases, not one lucky draw
    history = []
    if out.is_file():
        try:
            prev = json.loads(out.read_text())
            history = prev.get("runs_history", [])
            if "seconds_median" in prev:
                history.append(
                    {
                        "seconds_median": prev["seconds_median"],
                        "seconds_max": prev.get("seconds_max"),
                    }
                )
        except Exception:
            pass
    payload["runs_history"] = history[-16:]
    # never-truncated worst-case evidence: the cap above drops old entries,
    # but the worst observed draw must survive (it IS the honesty signal)
    prev_worst = {}
    if out.is_file():
        try:
            prev_worst = json.loads(out.read_text()).get("worst_observed", {})
        except Exception:
            pass
    cand_markers = history + [
        {"seconds_median": median, "seconds_max": payload["seconds_max"]},
        prev_worst,
    ]
    payload["worst_observed"] = {
        "seconds_median": max(
            (m.get("seconds_median") or 0.0) for m in cand_markers
        ),
        "seconds_max": max(
            (m.get("seconds_max") or 0.0) for m in cand_markers
        ),
    }
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
