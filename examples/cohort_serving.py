"""Cohort serving: register N pullbacks with one batched device search
(optionally sharded over a device mesh).

Run:  python examples/cohort_serving.py [n_cases]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import multimodars as mm
from bench import synthetic_oct_pullback


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cases = []
    for seed in range(n):
        lumen, ref = synthetic_oct_pullback(n_frames=100, n_points=200, seed=seed)
        cases.append(mm.numpy_to_inputdata(lumen, ref, True, label=f"case{seed}"))

    t0 = time.perf_counter()
    results = mm.from_array_cohort(
        cases, step_rotation_deg=0.1, range_rotation_deg=10.0, sample_size=200,
        smooth=False,
    )
    dt = time.perf_counter() - t0
    print(f"registered {n} pullbacks in {dt:.2f}s ({n / dt:.1f} pullbacks/s)")
    for geom, logs, anomalous in results:
        print(f"  {geom.label}: {len(geom.frames)} frames, anomalous={anomalous}")


if __name__ == "__main__":
    main()
