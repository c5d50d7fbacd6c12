"""Benchmark: single-pullback OCT-scale registration (from_array_single).

Mirrors the reference's headline benchmark (docs/benchmark.rst:63-86):
``from_array_single`` on a 280-frame OCT pullback with ~500 points/frame,
step 0.01 deg, range +/-6 deg, optimized (multi-resolution) search —
2.40 s on a 16-core Xeon Gold 6234 for the Rust implementation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = rust_baseline_seconds / our_seconds (higher is better).
"""

import os

# this host faults fresh pages pathologically slowly; the opt-in glibc
# tuning keeps benchmark timings stable (see multimodars_tpu/config.py)
os.environ.setdefault("MMTPU_HOST_MALLOC_TUNING", "1")

import json
import math
import sys
import time

import numpy as np

RUST_BASELINE_S = 2.40  # optimized, 16 cores (docs/benchmark.rst:82-86)

N_FRAMES = 280
N_POINTS = 500
STEP_DEG = 0.01
RANGE_DEG = 6.0


def synthetic_oct_pullback(n_frames=N_FRAMES, n_points=N_POINTS, seed=7):
    """OCT-like pullback: smooth elliptic lumens with per-frame rotation and
    drift, frame 0 carrying the reference point."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(0.0, 2.0 * math.pi, n_points, endpoint=False)
    rows = []
    rot = 0.0
    cx, cy = 4.5, 4.5
    for f in range(n_frames):
        rot += rng.uniform(-0.08, 0.08)
        cx += rng.uniform(-0.02, 0.02)
        cy += rng.uniform(-0.02, 0.02)
        a = 2.0 + 0.2 * math.sin(f / 17.0)
        b = 1.4 + 0.2 * math.cos(f / 23.0)
        wobble = 0.08 * np.sin(5 * theta + f / 5.0)
        r_x = (a + wobble) * np.cos(theta)
        r_y = (b + wobble) * np.sin(theta)
        x = cx + r_x * math.cos(rot) - r_y * math.sin(rot)
        y = cy + r_x * math.sin(rot) + r_y * math.cos(rot)
        z = np.full(n_points, f * 0.2)
        frame_col = np.full(n_points, f)
        rows.append(np.stack([frame_col, x, y, z], axis=-1))
    lumen = np.concatenate(rows)
    ref = np.array([0, cx + 3.0, 4.5, 0.0])
    return lumen, ref


def main():
    from multimodars import from_array_single, numpy_to_inputdata

    lumen, ref = synthetic_oct_pullback()
    input_data = numpy_to_inputdata(lumen, ref, True, label="bench_oct")

    def run():
        return from_array_single(
            input_data,
            step_rotation_deg=STEP_DEG,
            range_rotation_deg=RANGE_DEG,
            sample_size=500,
            image_center=(4.5, 4.5),
            radius=0.5,
            n_points=20,
            write_obj=False,
            smooth=False,
            bruteforce=False,
        )

    import contextlib
    import io

    # warmup: trigger jit compilation and fault working pages (excluded,
    # like the reference's release-build warm cache)
    for _ in range(2):
        with contextlib.redirect_stdout(io.StringIO()):
            run()

    # median of 5: the host's page-fault latency is erratic, single runs
    # swing 20-40%
    times = []
    for _ in range(5):
        with contextlib.redirect_stdout(io.StringIO()):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)

    median = sorted(times)[len(times) // 2]
    print(
        json.dumps(
            {
                "metric": "from_array_single_oct280_step0.01_range6_wallclock",
                "value": round(median, 4),
                "unit": "s",
                "vs_baseline": round(RUST_BASELINE_S / median, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
