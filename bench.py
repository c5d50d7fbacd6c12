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
# prefault the measured benchmark working set upfront: this 1-vCPU
# host faults fresh anonymous pages pathologically slowly in its slow
# phases, and a mid-run burst of faults is the dominant worst-case
# noise source (north_star.json worst_observed; VERDICT r4 item 5)
os.environ.setdefault("MMTPU_PREFAULT_MB", "512")

import json
import math
import sys
import time
from pathlib import Path

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


REF_IVUS_REST = "/root/reference/examples/data/ivus_rest/diastolic_contours.csv"


def real_data_pullback_280():
    """280-frame pullback built from REAL clinical contours.

    The reference's raw OCT CSV is not distributed (examples/data/oct_single
    ships only the reference point), so the headline-scale real-data anchor
    concatenates 14 z-shifted copies of the shipped 20-frame ivus_rest
    diastolic pullback (501 real points/frame), rotating each copy by a
    deterministic extra angle about its per-frame centroid so every frame
    boundary — including the copy seams — carries genuine alignment work.
    Construction documented per VERDICT r4 item 8.  Returns None when the
    reference data directory is not mounted.
    """
    import os.path

    if not os.path.isfile(REF_IVUS_REST):
        return None
    raw = np.genfromtxt(REF_IVUS_REST, delimiter=",")
    if raw.ndim != 2 or raw.shape[1] != 4:
        raw = np.genfromtxt(REF_IVUS_REST, delimiter="\t")
    frames = np.unique(raw[:, 0])
    n_src = len(frames)  # 20
    z_span = raw[:, 3].max() - raw[:, 3].min()
    spacing = z_span / max(n_src - 1, 1)
    copies = int(np.ceil(N_FRAMES / n_src))  # 14 -> 280 frames
    rows = []
    fid = 0
    for c in range(copies):
        rot = 0.04 * c  # radians; deterministic per-copy twist
        cr, sr = math.cos(rot), math.sin(rot)
        for f in frames:
            if fid >= N_FRAMES:
                break
            sel = raw[raw[:, 0] == f]
            x, y = sel[:, 1], sel[:, 2]
            cx, cy = x.mean(), y.mean()
            xr = cx + (x - cx) * cr - (y - cy) * sr
            yr = cy + (x - cx) * sr + (y - cy) * cr
            z = sel[:, 3] + c * (z_span + spacing)
            rows.append(
                np.column_stack([np.full(len(sel), fid), xr, yr, z])
            )
            fid += 1
    lumen = np.concatenate(rows)
    first = rows[0]
    ref = np.array([0, first[:, 1].max() + 1.0, first[:, 2].mean(), first[0, 3]])
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

    floor = _floor_decomposition(run, lumen, ref)
    real = _real_data_anchor()

    print(
        json.dumps(
            {
                "metric": "from_array_single_oct280_step0.01_range6_wallclock",
                "value": round(median, 4),
                "unit": "s",
                "vs_baseline": round(RUST_BASELINE_S / median, 2),
                "floor": floor,
                "real_data_280": real,
            }
        )
    )


def _real_data_anchor():
    """Headline-scale anchor on REAL clinical contours (same protocol)."""
    import contextlib
    import io

    from multimodars import from_array_single, numpy_to_inputdata

    built = real_data_pullback_280()
    if built is None:
        return {"note": "reference example data not mounted"}
    lumen, ref = built
    input_data = numpy_to_inputdata(lumen, ref, True, label="real280")

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

    times = []
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(2):
            run()
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
    median = sorted(times)[len(times) // 2]
    result = {
        "seconds_median": round(median, 4),
        "vs_rust_baseline": round(RUST_BASELINE_S / median, 2),
        "construction": "14 z-shifted, deterministically rotated copies of "
                        "the real 20-frame ivus_rest diastolic pullback "
                        "(501 real pts/frame); raw OCT CSV not distributed "
                        "by the reference",
    }
    try:
        out = Path(__file__).resolve().parent / "benchmarks" / "results"
        out.mkdir(parents=True, exist_ok=True)
        (out / "anchor_real280.json").write_text(json.dumps(result, indent=2))
    except Exception:
        pass
    return result


def _floor_decomposition(run, lumen, ref):
    """Attribute the anchor's milliseconds: overlapped-pipeline spans from
    one traced run, plus serialized ops-level measurements of each pipeline
    leg (input convert, h2d, device compute, d2h) on the same shapes.
    The committed copy lands in benchmarks/results/anchor_floor.json
    (VERDICT r4 item 2: convert the 'plateau' into attribution)."""
    import contextlib
    import io

    import numpy as np

    from multimodars import numpy_to_inputdata
    from multimodars_tpu.config import config
    from multimodars_tpu.ops.rotation_search import chain_rotation_search
    from multimodars_tpu.utils import trace
    from multimodars_tpu.utils.device import to_device

    # 1) overlapped pipeline: per-stage spans of one production run
    trace.reset()
    with contextlib.redirect_stdout(io.StringIO()):
        t0 = time.perf_counter()
        run()
        total = time.perf_counter() - t0
    spans = {k: round(v[0], 4) for k, v in trace.summary().items()}

    # 2) serialized legs at the ops level, same data shapes, median of 5
    def med(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[n // 2], 4)

    with contextlib.redirect_stdout(io.StringIO()):
        t_convert = med(lambda: numpy_to_inputdata(lumen, ref, True))

        # the sweep's input stack: [F, P, 2] centered lumen sets (catheter
        # ring omitted — it only widens P slightly)
        coords = lumen[:, 1:].reshape(N_FRAMES, N_POINTS, 3)[:, :, :2]
        pts = (coords - coords.mean(axis=1, keepdims=True)).astype(
            np.dtype(config.compute_dtype)
        )

        def h2d():
            a = to_device(pts, config.compute_dtype)
            a.block_until_ready()
            return a

        t_h2d = med(h2d)
        pts_dev = h2d()

        def compute():
            r = chain_rotation_search(
                pts_dev, None, STEP_DEG, RANGE_DEG, False
            )
            r.block_until_ready()
            return r

        compute()  # warm the executable for these exact shapes
        t_compute = med(compute)
        r_ready = compute()
        t_d2h = med(lambda: np.asarray(r_ready))

    floor = {
        "overlapped_total_s": round(total, 4),
        "spans_s": {
            "build_and_dispatch": spans.get("entry.prepare_n_geometries"),
            "exposed_device_wait": spans.get("align_within.sweep_block"),
            "host_epilogue": spans.get("align_within.finish_tensor"),
            "entry_total": spans.get("entry.single_processing"),
        },
        "serialized_legs_s": {
            "input_convert": t_convert,
            "h2d_stack": t_h2d,
            "device_compute_incl_dispatch_rt": t_compute,
            "d2h_result_rt": t_d2h,
        },
        "note": (
            "spans_s decomposes ONE overlapped production run (device sweep"
            " dispatched during the geometry build, pull enqueued behind"
            " it); serialized_legs_s times each leg alone on the same"
            " shapes — their sum is the unpipelined floor, the gap to"
            " overlapped_total_s is what the dispatch/transfer overlap"
            " already hides"
        ),
    }
    try:
        out = Path(__file__).resolve().parent / "benchmarks" / "results"
        out.mkdir(parents=True, exist_ok=True)
        (out / "anchor_floor.json").write_text(json.dumps(floor, indent=2))
    except Exception:
        pass
    return floor


if __name__ == "__main__":
    main()
