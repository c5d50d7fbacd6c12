"""Sweep-kernel tuning experiment: push the XLA rotation sweep toward VPU
peak (VERDICT r4 item 3).

Workload: the OCT-280 hot loop — F=279 frame pairs x N=M=520 points x
K=138 angles, dense (rectangular) Hausdorff, f32.  r4 measured ~28 ms
device compute (~63% of v5e VPU peak) with the one-angle-per-step
``lax.map`` sweep.  Levers tried here, each timed with device-chained
fori_loop isolation (R sweeps back-to-back inside one jit with a data
dependency, so tunnel round-trips are excluded), median of 5:

  A. angle chunking (MMTPU_SWEEP_ANGLE_CHUNK): G angles per map step
     amortize per-step loop overhead at the price of a G-times-larger
     live tile chain.
  B. explicit lane padding: N=M=520 -> 640 (5x128 exactly) by repeating
     point 0 — duplicate points change neither direction of the
     Hausdorff, so results stay exact; tests whether XLA's implicit
     non-multiple-lane handling costs anything.
  C. trig factorisation (|a|^2+|b|^2-2a.b): A = t.q and B = t_perp.q
     precomputed once by MXU dot-generals, every angle then an
     elementwise FMA over the [N,M] tiles.  Analytically HBM-bound (it
     streams 3 f32 tiles per angle where the direct form streams only
     the [N,2]/[M,2] point lists), measured here to close the question.

The winning configuration becomes the package default
(ops.rotation_search._angle_chunk_default); the losers stay in this log.

Output: benchmarks/results/sweep_tuning.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("MMTPU_HOST_MALLOC_TUNING", "1")
os.environ.setdefault("MMTPU_PREFAULT_MB", "512")

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

import numpy as np  # noqa: E402

RESULTS = _ROOT / "benchmarks" / "results"

F, N, K = 279, 520, 138
R_CHAIN = 5
# v5e VPU: 8 cores x 4 MXU-adjacent vector units ... the r4 artifact used
# 3.8e12 f32 elem-ops/s as the peak reference; keep it for continuity.
VPU_PEAK_OPS = 3.8e12
# ops per d2 element in the direct form: 2 sub + 2 mul + 1 add, plus the
# min/max compare traffic ~= 1.5 -> 6.5 (same accounting as the r4 number)
OPS_PER_ELEM = 6.5


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from multimodars_tpu.ops.hausdorff import hausdorff_sq_dense
    from multimodars_tpu.ops.rotation_search import rotation_cost_table

    rng = np.random.default_rng(3)
    test = jnp.asarray(rng.standard_normal((F, N, 2)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((F, N, 2)), jnp.float32)
    angles_np = np.broadcast_to(
        np.linspace(-0.1, 0.1, K, dtype=np.float32), (F, K)
    ).copy()
    angles = jnp.asarray(angles_np)
    valid = jnp.ones((F, K), dtype=bool)

    def chained(sweep_fn):
        """R_CHAIN sweeps back-to-back with a data dependency."""

        @jax.jit
        def run(t):
            def body(_, carry):
                t_c, acc = carry
                costs = sweep_fn(t_c)
                # zero-valued dependency keeps every iteration live
                bump = (costs.min() * 0.0)[None, None, None]
                return t_c + bump, acc + costs.sum()
            (_, acc) = lax.fori_loop(0, R_CHAIN, body, (t, jnp.float32(0)))[
                :2
            ]
            return acc

        run(test).block_until_ready()  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(test).block_until_ready()
            ts.append((time.perf_counter() - t0) / R_CHAIN)
        return sorted(ts)[len(ts) // 2]

    entries = {}
    elems = F * N * N * K

    def record(name, seconds, extra=None):
        ops = elems * OPS_PER_ELEM / seconds
        entries[name] = {
            "sweep_s": round(seconds, 5),
            "elem_ops_per_s": f"{ops:.3e}",
            "pct_of_vpu_peak": round(100.0 * ops / VPU_PEAK_OPS, 1),
            **(extra or {}),
        }
        print(f"{name}: {seconds*1e3:.2f} ms  ({entries[name]['pct_of_vpu_peak']}% peak)", flush=True)

    # ---- A: angle chunking ----------------------------------------------
    for G in (1, 2, 4, 8, 16):
        record(
            f"chunk_{G}",
            chained(
                lambda t, G=G: rotation_cost_table(
                    t, ref, None, None, angles, valid, dense=True,
                    angle_chunk=G,
                )
            ),
        )

    # ---- B: explicit lane padding to 640 (exact via duplicate points) ---
    pad = 640 - N
    test_p = jnp.concatenate([test, jnp.repeat(test[:, :1], pad, axis=1)], 1)
    ref_p = jnp.concatenate([ref, jnp.repeat(ref[:, :1], pad, axis=1)], 1)
    elems_pad = F * 640 * 640 * K
    best_G = min(
        (e["sweep_s"], name) for name, e in entries.items()
    )[1]
    G_best = int(best_G.split("_")[1])
    t_pad = chained(
        lambda t: rotation_cost_table(
            test_p, ref_p, None, None, angles, valid, dense=True,
            angle_chunk=G_best,
        )
    )
    record(
        "pad640_at_best_chunk",
        t_pad,
        {
            "note": f"{elems_pad/elems:.2f}x more real elements; wins only "
                    "if implicit 520-lane handling cost exceeded the extra "
                    "tiles",
        },
    )

    # ---- C: trig factorisation (A/B tiles + per-angle FMA) --------------
    def factorised(t):
        A = t @ ref.transpose(0, 2, 1)  # [F, N, M] (MXU, contraction 2)
        tp = jnp.stack([-t[..., 1], t[..., 0]], axis=-1)
        B = tp @ ref.transpose(0, 2, 1)
        C = (t * t).sum(-1)[:, :, None] + (ref * ref).sum(-1)[:, None, :]

        def cost_for_angle(k):
            th = angles[:, k]
            c = jnp.cos(th)[:, None, None]
            s = jnp.sin(th)[:, None, None]
            d2 = C - 2.0 * (c * A + s * B)
            fwd = d2.min(axis=-1).max(axis=-1)
            bwd = d2.min(axis=-2).max(axis=-1)
            return jnp.maximum(fwd, bwd)

        return lax.map(cost_for_angle, jnp.arange(K)).T

    t_fact = chained(factorised)
    record(
        "trig_factorised",
        t_fact,
        {
            "note": "streams 3 f32 [N,M] tiles/angle (~2.6 GB/sweep-angle "
                    "batch) vs the direct form's point lists — HBM-bound "
                    "by construction; MXU dot-generals only fill 2/128 of "
                    "the contraction dim",
        },
    )

    # ---- parity of the winning variant vs the G=1 baseline --------------
    base = np.asarray(
        rotation_cost_table(test, ref, None, None, angles, valid, dense=True,
                            angle_chunk=1)
    )
    best = np.asarray(
        rotation_cost_table(test, ref, None, None, angles, valid, dense=True,
                            angle_chunk=G_best)
    )
    bit_identical = bool((base == best).all())

    payload = {
        "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "backend": jax.default_backend(),
        "workload": f"[{F},{N},2] x [{F},{N},2] x {K} angles, f32 dense",
        "protocol": f"device-chained fori_loop x{R_CHAIN}, median of 5",
        "ops_accounting": f"{OPS_PER_ELEM} ops/element (2 sub + 2 mul + "
                          "1 add + ~1.5 reduction), peak ref 3.8e12/s "
                          "(same accounting as the r4 pallas_status entry)",
        "variants": entries,
        "chosen_default_chunk": G_best,
        "chunk_bit_identical_vs_unchunked": bit_identical,
    }
    RESULTS.mkdir(parents=True, exist_ok=True)
    (RESULTS / "sweep_tuning.json").write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
