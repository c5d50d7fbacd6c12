"""Argmin certification: near-tie detection + exact host repair.

The device sweeps flag searches whose winner is within the compute
dtype's rounding band of another candidate (ops.rotation_search._tie_flags)
and the orchestration re-decides flagged searches in exact f64
(ops.argmin_repair) — making the output angles backend-independent.  The
round-5 TPU parity run caught exactly this failure: an 11-degree flip in
the ivus_full systolic within-chain (benchmarks/results/tpu_parity.json).

The deterministic tied fixture: a 72-point circle (5-degree rotational
symmetry) as reference, the same circle rotated by HALF a symmetry period
(2.5 deg) as test — the -2.5 and +2.5 candidates both map the test onto
the reference up to FP noise, so their costs tie at the rounding floor and
only an exact first-wins decision is backend-stable.  A true zero-cost
self-match (m == 0 exactly) is deliberately NOT flagged: cost(0) == 0
bitwise on every backend while every other candidate is > 0, so that
argmin can never flip.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

_N_SYM = 72  # 5-degree symmetry


def _sym_circle(r=2.0):
    th = np.linspace(0.0, 2 * math.pi, _N_SYM, endpoint=False)
    return np.stack([r * np.cos(th), r * np.sin(th)], -1)


def _rot(pts, deg):
    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    return np.stack(
        [pts[:, 0] * c - pts[:, 1] * s, pts[:, 0] * s + pts[:, 1] * c], -1
    )


def _wobbly(n=64, seed=0):
    rng = np.random.default_rng(seed)
    th = np.linspace(0.0, 2 * math.pi, n, endpoint=False)
    r = 2.0 + 0.4 * np.abs(rng.standard_normal(n))
    return np.stack([r * np.cos(th), r * np.sin(th)], -1)


class TestTieFlags:
    def test_half_period_rotation_flags_tie(self):
        from multimodars_tpu.ops.rotation_search import multires_rotation_search

        ref = _sym_circle()
        test = _rot(ref, 2.5)
        t = jnp.asarray(test[None], jnp.float64)
        r = jnp.asarray(ref[None], jnp.float64)
        mask = jnp.ones((1, _N_SYM), dtype=bool)
        _, tie = multires_rotation_search(t, r, mask, mask, 0.5, 10.0)
        assert bool(np.asarray(tie)[0])

    def test_exact_self_match_does_not_flag(self):
        """m == 0 exactly (identical sets at angle 0) is backend-stable:
        every other candidate costs strictly more on every backend."""
        from multimodars_tpu.ops.rotation_search import multires_rotation_search

        c = _wobbly(seed=4)
        t = jnp.asarray(c[None], jnp.float64)
        mask = jnp.ones((1, len(c)), dtype=bool)
        _, tie = multires_rotation_search(t, t, mask, mask, 0.5, 10.0)
        assert not bool(np.asarray(tie)[0])

    def test_asymmetric_contour_does_not_flag(self):
        from multimodars_tpu.ops.rotation_search import multires_rotation_search

        a = _wobbly(seed=1)
        b = _wobbly(seed=2)
        test = jnp.asarray(np.stack([a, b]), jnp.float64)
        mask = jnp.ones(test.shape[:2], dtype=bool)
        _, tie = multires_rotation_search(test, test, mask, mask, 0.5, 10.0)
        assert not bool(np.asarray(tie).any())

    def test_chain_packed_layout(self):
        from multimodars_tpu.ops.argmin_repair import split_chain_packed
        from multimodars_tpu.ops.rotation_search import chain_rotation_search

        ref = _sym_circle()
        pts = np.stack([ref, _rot(ref, 2.5), _rot(ref, 5.0)])
        flat = np.asarray(
            chain_rotation_search(
                jnp.asarray(pts, jnp.float64), None, 0.5, 10.0, False
            )
        )
        # 2 pairs x [angle | tie code | final-stage center]
        assert flat.shape == (6,)
        delta, codes, centers = split_chain_packed(flat)
        assert delta.shape == codes.shape == centers.shape == (2,)
        assert (codes > 0).all()  # both half-period pairs tied


class TestExactRepair:
    def test_exact_ladder_matches_device_f64(self):
        """On an asymmetric pair the exact host ladder lands on the same
        grid angle as the f64 device search."""
        from multimodars_tpu.ops.argmin_repair import exact_ladder
        from multimodars_tpu.ops.rotation_search import multires_rotation_search

        ref = _wobbly(seed=5)
        test = _rot(ref, 4.0)
        t = jnp.asarray(test[None], jnp.float64)
        r = jnp.asarray(ref[None], jnp.float64)
        mask = jnp.ones((1, len(ref)), dtype=bool)
        best, _ = multires_rotation_search(t, r, mask, mask, 0.1, 10.0)
        exact = exact_ladder(test, ref, 0.1, 10.0, False)
        assert abs(float(best[0]) - exact) < 1e-12

    def test_repair_resolves_tie_first_wins(self):
        """Half-period tie: the repair returns the exact f64 first-wins
        winner — the EARLIER grid angle (-2.5 deg) — for any device answer."""
        from multimodars_tpu.ops.argmin_repair import (
            exact_ladder,
            repair_chain_deltas,
        )

        ref = _sym_circle()
        pts = np.stack([ref, _rot(ref, 2.5)])
        delta = np.array([0.999])  # junk device answer
        repaired = repair_chain_deltas(
            delta, np.array([True]), pts, None, 0.5, 10.0, False
        )
        want = exact_ladder(_rot(ref, 2.5), ref, 0.5, 10.0, False)
        np.testing.assert_array_equal(repaired, [want])
        # and the winner is on the -2.5 side (first wins in grid order)
        assert repaired[0] < 0

    def test_certify_disable_env(self, monkeypatch):
        from multimodars_tpu.ops.argmin_repair import repair_chain_deltas

        monkeypatch.setenv("MMTPU_CERTIFY_ARGMIN", "0")
        ref = _sym_circle()
        pts = np.stack([ref, _rot(ref, 2.5)])
        delta = np.array([0.123])
        out = repair_chain_deltas(
            delta, np.array([True]), pts, None, 0.5, 10.0, False
        )
        np.testing.assert_array_equal(out, delta)  # repairs skipped

    def test_stats_counters(self):
        from multimodars_tpu.ops import argmin_repair

        before = dict(argmin_repair.stats)
        ref = _sym_circle()
        pts = np.stack([ref, _rot(ref, 2.5)])
        argmin_repair.repair_chain_deltas(
            np.array([0.3]), np.array([True]), pts, None, 0.5, 10.0, False
        )
        assert argmin_repair.stats["flagged"] > before["flagged"]
        assert argmin_repair.stats["repaired"] > before["repaired"]

    def test_between_repair(self):
        from multimodars_tpu.ops.argmin_repair import (
            exact_ladder,
            repair_between,
        )

        ref = _sym_circle() + np.array([4.5, 4.5])
        tgt = _rot(_sym_circle(), 2.5) + np.array([4.5, 4.5])
        out = repair_between(
            np.array([0.7]), np.array([True]), [(ref, tgt)], 0.5, 10.0, False
        )
        pivot = ref.mean(axis=0)
        want = exact_ladder(tgt - pivot, ref - pivot, 0.5, 10.0, False)
        np.testing.assert_array_equal(out, [want])


class TestPipelineBackendIndependence:
    """The full within-alignment on a symmetry-tied pullback must produce
    identical rotation logs under f32 and f64 compute dtypes once
    certification repairs the flagged searches — the ivus_full regression,
    miniaturized."""

    def _pullback(self):
        ref = _sym_circle(r=1.5)
        rows = []
        for f in range(4):
            c = _rot(ref, 2.5 * f)
            rows.append(
                np.column_stack(
                    [np.full(_N_SYM, f), 4.5 + c[:, 0], 4.5 + c[:, 1],
                     np.full(_N_SYM, f * 0.4)]
                )
            )
        return np.concatenate(rows)

    def _run(self, dtype, monkeypatch):
        import contextlib
        import io

        from multimodars import from_array_single, numpy_to_inputdata
        from multimodars_tpu.config import config

        monkeypatch.setattr(config, "compute_dtype", jnp.dtype(dtype))
        lumen = self._pullback()
        data = numpy_to_inputdata(
            lumen, np.array([0, 7.0, 4.5, 0.0]), True, label="tie"
        )
        with contextlib.redirect_stdout(io.StringIO()):
            _geom, logs = from_array_single(
                data, step_rotation_deg=0.5, range_rotation_deg=10.0,
                sample_size=_N_SYM, n_points=0, write_obj=False, smooth=False,
            )
        return [log[2] for log in logs[1:]]

    def test_rot_logs_dtype_independent(self, monkeypatch):
        from multimodars_tpu.ops import argmin_repair

        before = argmin_repair.stats["repaired"]
        rots32 = self._run("float32", monkeypatch)
        rots64 = self._run("float64", monkeypatch)
        # the half-period ties actually fired and were repaired
        assert argmin_repair.stats["repaired"] > before
        # and the exact repair makes the logs identical across dtypes
        np.testing.assert_array_equal(rots32, rots64)
        # every relative winner lies in the tied family (odd multiples of
        # 2.5 deg — the 5-deg-symmetric set maps onto itself at all of them)
        assert all(
            abs((abs(r) / 2.5) - round(abs(r) / 2.5)) < 1e-9
            and round(abs(r) / 2.5) % 2 == 1
            for r in rots32
        )


class TestStagedF64Tier:
    """The staged-f64 device repair tier (production path on the TPU
    backend, where inputs stage at construction) — driven directly here
    with a hand-built staged dict on the CPU backend."""

    def test_staged_full_ladder_matches_exact(self):
        from multimodars_tpu.ops.argmin_repair import (
            exact_ladder,
            repair_chain_staged64,
        )

        ref = _sym_circle()
        frames = np.stack([ref, _rot(ref, 2.5), _rot(ref, 5.0)])
        staged64 = dict(
            dev64=jnp.asarray(frames, jnp.float64),
            perm=np.arange(3), n_cat=0, center=(0.0, 0.0), radius=0.5,
        )
        delta = np.array([0.9, -0.9])
        codes = np.array([2, 2])  # early-stage flags -> full ladder tier
        out = repair_chain_staged64(
            delta, codes, None, staged64, 0.5, 10.0, False,
            lambda: frames - frames.mean(axis=1, keepdims=True),
        )
        # the staged tier's composition centers by per-frame means; the
        # sets are the same up to f64 mean ulps, so the winner matches the
        # exact ladder on host-centered sets (residual ties go to host
        # anyway, making the outcome deterministic)
        c = frames - frames.mean(axis=1, keepdims=True)
        for i in range(2):
            want = exact_ladder(c[i + 1], c[i], 0.5, 10.0, False)
            assert abs(out[i] - want) < 1e-9

    def test_staged_final_only_mode(self):
        from multimodars_tpu.ops.argmin_repair import repair_chain_staged64

        rng = np.random.default_rng(8)
        th = np.linspace(0, 2 * math.pi, 64, endpoint=False)
        r = 2.0 + 0.4 * np.abs(rng.standard_normal(64))
        base = np.stack([r * np.cos(th), r * np.sin(th)], -1)
        frames = np.stack([base, _rot(base, math.degrees(0.05))])
        staged64 = dict(
            dev64=jnp.asarray(frames, jnp.float64),
            perm=np.arange(2), n_cat=0, center=(0.0, 0.0), radius=0.5,
        )
        # code 1 with the (certified) coarser-stage center: only the final
        # +/-0.1 deg window around it re-runs; the winner recovers the true
        # -0.05 rad optimum (delta rotates TEST onto REF, undoing the
        # applied +0.05) to within one fine step
        delta = np.array([0.9])
        out = repair_chain_staged64(
            delta, np.array([1]), np.array([-0.05]), staged64,
            0.01, 6.0, False,
            lambda: frames - frames.mean(axis=1, keepdims=True),
        )
        assert abs(out[0] + 0.05) < math.radians(0.011)
