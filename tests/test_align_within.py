"""Alignment pipeline tests mirroring the reference's align_within unit
tests (align_within.rs:781-1001)."""

import math

import jax.numpy as jnp

import numpy as np
import pytest

from multimodars_tpu.pipelines.align_within import (
    align_frames_in_geometry,
    detect_holes,
    fill_holes,
    fix_one_frame_hole,
)


def test_simple_geometry(dummy_geom):
    """Parity: align_within.rs test_simple_geometry — recovers -15 deg per
    frame and tx = ty = -idx."""
    ref_idx = dummy_geom.find_ref_frame_idx()
    assert ref_idx == 0

    geom, logs, _ = align_frames_in_geometry(
        dummy_geom, 0.01, 30.0, smooth=False, bruteforce=False, sample_size=6,
        verbose=False,
    )

    assert geom.frames
    for a, b in [(0, 1), (0, 2)]:
        assert abs(geom.frames[a].lumen.points[0].x - geom.frames[b].lumen.points[0].x) < 1e-6
        assert abs(geom.frames[a].lumen.points[0].y - geom.frames[b].lumen.points[0].y) < 1e-6

    for i, log in enumerate(logs):
        idx = i + 1.0
        assert abs(log.rot_deg - (-15.0)) < 1e-6
        assert abs(log.tx - (-idx)) < 1e-6
        assert abs(log.ty - (-idx)) < 1e-6


def test_simple_geometry_bruteforce(dummy_geom):
    geom, logs, _ = align_frames_in_geometry(
        dummy_geom, 1.0, 30.0, smooth=False, bruteforce=True, sample_size=6,
        verbose=False,
    )
    for log in logs:
        assert abs(log.rot_deg - (-15.0)) < 1e-6


def test_detect_holes_and_fill_one_frame(dummy_geom_aligned_long):
    """Parity: align_within.rs test_detect_holes_and_fill_one_frame."""
    geometry = dummy_geom_aligned_long
    geometry.frames[5].translate_inplace(0.0, 0.0, 1.0)

    has_hole, baseline = detect_holes(geometry)
    assert has_hole
    assert abs(baseline - 1.0) < 1e-6

    new_frame = fix_one_frame_hole(geometry.frames[1], geometry.frames[2])
    assert abs(new_frame.centroid[2] - 1.5) < 1e-6
    for p in new_frame.lumen.points:
        assert abs(p.z - 1.5) < 1e-6

    new_geom = fill_holes(geometry)
    assert len(new_geom.frames) == 7
    for i, frame in enumerate(new_geom.frames):
        assert frame.id == i
        assert frame.lumen.id == i
        assert frame.centroid[2] == float(i)
        for p in frame.lumen.points:
            assert p.z == float(i)


def test_detect_holes_and_fill_two_frame(dummy_geom_aligned_long):
    geometry = dummy_geom_aligned_long
    geometry.frames[5].translate_inplace(0.0, 0.0, 2.0)
    new_geom = fill_holes(geometry)
    assert len(new_geom.frames) == 8
    for i, frame in enumerate(new_geom.frames):
        assert frame.id == i
        assert frame.centroid[2] == float(i)


def test_smoothing_effect(dummy_geom):
    geom_unsmoothed, _, _ = align_frames_in_geometry(
        dummy_geom.copy(), 0.1, 30.0, smooth=False, bruteforce=False, sample_size=10,
        verbose=False,
    )
    geom_smoothed, _, _ = align_frames_in_geometry(
        dummy_geom, 0.1, 30.0, smooth=True, bruteforce=False, sample_size=10,
        verbose=False,
    )
    assert len(geom_unsmoothed.frames) == len(geom_smoothed.frames)


def test_validation_errors(dummy_geom):
    from multimodars_tpu import PyGeometry

    with pytest.raises(ValueError):
        align_frames_in_geometry(PyGeometry([], "x"), 1.0, 10.0, False, False, 10)
    with pytest.raises(ValueError):
        align_frames_in_geometry(dummy_geom, 1.0, 10.0, False, False, 0)


FIXTURES_DIR = str(__import__("pathlib").Path(__file__).resolve().parent / "data" / "fixtures")


@pytest.mark.skipif(
    not __import__("os").path.isdir(FIXTURES_DIR), reason="fixtures not mounted"
)
def test_idealized_geometry():
    """Parity: align_within.rs test_idealized_geometry — recovers ±15 deg
    rotations and ±0.01·idx translations on the shipped idealized fixture."""
    from multimodars_tpu.io import build_geometry_from_inputdata

    geometry = build_geometry_from_inputdata(
        None, FIXTURES_DIR + "/idealized_geometry", "stress", True,
        (4.5, 4.5), 0.5, 20, verbose=False,
    )
    geom, logs, anomalous = align_frames_in_geometry(
        geometry, 0.01, 20.0, smooth=True, bruteforce=False, sample_size=200,
        verbose=False,
    )
    assert geom.frames
    assert anomalous
    for log in logs:
        assert abs(abs(log.rot_deg) - 15.0) < 1.0
    for i, log in enumerate(logs):
        idx = i + 1.0
        assert abs(log.tx - (-0.01 * idx)) < 0.001
        assert abs(log.ty - (0.01 * idx)) < 0.001


class TestPrunedSweepParity:
    """The certified lower-bound pruning (ops.rotation_search
    search_range_batched_pruned) must be bit-identical to the exact sweep
    for every input — including adversarial near-symmetric contours where
    the certificate fails and the exact fallback runs."""

    def _random_sets(self, rng, F=6, N=160, noise=0.02):
        theta = np.linspace(0.0, 2 * math.pi, N, endpoint=False)
        sets = []
        for f in range(F):
            a = 2.0 + 0.3 * rng.standard_normal()
            b = 1.3 + 0.2 * rng.standard_normal()
            wob = noise * rng.standard_normal(N)
            x = (a + wob) * np.cos(theta)
            y = (b + wob) * np.sin(theta)
            rot = rng.uniform(-0.3, 0.3)
            xr = x * math.cos(rot) - y * math.sin(rot)
            yr = x * math.sin(rot) + y * math.cos(rot)
            sets.append(np.stack([xr, yr], -1))
        return np.asarray(sets)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("step,rng_deg", [(0.01, 6.0), (0.1, 45.0)])
    def test_ladder_pruned_equals_exact(self, seed, step, rng_deg, monkeypatch):
        from multimodars_tpu.ops.rotation_search import (
            multires_rotation_search_dense,
        )

        rng = np.random.default_rng(seed)
        pts = self._random_sets(rng)
        test, ref = pts[1:], pts[:-1]

        pruned = np.asarray(
            multires_rotation_search_dense(test, ref, step, rng_deg)[0]
        )
        monkeypatch.setenv("MMTPU_NO_PRUNE", "1")
        exact = np.asarray(
            multires_rotation_search_dense(test, ref, step, rng_deg)[0]
        )
        np.testing.assert_array_equal(pruned, exact)

    def test_symmetric_contours_fall_back_correctly(self, monkeypatch):
        """A perfect circle makes every candidate cost (near-)equal — the
        certificate cannot hold, the fallback must produce the exact
        first-wins argmin."""
        from multimodars_tpu.ops.rotation_search import (
            multires_rotation_search_dense,
        )

        theta = np.linspace(0.0, 2 * math.pi, 200, endpoint=False)
        circle = np.stack([np.cos(theta), np.sin(theta)], -1)
        pts = np.stack([circle, circle, circle])
        test, ref = pts[1:], pts[:-1]
        pruned = np.asarray(
            multires_rotation_search_dense(test, ref, 0.01, 6.0)[0]
        )
        monkeypatch.setenv("MMTPU_NO_PRUNE", "1")
        exact = np.asarray(
            multires_rotation_search_dense(test, ref, 0.01, 6.0)[0]
        )
        np.testing.assert_array_equal(pruned, exact)

    @pytest.mark.parametrize("seed", [3, 4])
    def test_bruteforce_pruned_equals_exact(self, seed, monkeypatch):
        from multimodars_tpu.ops.rotation_search import (
            multires_rotation_search_dense,
        )

        rng = np.random.default_rng(seed)
        pts = self._random_sets(rng, F=4)
        test, ref = pts[1:], pts[:-1]
        pruned = np.asarray(
            multires_rotation_search_dense(test, ref, 0.05, 3.0, bruteforce=True)[0]
        )
        monkeypatch.setenv("MMTPU_NO_PRUNE", "1")
        exact = np.asarray(
            multires_rotation_search_dense(test, ref, 0.05, 3.0, bruteforce=True)[0]
        )
        np.testing.assert_array_equal(pruned, exact)

    def test_masked_pruned_equals_exact(self, monkeypatch):
        from multimodars_tpu.ops.rotation_search import multires_rotation_search

        rng = np.random.default_rng(9)
        pts = self._random_sets(rng, F=5, N=150)
        test, ref = pts[1:], pts[:-1]
        tm = np.ones(test.shape[:2], dtype=bool)
        rm = np.ones(ref.shape[:2], dtype=bool)
        tm[:, 140:] = False
        rm[:, 145:] = False
        pruned = np.asarray(
            multires_rotation_search(test, ref, tm, rm, 0.01, 6.0)[0]
        )
        monkeypatch.setenv("MMTPU_NO_PRUNE", "1")
        exact = np.asarray(
            multires_rotation_search(test, ref, tm, rm, 0.01, 6.0)[0]
        )
        np.testing.assert_array_equal(pruned, exact)


class TestPlanSelection:
    """Static plan selection: coarse steps collapse onto the bruteforce
    signature (one shared executable — VERDICT r2 item 7)."""

    def test_degenerate_ladder_detected(self):
        from multimodars_tpu.ops.rotation_search import plan_is_bruteforce

        # degenerate ladders (step >= 1) and the overhead-bound 0.5/90 case
        # (ladder saves < 2x candidates) both collapse onto bruteforce
        for step in (5.0, 2.5, 1.0, 0.5):
            assert plan_is_bruteforce(step, 90.0)
        for step in (0.25, 0.1, 0.05, 0.01):
            assert not plan_is_bruteforce(step, 90.0)
        # the OCT anchor config keeps its ladder (138 vs 1202 candidates)
        assert not plan_is_bruteforce(0.01, 6.0)

    def test_modes_identical_at_coarse_step(self):
        import numpy as np

        from multimodars_tpu.ops.rotation_search import (
            multires_rotation_search_dense,
        )

        rng = np.random.default_rng(3)
        base = rng.standard_normal((4, 64, 2))
        test = jnp.asarray(base, jnp.float64)
        ref = jnp.asarray(rng.standard_normal((4, 64, 2)), jnp.float64)
        opt = multires_rotation_search_dense(test, ref, 2.5, 90.0, False)[0]
        bf = multires_rotation_search_dense(test, ref, 2.5, 90.0, True)[0]
        np.testing.assert_array_equal(np.asarray(opt), np.asarray(bf))


class TestStagedSearch:
    """Device-staged dispatch path (converters upload + in-graph catheter
    synthesis/centering) matches the host-built sample-set path."""

    def test_staged_matches_host_build(self):
        import math as _math

        from multimodars_tpu.ops.rotation_search import (
            chain_rotation_search,
            chain_rotation_search_staged,
        )

        rng = np.random.default_rng(11)
        F, P, n_cat = 6, 96, 20
        th = np.linspace(0, 2 * np.pi, P, endpoint=False)
        coords = np.stack(
            [
                np.stack(
                    [
                        (2.0 + 0.3 * np.cos(3 * th + f)) * np.cos(th) + 4.5,
                        (1.5 + 0.3 * np.sin(2 * th + f)) * np.sin(th) + 4.5,
                    ],
                    axis=-1,
                )
                for f in range(F)
            ]
        )
        perm = np.arange(F)[::-1].copy()

        # host build (same construction as _prefetch_sweep)
        cxy = coords.mean(axis=1)[perm]
        ang = 2.0 * _math.pi * np.arange(n_cat) / n_cat
        ring = np.stack([4.5 + 0.5 * np.cos(ang), 4.5 + 0.5 * np.sin(ang)], -1)
        pts = np.concatenate(
            [coords[perm], np.broadcast_to(ring[None], (F, n_cat, 2))], axis=1
        ) - cxy[:, None, :]

        host_flat = np.asarray(
            chain_rotation_search(jnp.asarray(pts), None, 0.5, 10.0, False)
        )
        staged_flat = np.asarray(
            chain_rotation_search_staged(
                jnp.asarray(coords), perm, 0.5, 10.0, False, n_cat, (4.5, 4.5), 0.5
            )
        )
        host = host_flat[: len(host_flat) // 2]
        staged = staged_flat[: len(staged_flat) // 2]
        np.testing.assert_allclose(staged, host, atol=1e-9)

    def test_numpy_to_inputdata_stages_nothing_on_cpu(self):
        """The f64 CPU test configuration must keep the bit-exact host
        path — no staging."""
        import multimodars as mm

        lumen = np.array(
            [[f, 4.5 + np.cos(k), 4.5 + np.sin(k), f * 0.2]
             for f in range(3) for k in range(8)]
        )
        data = mm.numpy_to_inputdata(lumen, np.array([0, 5.5, 4.5, 0.0]), True)
        assert getattr(data, "_staged", None) is None
