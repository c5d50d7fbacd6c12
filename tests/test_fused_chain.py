"""One-round-trip fused chain (pipelines.fused_chain) parity.

The chain composes the within-sweep deltas, the device replica of the
within finish (align_within.rs:70-331), and the between search
(align_between.rs:11-92 / entry.rs:206-277) into one device program with a
single pull.  The host epilogues run from the pulled deltas exactly as in
the two-round-trip orchestration, so every output must be bit-identical to
the fallback path (MMTPU_NO_FUSED_CHAIN=1) on data without exact grid-angle
cost ties.
"""

import numpy as np
import pytest

from multimodars import numpy_to_inputdata
from multimodars_tpu._processing import _to_inputdata
from multimodars_tpu.pipelines import entry


def _make_datas(n, anomalous=False, seed=17):
    """Synthetic pullbacks; ``anomalous=True`` uses elliptic ratio > 2 so
    the finish takes the farthest-pair-axis branch (align_within.rs:256-317)."""
    rng = np.random.default_rng(seed)
    rx, ry = (3.0, 1.0) if anomalous else (2.0, 1.5)
    datas = []
    for g in range(n):
        rows = []
        for f in range(12):
            th = np.linspace(0, 2 * np.pi, 40, endpoint=False)
            x = 4.5 + (rx + 0.15 * rng.standard_normal()) * np.cos(th + 0.1 * f)
            y = 4.5 + (ry + 0.15 * rng.standard_normal()) * np.sin(th + 0.1 * f)
            z = np.full(40, f * 0.3)
            rows.append(np.stack([np.full(40, f), x, y, z], -1))
        lumen = np.concatenate(rows)
        ref = np.array([0, 6.8 + 0.1 * g, 4.5, 0.0])
        datas.append(
            _to_inputdata(
                numpy_to_inputdata(lumen, ref, g % 2 == 0, label=f"g{g}")
            )
        )
    return datas


def _assert_pairs_equal(a, b):
    # tolerance rationale: the fused chain and the fallback compile the
    # between search into DIFFERENT XLA programs, and fusion choices (fma
    # contraction of the candidate-grid start + i*step) can shift the
    # returned winner ANGLE by one ulp even when the winning grid index is
    # identical — ~1e-15 mm on the epilogue coordinates.  Anything larger
    # than ulp noise is a certification bug (argmin ties are re-decided in
    # exact f64 on BOTH paths — ops.argmin_repair), so the bound stays at
    # 1e-12, eight orders below the 1e-4 mm output-fidelity bar.
    _ATOL = 1e-12
    for pn, po in zip(a, b):
        for gn, go in ((pn.geom_a, po.geom_a), (pn.geom_b, po.geom_b)):
            assert len(gn.frames) == len(go.frames)
            for fn, fo in zip(gn.frames, go.frames):
                np.testing.assert_allclose(
                    fn.lumen.xyz_view(), fo.lumen.xyz_view(),
                    rtol=0, atol=_ATOL,
                )
                np.testing.assert_allclose(
                    fn.centroid, fo.centroid, rtol=0, atol=_ATOL
                )
                for k in fn.extras:
                    np.testing.assert_allclose(
                        fn.extras[k].xyz_view(), fo.extras[k].xyz_view(),
                        rtol=0, atol=_ATOL,
                    )


def _spy_chain(monkeypatch):
    calls = {"chain": 0}
    orig = entry._try_fused_chain

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            calls["chain"] += 1
        return r

    monkeypatch.setattr(entry, "_try_fused_chain", spy)
    return calls


class TestFusedChainParity:
    @pytest.mark.parametrize("smooth", [False, True])
    @pytest.mark.parametrize("anomalous", [False, True])
    def test_full_matches_fallback(self, monkeypatch, smooth, anomalous):
        datas = _make_datas(4, anomalous=anomalous)
        kw = dict(
            input_data=datas, write_obj=False, postprocessing=False,
            step_deg=1.0, range_deg=10.0, smooth=smooth, verbose=False,
        )
        labels = [d.label for d in datas]

        calls = _spy_chain(monkeypatch)
        new = entry.full_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        assert calls["chain"] == 1, "fused chain did not engage"

        monkeypatch.setenv("MMTPU_NO_FUSED_CHAIN", "1")
        old = entry.full_processing(labels, (4.5, 4.5), 0.5, 20, **kw)

        _assert_pairs_equal(new[:4], old[:4])
        for ln, lo in zip(new[4:], old[4:]):
            assert len(ln) == len(lo)
            for xn, xo in zip(ln, lo):
                assert (
                    xn.contour_id, xn.matched_to, xn.rot_deg, xn.tx, xn.ty,
                    xn.centroid,
                ) == (
                    xo.contour_id, xo.matched_to, xo.rot_deg, xo.tx, xo.ty,
                    xo.centroid,
                )

    def test_double_pair_matches_fallback(self, monkeypatch):
        datas = _make_datas(4, seed=23)
        kw = dict(
            input_data=datas, write_obj=False, postprocessing=False,
            step_deg=1.0, range_deg=10.0, smooth=False, verbose=False,
        )
        labels = [d.label for d in datas]

        calls = _spy_chain(monkeypatch)
        new = entry.double_pair_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        assert calls["chain"] == 1

        monkeypatch.setenv("MMTPU_NO_FUSED_CHAIN", "1")
        old = entry.double_pair_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        _assert_pairs_equal(new[:2], old[:2])

    def test_pair_matches_fallback(self, monkeypatch):
        datas = _make_datas(2, anomalous=True, seed=5)
        kw = dict(
            input_data=datas, write_obj=False, postprocessing=False,
            step_deg=1.0, range_deg=10.0, smooth=True, verbose=False,
        )
        labels = [d.label for d in datas]

        calls = _spy_chain(monkeypatch)
        new = entry.pair_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        assert calls["chain"] == 1

        monkeypatch.setenv("MMTPU_NO_FUSED_CHAIN", "1")
        old = entry.pair_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        _assert_pairs_equal([new[0]], [old[0]])

    def test_executable_reused_across_datasets(self, monkeypatch):
        """Data-dependent scalars (ref_idx, anomalous, farthest indices) are
        traced, not static — same-shaped pullbacks from different patients
        must share one compiled executable."""
        from multimodars_tpu.pipelines import fused_chain

        calls = _spy_chain(monkeypatch)
        base = fused_chain._fused_chain_impl._cache_size()
        for seed, anomalous in ((31, False), (32, True), (33, False)):
            datas = _make_datas(2, anomalous=anomalous, seed=seed)
            entry.pair_processing(
                [d.label for d in datas], (4.5, 4.5), 0.5, 20,
                input_data=datas, write_obj=False, postprocessing=False,
                step_deg=1.0, range_deg=10.0, smooth=False, verbose=False,
            )
        assert calls["chain"] == 3, "fused chain did not engage on all runs"
        grown = fused_chain._fused_chain_impl._cache_size() - base
        assert grown <= 1, f"chain recompiled per dataset ({grown} entries)"

    def test_real_fixture_full_matches_fallback(self, monkeypatch):
        """Chain parity on the vendored clinical pullbacks (501-point
        contours, catheter synthesis, real reference points) — the shape
        class every synthetic test misses."""
        from pathlib import Path

        rest = Path(__file__).parent / "data" / "fixtures" / "ivus_rest"
        stress = Path(__file__).parent / "data" / "fixtures" / "ivus_stress"
        if not rest.is_dir() or not stress.is_dir():
            pytest.skip("vendored fixtures not present")
        kw = dict(
            input_path_a=str(rest), input_path_b=str(stress),
            write_obj=False, postprocessing=False,
            step_deg=2.0, range_deg=20.0, smooth=True, verbose=False,
        )
        labels = ["a", "b", "c", "d"]

        calls = _spy_chain(monkeypatch)
        new = entry.full_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        assert calls["chain"] == 1, "fused chain did not engage on fixtures"

        monkeypatch.setenv("MMTPU_NO_FUSED_CHAIN", "1")
        old = entry.full_processing(labels, (4.5, 4.5), 0.5, 20, **kw)
        _assert_pairs_equal(new[:4], old[:4])

    def test_fallback_when_no_prefetch(self, monkeypatch):
        """Geometries without a matching in-flight prefetch must take the
        regular path (take_device_sweeps returns None before detaching)."""
        from multimodars_tpu.pipelines.fused_chain import take_device_sweeps

        datas = _make_datas(2, seed=9)
        geoms = entry.prepare_n_geometries(
            [d.label for d in datas], (4.5, 4.5), 0.5, 20, datas, True,
            None, None, "pair", verbose=False,
        )  # no prefetch kwargs -> no pending sweeps
        assert take_device_sweeps(geoms, 1.0, 10.0, False, 500) is None
        # and with a prefetch under DIFFERENT search params the key mismatches
        geoms2 = entry.prepare_n_geometries(
            [d.label for d in datas], (4.5, 4.5), 0.5, 20, datas, True,
            None, None, "pair", verbose=False,
            prefetch=dict(step_deg=2.0, range_deg=10.0, bruteforce=False,
                          sample_size=500),
        )
        assert take_device_sweeps(geoms2, 1.0, 10.0, False, 500) is None
        # pendings must still be attached for the regular path to reuse
        assert all(
            getattr(g, "_pending_sweep", None) is not None for g in geoms2
        )
