"""Multi-chip sharding tests on the virtual 8-device CPU mesh, plus the
driver entry points (__graft_entry__)."""

import sys
from pathlib import Path

import jax
import math

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

cpu_devices = jax.devices("cpu")
needs_mesh = pytest.mark.skipif(
    len(cpu_devices) < 8, reason="needs 8 virtual CPU devices"
)


@needs_mesh
def test_cohort_relative_rotations_sharded(dummy_geom):
    from multimodars_tpu.parallel import (
        batched_pairs_from_geometries,
        cohort_mesh,
        cohort_relative_rotations,
    )

    geometries = [dummy_geom.copy() for _ in range(4)]
    test, ref, tmask, rmask, counts = batched_pairs_from_geometries(
        geometries, sample_size=6, pad_pairs_to=8
    )
    assert test.shape[0] == 8  # 4 geoms x 2 pairs, padded to the mesh size
    mesh = cohort_mesh(cpu_devices[:8])
    delta = cohort_relative_rotations(test, ref, tmask, rmask, 1.0, 30.0, mesh)
    assert delta.shape == (8,)
    # every real pair recovers the baked-in -15 deg relative rotation
    real = np.concatenate(
        [delta[2 * g : 2 * g + counts[g]] for g in range(4)]
    )
    np.testing.assert_allclose(np.degrees(real), -15.0, atol=1.0)


@needs_mesh
def test_cohort_matches_single_device(dummy_geom):
    from multimodars_tpu.parallel import (
        batched_pairs_from_geometries,
        cohort_mesh,
        cohort_relative_rotations,
    )
    from multimodars_tpu.pipelines.align_within import relative_rotations

    test, ref, tmask, rmask, _ = batched_pairs_from_geometries(
        [dummy_geom], sample_size=6, pad_pairs_to=8
    )
    mesh = cohort_mesh(cpu_devices[:8])
    sharded = cohort_relative_rotations(test, ref, tmask, rmask, 0.1, 30.0, mesh)
    single = relative_rotations(dummy_geom, 0.1, 30.0, False, 6, None)
    np.testing.assert_allclose(sharded[:2], single, atol=1e-9)


@needs_mesh
def test_cohort_wave_split_bit_identical(dummy_geom, monkeypatch):
    """Multi-wave dispatch (pairs > _MAX_PAIRS_PER_WAVE x devices) must be
    bit-identical to the unsplit sweep."""
    import multimodars_tpu.parallel.cohort as cohort_mod
    from multimodars_tpu.parallel import (
        batched_pairs_from_geometries,
        cohort_mesh,
        cohort_relative_rotations,
    )

    geometries = [dummy_geom.copy() for _ in range(8)]
    test, ref, tmask, rmask, _ = batched_pairs_from_geometries(
        geometries, sample_size=6, pad_pairs_to=16
    )
    mesh = cohort_mesh(cpu_devices[:2])
    unsplit = cohort_relative_rotations(test, ref, tmask, rmask, 1.0, 30.0, mesh)
    # wave cap 4/device on a 2-device mesh -> 16 pairs split into 2 waves
    monkeypatch.setattr(cohort_mod, "_MAX_PAIRS_PER_WAVE", 4)
    waved = cohort_relative_rotations(test, ref, tmask, rmask, 1.0, 30.0, mesh)
    np.testing.assert_array_equal(waved, unsplit)


@needs_mesh
def test_cohort_staged_input_sharded_and_cast(dummy_geom):
    """jax.Array inputs must honor the mesh sharding and compute-dtype cast
    (not bypass them), matching the numpy-input path exactly."""
    import jax.numpy as jnp

    from multimodars_tpu.parallel import (
        batched_pairs_from_geometries,
        cohort_mesh,
        cohort_relative_rotations,
    )

    test, ref, tmask, rmask, _ = batched_pairs_from_geometries(
        [dummy_geom.copy() for _ in range(4)], sample_size=6, pad_pairs_to=8
    )
    mesh = cohort_mesh(cpu_devices[:4])
    from_numpy = cohort_relative_rotations(test, ref, tmask, rmask, 1.0, 30.0, mesh)
    # f64 device arrays on the default device: must be cast + resharded
    staged = cohort_relative_rotations(
        jnp.asarray(test), jnp.asarray(ref),
        jnp.asarray(tmask), jnp.asarray(rmask), 1.0, 30.0, mesh,
    )
    np.testing.assert_array_equal(staged, from_numpy)


def test_graft_entry_single_chip():
    import __graft_entry__ as graft

    fn, example_args = graft.entry()
    out = jax.jit(fn)(*example_args)
    out.block_until_ready()
    assert out.shape == (example_args[0].shape[0],)


@needs_mesh
def test_graft_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@needs_mesh
def test_from_array_cohort_sharded_matches_local(dummy_geom):
    """from_array_cohort with a device list shards the pair batch and
    matches the unsharded result exactly."""
    import numpy as np

    from multimodars import from_array_cohort, numpy_to_inputdata

    rng = np.random.default_rng(2)
    cases = []
    for seed in range(3):
        rows = []
        for f in range(5):
            th = np.linspace(0, 2 * np.pi, 24, endpoint=False)
            r = 1.5 + 0.3 * np.abs(rng.standard_normal(24))
            rows.append(
                np.column_stack(
                    [np.full(24, f), 4.5 + r * np.cos(th), 4.5 + r * np.sin(th), np.full(24, f * 0.2)]
                )
            )
        cases.append(
            numpy_to_inputdata(np.concatenate(rows), np.array([0, 7.0, 4.5, 0.0]), True, label=f"c{seed}")
        )

    plain = from_array_cohort(cases, step_rotation_deg=1.0, range_rotation_deg=10.0,
                              sample_size=24, smooth=False)
    sharded = from_array_cohort(cases, step_rotation_deg=1.0, range_rotation_deg=10.0,
                                sample_size=24, smooth=False, devices=cpu_devices[:8])
    for (g1, l1, _), (g2, l2, _) in zip(plain, sharded):
        assert len(l1) == len(l2)
        for f1, f2 in zip(g1.frames, g2.frames):
            np.testing.assert_allclose(f1.lumen.xyz_view(), f2.lumen.xyz_view(), atol=1e-12)


class TestAngleShardedSearch:
    """The angle-axis sharded ladder (parallel.angle_shard) must be
    bit-identical to the single-device search for every mesh size."""

    def _sets(self, seed=0, F=5, N=160):
        rng = np.random.default_rng(seed)
        th = np.linspace(0, 2 * math.pi, N, endpoint=False)
        pts = []
        for f in range(F + 1):
            a = 2.0 + 0.2 * rng.standard_normal()
            b = 1.4 + 0.2 * rng.standard_normal()
            rot = rng.uniform(-0.4, 0.4)
            x = a * np.cos(th)
            y = b * np.sin(th)
            pts.append(
                np.stack(
                    [x * math.cos(rot) - y * math.sin(rot),
                     x * math.sin(rot) + y * math.cos(rot)], -1
                )
            )
        pts = np.asarray(pts)
        return pts[1:], pts[:-1]

    def test_identical_across_mesh_sizes(self):
        """Every mesh size must produce the *same bits* (the pmin-style
        argmin is exact); vs the fused single-device jit the grid
        construction may differ by one ulp of angle."""
        import jax

        from multimodars_tpu.ops.rotation_search import multires_rotation_search
        from multimodars_tpu.parallel import angle_mesh, sharded_multires_search

        cpus = jax.devices("cpu")
        test, ref = self._sets()
        tm = np.ones(test.shape[:2], bool)
        rm = np.ones(ref.shape[:2], bool)
        results = {}
        for n_dev in (1, 2, 4, 8):
            if len(cpus) < n_dev:
                pytest.skip("not enough virtual devices")
            results[n_dev] = sharded_multires_search(
                test, ref, tm, rm, 0.1, 30.0, mesh=angle_mesh(cpus[:n_dev])
            )
        for n_dev in (2, 4, 8):
            np.testing.assert_array_equal(results[n_dev], results[1])
        single = np.asarray(
            multires_rotation_search(test, ref, tm, rm, 0.1, 30.0)[0]
        )
        np.testing.assert_allclose(results[1], single, rtol=0, atol=1e-13)

    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_bruteforce_identical(self, n_dev):
        import jax

        from multimodars_tpu.ops.rotation_search import multires_rotation_search
        from multimodars_tpu.parallel import angle_mesh, sharded_multires_search

        cpus = jax.devices("cpu")
        if len(cpus) < n_dev:
            pytest.skip("not enough virtual devices")
        test, ref = self._sets(seed=3, F=3)
        tm = np.ones(test.shape[:2], bool)
        rm = np.ones(ref.shape[:2], bool)
        single = np.asarray(
            multires_rotation_search(test, ref, tm, rm, 0.5, 20.0, bruteforce=True)[0]
        )
        sharded = sharded_multires_search(
            test, ref, tm, rm, 0.5, 20.0, mesh=angle_mesh(cpus[:n_dev]),
            bruteforce=True,
        )
        np.testing.assert_allclose(sharded, single, rtol=0, atol=1e-13)


class TestShardedCctaCount:
    """sharded_count_within_radius must be bit-identical across mesh sizes
    and to the host count semantics (kernels.count_within_radius)."""

    def _clouds(self, seed=0, n=700, m=900):
        rng = np.random.default_rng(seed)
        t = np.linspace(0, 4 * math.pi, n)
        a = np.stack([np.cos(t), np.sin(t), t / 4.0], -1)
        a += 0.05 * rng.standard_normal(a.shape)
        s = np.linspace(0, 4 * math.pi, m)
        b = np.stack([np.cos(s), np.sin(s), s / 4.0], -1)
        b += 0.05 * rng.standard_normal(b.shape)
        return a, b

    def test_identical_across_mesh_sizes(self):
        import jax

        from multimodars_tpu.ccta.kernels import count_within_radius
        from multimodars_tpu.parallel import (
            rows_mesh, sharded_count_within_radius,
        )

        cpus = jax.devices("cpu")
        a, b = self._clouds()
        results = {}
        for n_dev in (1, 2, 4, 8):
            if len(cpus) < n_dev:
                pytest.skip("not enough virtual devices")
            results[n_dev] = sharded_count_within_radius(
                a, b, 0.35, mesh=rows_mesh(cpus[:n_dev])
            )
        for n_dev in (2, 4, 8):
            np.testing.assert_array_equal(results[n_dev], results[1])
        host = count_within_radius(a, b, 0.35)
        np.testing.assert_array_equal(results[1], host)

    def test_empty_sets(self):
        import jax

        from multimodars_tpu.parallel import (
            rows_mesh, sharded_count_within_radius,
        )

        mesh = rows_mesh(jax.devices("cpu")[:2])
        out = sharded_count_within_radius(
            np.zeros((0, 3)), np.ones((5, 3)), 1.0, mesh=mesh
        )
        assert out.shape == (0,)


@needs_mesh
class TestCCTAOrchestrationUnderMesh:
    """The UNCHANGED CCTA orchestration — the label wave sequence (bounded
    masks, occlusion, island absorption, reclassify), the batched morph
    chain of the scale stage, and the stitch — run with their device waves
    row-sharded over a multi-device mesh via ``shard_rows_over``, and every
    output must be bit-identical to the 1-device mesh and the all-host
    path.  Counting/argmin waves are integer-exact under any row partition
    and near-band rows re-decide exactly in f64 on the host, so this is a
    certification, not a tolerance comparison.  Parity bars:
    label_coronary.rs:29-225 / scale_coronary.rs:90-261 semantics under
    sharding."""

    def _run_pipeline(self, mesh_ctx):
        import contextlib
        import io as _io

        from test_fusion_e2e import TestFullFusionE2E

        from multimodars_tpu import ccta
        from multimodars_tpu.ccta.mesh import Mesh

        mesh, cl_ao, cl_rca, cl_lca, geom = TestFullFusionE2E._build_case(
            TestFullFusionE2E
        )
        with contextlib.redirect_stdout(_io.StringIO()), mesh_ctx:
            results, (rca_cl, _, ao_cl) = ccta.label(
                Mesh(mesh.vertices.copy(), mesh.faces.copy()),
                cl_ao, cl_rca, cl_lca,
                aligned_frames=geom.frames,
                anomalous_rca=True,
                control_plot=False,
            )
            results = dict(results)
            if not results["rca_removed_points"]:
                ostium = np.asarray(TestFullFusionE2E.RCA_P0)
                ao = np.asarray(results["aorta_points"])
                near = np.linalg.norm(ao - ostium, axis=1) < 5.0
                results["rca_removed_points"] = [
                    tuple(p) for p in ao[near][:40]
                ]
            results = ccta.scale(results, rca_cl, ao_cl, geom.frames)
            stitched = ccta.stitch(
                results, geom,
                region_remove=("anomalous_points",),
                prox_start_mode="nearest_iv",
                dist_start_mode="nearest_iv",
            )
        return results, stitched

    _REGION_KEYS = (
        "aorta_points", "rca_points", "lca_points", "rca_removed_points",
        "anomalous_points", "proximal_points", "distal_points",
    )

    def test_label_scale_stitch_bit_identical(self, monkeypatch):
        import contextlib

        from multimodars_tpu.parallel import shard_rows_over
        from multimodars_tpu.parallel.ccta_shard import rows_mesh

        # force every device wave the orchestration can take on the CPU
        # backend: resident counts, device NN passes, device ray casting
        monkeypatch.setenv("MMTPU_CCTA_RESIDENT", "1")
        import multimodars_tpu.ccta.kernels as K

        monkeypatch.setattr(K, "_DEVICE_PAIR_THRESHOLD", 0)
        monkeypatch.setattr(K, "_RAY_NATIVE_THRESHOLD", 0)

        res8, st8 = self._run_pipeline(
            shard_rows_over(rows_mesh(cpu_devices[:8]))
        )
        res1, st1 = self._run_pipeline(
            shard_rows_over(rows_mesh(cpu_devices[:1]))
        )
        monkeypatch.setenv("MMTPU_CCTA_RESIDENT", "0")
        res_host, st_host = self._run_pipeline(contextlib.nullcontext())

        for key in self._REGION_KEYS:
            assert sorted(map(tuple, res8[key])) == sorted(
                map(tuple, res1[key])
            ), f"{key}: 8-dev vs 1-dev"
            assert sorted(map(tuple, res8[key])) == sorted(
                map(tuple, res_host[key])
            ), f"{key}: 8-dev vs host"
        # the scale stage's morph chain moved vertices — bit-identical mesh
        np.testing.assert_array_equal(
            res8["mesh"].vertices, res1["mesh"].vertices
        )
        np.testing.assert_array_equal(
            res8["mesh"].vertices, res_host["mesh"].vertices
        )
        # stitched output: same weld, same triangles, same coordinates
        np.testing.assert_array_equal(
            st8["mesh"].vertices, st1["mesh"].vertices
        )
        np.testing.assert_array_equal(st8["mesh"].faces, st1["mesh"].faces)
        np.testing.assert_array_equal(
            st8["mesh"].vertices, st_host["mesh"].vertices
        )
        np.testing.assert_array_equal(
            st8["mesh"].faces, st_host["mesh"].faces
        )

    def test_rows_actually_sharded(self):
        """Guard against the context silently degrading to replicated-only:
        a divisible rows-tagged transfer inside the context must land with
        its leading axis split across the mesh."""
        import jax
        from jax.sharding import PartitionSpec as P

        from multimodars_tpu.parallel import shard_rows_over
        from multimodars_tpu.parallel.ccta_shard import rows_mesh
        from multimodars_tpu.utils.device import to_device

        mesh = rows_mesh(cpu_devices[:8])
        with shard_rows_over(mesh):
            arr = to_device(np.zeros((1024, 3)), np.float64, kind="rows")
            rep = to_device(np.zeros((64, 3)), np.float64)
        assert arr.sharding.spec == P("rows")
        assert len({d.id for d in arr.sharding.device_set}) == 8
        assert rep.sharding.spec == P()
