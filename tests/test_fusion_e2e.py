"""Full CCTA fusion end-to-end: label -> scale -> stitch on a synthetic
anomalous-RCA case (aorta + coronary tube meshes, intravascular frames
spanning the anomalous segment).  Mirrors the reference's
examples/fullworkflow.py flow (ccta/__init__.py:20-314) on
deterministic geometry."""

import math

import numpy as np
import pytest

from multimodars import numpy_to_geometry
from multimodars_tpu import ccta
from multimodars_tpu.ccta.mesh import Mesh, concatenate


def _basis_from_tangent(t):
    t = t / np.linalg.norm(t)
    helper = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(t, helper)) > 0.9:
        helper = np.array([0.0, 1.0, 0.0])
    u = np.cross(t, helper)
    u /= np.linalg.norm(u)
    v = np.cross(t, u)
    return u, v


def _tube_mesh(centers, radius, n_ring, cap=True):
    """Closed triangulated tube along a polyline of ring centers."""
    centers = np.asarray(centers, dtype=np.float64)
    n_slices = len(centers)
    verts = []
    for i, c in enumerate(centers):
        if i == 0:
            t = centers[1] - centers[0]
        elif i == n_slices - 1:
            t = centers[-1] - centers[-2]
        else:
            t = centers[i + 1] - centers[i - 1]
        u, v = _basis_from_tangent(t)
        for k in range(n_ring):
            th = 2.0 * math.pi * k / n_ring
            verts.append(c + radius * (math.cos(th) * u + math.sin(th) * v))
    faces = []
    for i in range(n_slices - 1):
        a0 = i * n_ring
        b0 = (i + 1) * n_ring
        for k in range(n_ring):
            k1 = (k + 1) % n_ring
            faces.append([a0 + k, b0 + k, b0 + k1])
            faces.append([a0 + k, b0 + k1, a0 + k1])
    verts = np.asarray(verts)
    faces = np.asarray(faces, dtype=np.int64)
    if cap:
        start_c = len(verts)
        verts = np.vstack([verts, centers[0], centers[-1]])
        end_c = start_c + 1
        cap_faces = []
        last0 = (n_slices - 1) * n_ring
        for k in range(n_ring):
            k1 = (k + 1) % n_ring
            cap_faces.append([start_c, k1, k])
            cap_faces.append([end_c, last0 + k, last0 + k1])
        faces = np.vstack([faces, np.asarray(cap_faces, dtype=np.int64)])
    return Mesh(verts, faces)


def _line(p0, p1, n):
    return np.linspace(np.asarray(p0, float), np.asarray(p1, float), n)


class TestFullFusionE2E:
    """The aorta is a vertical cylinder at (36, 0); the anomalous RCA
    descends mostly along -z (pullback frames stack in z, matching the
    in-range radius rule of scale_coronary.rs:263-312) and toward
    componentwise-smaller coordinates so the proximal-selection rule
    (point > distal centroid per coordinate) selects the ostial segment."""

    N_RING = 16
    RCA_P0 = (30.0, 0.0, 14.0)
    RCA_P1 = (22.0, -2.0, -8.0)

    def _build_case(self):
        aorta = _tube_mesh(_line((36, 0, 0), (36, 0, 20), 21), 6.0, 32)
        rca = _tube_mesh(_line(self.RCA_P0, self.RCA_P1, 25), 1.4, self.N_RING)
        lca = _tube_mesh(_line((42, 0, 14), (50, 2, -8), 25), 1.4, self.N_RING)
        mesh = concatenate([aorta, rca, lca])
        # mirror the real input path (read_mesh runs fix_normals on load)
        mesh.fix_normals()

        cl_ao = _line((36, 0, 20), (36, 0, 0), 50)
        cl_rca = _line(self.RCA_P0, self.RCA_P1, 60)
        cl_lca = _line((42, 0, 14), (50, 2, -8), 60)

        # intravascular frames across the mid (anomalous) RCA segment
        p0, p1 = np.asarray(self.RCA_P0), np.asarray(self.RCA_P1)
        axis = p1 - p0
        u, v = _basis_from_tangent(axis)
        lumen_rows, wall_rows = [], []
        n_pts = 24
        for f, t in enumerate(np.linspace(0.42, 0.62, 8)):
            c = p0 + t * axis
            for k in range(n_pts):
                th = 2.0 * math.pi * k / n_pts
                d = math.cos(th) * u + math.sin(th) * v
                lumen_rows.append([f, *(c + 1.2 * d)])
                wall_rows.append([f, *(c + 1.7 * d)])
        geom = numpy_to_geometry(
            np.asarray(lumen_rows), wall_arr=np.asarray(wall_rows), label="iv"
        )
        # mark ostial frame as aorta-adjacent so the wall-scaling reference
        # extraction (manipulating.py:400-458 parity) has a source
        geom.frames[0].lumen.aortic_thickness = 1.0
        return mesh, cl_ao, cl_rca, cl_lca, geom

    @pytest.fixture(scope="class")
    def fused(self):
        mesh, cl_ao, cl_rca, cl_lca, geom = self._build_case()
        results, (rca_cl, lca_cl, ao_cl) = ccta.label(
            mesh, cl_ao, cl_rca, cl_lca,
            aligned_frames=geom.frames,
            anomalous_rca=True,
            control_plot=False,
        )
        return results, rca_cl, ao_cl, geom

    def test_label_partitions_regions(self, fused):
        results, _, _, _ = fused
        assert len(results["rca_points"]) > 100
        assert len(results["lca_points"]) > 100
        assert len(results["aorta_points"]) > 300
        # anomalous sub-partitioning driven by the frames' extent
        assert len(results["anomalous_points"]) > 50
        assert len(results["proximal_points"]) > 0
        assert len(results["distal_points"]) > 0

    def test_scale_and_stitch(self, fused):
        results, rca_cl, ao_cl, geom = fused
        results = dict(results)
        if not results["rca_removed_points"]:
            # the ray-occlusion heuristic found no intramural course on this
            # clean synthetic surface; seed ostium-adjacent aortic points so
            # the aorta-scaling path is exercised deterministically (the
            # heuristic itself is unit-tested in test_ccta.py)
            ostium = np.asarray(self.RCA_P0)
            ao = np.asarray(results["aorta_points"])
            near = np.linalg.norm(ao - ostium, axis=1) < 5.0
            results["rca_removed_points"] = [tuple(p) for p in ao[near][:40]]
            assert results["rca_removed_points"]

        n_verts_before = len(results["mesh"].vertices)
        results = ccta.scale(results, rca_cl, ao_cl, geom.frames)
        assert len(results["mesh"].vertices) == n_verts_before
        assert np.isfinite(results["mesh"].vertices).all()

        stitched = ccta.stitch(
            results, geom,
            region_remove=("anomalous_points",),
            prox_start_mode="nearest_iv",
            dist_start_mode="nearest_iv",
        )
        m = stitched["mesh"]
        assert len(m.faces) > 0
        assert np.isfinite(m.vertices).all()
        # the intravascular tube and both stitch patches were welded in
        assert stitched["prox_boundary_points"]
        assert stitched["dist_boundary_points"]
        assert len(stitched["anomalous_points"]) > 0
        # every face references a valid vertex
        assert m.faces.max() < len(m.vertices)
        # the stitched surface is closed or nearly closed around the graft
        assert len(m.boundary_loops()) <= 4

    def test_export_sections(self, fused, tmp_path):
        results, _, _, _ = fused
        ccta.export_section_stl(results, type="all", output_dir=tmp_path)
        ccta.export_section_stl(results, type="rca", output_dir=tmp_path)
        assert (tmp_path / "all.stl").exists()
        assert (tmp_path / "rca.stl").exists()


class TestCertifiedWindingBitIdentity:
    """The construction-certified winding paths (quad-strip ``_oriented``,
    pre-flipped fan fills) must produce a stitched mesh bit-identical to
    forcing the full winding BFS at every ``fix_winding`` gate — the
    certification is a skip of provable no-ops, never a semantic change."""

    def _stitch_once(self):
        import contextlib, io as _io

        mesh, cl_ao, cl_rca, cl_lca, geom = TestFullFusionE2E._build_case(
            TestFullFusionE2E
        )
        with contextlib.redirect_stdout(_io.StringIO()):
            results, (rca_cl, _, ao_cl) = ccta.label(
                mesh, cl_ao, cl_rca, cl_lca,
                aligned_frames=geom.frames,
                anomalous_rca=True, control_plot=False,
            )
            results = dict(results)
            if not results["rca_removed_points"]:
                ostium = np.asarray(TestFullFusionE2E.RCA_P0)
                ao = np.asarray(results["aorta_points"])
                near = np.linalg.norm(ao - ostium, axis=1) < 5.0
                results["rca_removed_points"] = [tuple(p) for p in ao[near][:40]]
            results = ccta.scale(results, rca_cl, ao_cl, geom.frames)
            stitched = ccta.stitch(
                results, geom,
                region_remove=("anomalous_points",),
                prox_start_mode="nearest_iv",
                dist_start_mode="nearest_iv",
            )
        return stitched["mesh"]

    def test_certified_matches_forced_bfs(self, monkeypatch):
        certified = self._stitch_once()

        orig = Mesh.fix_winding

        def forced(self):
            self._oriented = False  # drop every certification: full BFS
            orig(self)

        monkeypatch.setattr(Mesh, "fix_winding", forced)
        full_bfs = self._stitch_once()

        np.testing.assert_array_equal(certified.faces, full_bfs.faces)
        np.testing.assert_array_equal(certified.vertices, full_bfs.vertices)


class TestOverlappedIslandWave:
    """The occlusion-overlapped island dispatch (base complement + removed
    correction) must produce regions identical to the all-host path —
    counts are additive over the disjoint aorta decomposition."""

    def test_resident_overlap_matches_host(self, monkeypatch):
        mesh, cl_ao, cl_rca, cl_lca, geom = TestFullFusionE2E._build_case(
            TestFullFusionE2E
        )

        def run():
            import contextlib, io as _io

            with contextlib.redirect_stdout(_io.StringIO()):
                results, _ = ccta.label(
                    Mesh(mesh.vertices.copy(), mesh.faces.copy()),
                    cl_ao, cl_rca, cl_lca,
                    aligned_frames=geom.frames,
                    anomalous_rca=True,
                    control_plot=False,
                )
            return results

        monkeypatch.setenv("MMTPU_CCTA_RESIDENT", "1")
        res_dev = run()
        monkeypatch.setenv("MMTPU_CCTA_RESIDENT", "0")
        res_host = run()
        for key in ("aorta_points", "rca_points", "lca_points",
                    "rca_removed_points", "anomalous_points",
                    "proximal_points", "distal_points"):
            assert sorted(map(tuple, res_dev[key])) == sorted(
                map(tuple, res_host[key])
            ), key


class TestSyncRemapsOverlappingRegions:
    """Reference parity (manipulating.py:676-724): sync_results_to_mesh
    remaps EVERY coordinate list, so a region overlapping the morphed
    vertices (rca_points ⊇ distal/proximal sub-regions) must carry the
    moved coordinates instead of going stale or silently shrinking."""

    def test_scale_keeps_overlapping_regions_consistent(self):
        import contextlib, io as _io

        mesh, cl_ao, cl_rca, cl_lca, geom = TestFullFusionE2E._build_case(
            TestFullFusionE2E
        )
        with contextlib.redirect_stdout(_io.StringIO()):
            results, (rca_cl, _, ao_cl) = ccta.label(
                mesh, cl_ao, cl_rca, cl_lca,
                aligned_frames=geom.frames, anomalous_rca=True,
                control_plot=False,
            )
            if not results["rca_removed_points"]:
                ao = np.asarray(results["aorta_points"])
                near = np.linalg.norm(ao - np.array([30.0, 0.0, 14.0]), axis=1) < 5.0
                results["rca_removed_points"] = [tuple(p) for p in ao[near][:50]]
            n_rca_before = len(results["rca_points"])
            scaled = ccta.scale(results, rca_cl, ao_cl, geom.frames)

        assert len(scaled["rca_points"]) == n_rca_before
        final_verts = {tuple(v) for v in scaled["mesh"].vertices}
        for key in ("rca_points", "proximal_points", "distal_points",
                    "anomalous_points", "aorta_points"):
            pts = scaled[key]
            assert pts, key
            missing = [p for p in pts if tuple(p) not in final_verts]
            assert not missing, f"{key}: {len(missing)} stale coordinates"
        # rca region == union of its sub-regions, coordinate-exact
        sub = {tuple(p) for k in ("proximal_points", "distal_points",
                                  "anomalous_points") for p in scaled[k]}
        assert sub == {tuple(p) for p in scaled["rca_points"]}


class TestBatchedMorphChainParity:
    """The batched morph chain (one mesh copy + one sync, NN waves
    dispatched before the sweeps resolve) must be bit-identical to the
    sequential scale_region_centerline_morphing + sync chain whenever the
    regions are pairwise disjoint across specs (ccta.scale engages it
    exactly then)."""

    def _scaled_pair(self):
        import contextlib, io as _io

        from multimodars_tpu.ccta import manipulating

        mesh, cl_ao, cl_rca, cl_lca, geom = TestFullFusionE2E._build_case(
            TestFullFusionE2E
        )
        with contextlib.redirect_stdout(_io.StringIO()):
            results, (rca_cl, _, ao_cl) = ccta.label(
                mesh, cl_ao, cl_rca, cl_lca,
                aligned_frames=geom.frames, anomalous_rca=True,
                control_plot=False,
            )
            if not results["rca_removed_points"]:
                ao = np.asarray(results["aorta_points"])
                near = np.linalg.norm(
                    ao - np.array([30.0, 0.0, 14.0]), axis=1
                ) < 5.0
                results["rca_removed_points"] = [tuple(p) for p in ao[near][:50]]

            engaged = []
            orig_finish = manipulating.morph_regions_finish

            def spy_finish(results_, states, adjustments):
                engaged.append(True)
                return orig_finish(results_, states, adjustments)

            manipulating.morph_regions_finish = spy_finish
            try:
                batched = ccta.scale(dict(results), rca_cl, ao_cl, geom.frames)
            finally:
                manipulating.morph_regions_finish = orig_finish
            assert engaged, "batched morph chain did not engage"

            orig_start = manipulating.morph_regions_start
            manipulating.morph_regions_start = lambda mesh_, specs: None
            try:
                sequential = ccta.scale(dict(results), rca_cl, ao_cl, geom.frames)
            finally:
                manipulating.morph_regions_start = orig_start
        return batched, sequential

    def test_bit_identical_to_sequential_chain(self):
        batched, sequential = self._scaled_pair()
        assert np.array_equal(
            batched["mesh"].vertices, sequential["mesh"].vertices
        )
        assert np.array_equal(batched["mesh"].faces, sequential["mesh"].faces)
        for key in ("rca_points", "lca_points", "aorta_points",
                    "rca_removed_points", "proximal_points", "distal_points",
                    "anomalous_points"):
            assert batched[key] == sequential[key], key
