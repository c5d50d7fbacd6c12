"""Bit-identity tests for the native alignment-epilogue kernels.

``mm_finish_roll`` / ``mm_wall_offset`` (native/mmio.cpp) promise results
bit-identical to the numpy passes they replace in
:meth:`TensorGeometry.finish_transform` and
``pipelines.align_within._wall_tensor`` — the expressions replicate the
numpy evaluation order and the build disables FP contraction.  These tests
hold them to exact ``==`` equality, no tolerances.
"""

import numpy as np
import pytest

from multimodars_tpu.io import native


pytestmark = pytest.mark.skipif(
    native.get_library() is None
    or not hasattr(native.get_library(), "mm_finish_roll"),
    reason="native library unavailable",
)


def _numpy_finish(xyz, ct, st, cx, cy, dx, dy, dz, add_z, do_roll):
    """The exact numpy pass from TensorGeometry.finish_transform."""
    F, N = xyz.shape[:2]
    x = xyz[:, :, 0] - cx[:, None]
    y = xyz[:, :, 1] - cy[:, None]
    xp = x * ct[:, None] - y * st[:, None] + cx[:, None] + dx[:, None]
    yp = x * st[:, None] + y * ct[:, None] + cy[:, None] + dy[:, None]
    if not do_roll:
        out = xyz.copy()
        out[:, :, 0] = xp
        out[:, :, 1] = yp
        if add_z:
            out[:, :, 2] += dz[:, None]
        return out, np.zeros(F, dtype=np.int64)
    start = N - 1 - np.argmax(yp[:, ::-1], axis=1)
    roll = (np.arange(N)[None, :] + start[:, None]) % N
    out = np.empty_like(xyz)
    out[:, :, 0] = np.take_along_axis(xp, roll, axis=1)
    out[:, :, 1] = np.take_along_axis(yp, roll, axis=1)
    out[:, :, 2] = xyz[:, :, 2]
    if add_z:
        out[:, :, 2] += dz[:, None]
    return out, start


def _case(seed, F, N, constant_z=True):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-5.0, 5.0, (F, N, 3))
    if constant_z:
        xyz[:, :, 2] = rng.uniform(0.0, 10.0, (F, 1))
    angles = rng.uniform(-0.4, 0.4, F)
    total = angles + rng.uniform(-0.2, 0.2)
    ct, st = np.cos(total), np.sin(total)
    cx = np.ascontiguousarray(rng.uniform(-2, 2, F))
    cy = np.ascontiguousarray(rng.uniform(-2, 2, F))
    dx = np.ascontiguousarray(rng.uniform(-1, 1, F))
    dy = np.ascontiguousarray(rng.uniform(-1, 1, F))
    dz = np.ascontiguousarray(rng.uniform(-1, 1, F))
    return xyz, ct, st, cx, cy, dx, dy, dz


@pytest.mark.parametrize("do_roll", [True, False])
@pytest.mark.parametrize("add_z", [True, False])
@pytest.mark.parametrize("seed,F,N", [(0, 1, 3), (1, 7, 64), (2, 61, 501)])
def test_finish_roll_bit_identical(seed, F, N, do_roll, add_z):
    xyz, ct, st, cx, cy, dx, dy, dz = _case(seed, F, N)
    ref, ref_start = _numpy_finish(
        xyz.copy(), ct, st, cx, cy, dx, dy, dz, add_z, do_roll
    )
    out, start = native.finish_roll_native(
        xyz.copy(), ct, st, cx, cy, dx, dy, dz, add_z, do_roll
    )
    assert (start == ref_start).all()
    assert (out == ref).all()


def test_finish_roll_tie_breaking_last_max():
    """Roll start is the LAST index attaining the max y (numpy
    n-1-argmax(y[::-1]) semantics), including exact ties."""
    F, N = 1, 8
    xyz = np.zeros((F, N, 3))
    # y values with an exact tie at indices 2 and 5
    xyz[0, :, 1] = [0.0, 1.0, 3.0, 2.0, 1.0, 3.0, 0.5, -1.0]
    zero = np.zeros(F)
    one = np.ones(F)
    out, start = native.finish_roll_native(
        xyz, one, zero, zero, zero, zero, zero, zero, False, True
    )
    assert start[0] == 5


def test_finish_roll_inplace_no_roll():
    """Without a roll the kernel may write in place (out aliases in)."""
    xyz, ct, st, cx, cy, dx, dy, dz = _case(5, 4, 33)
    ref, _ = _numpy_finish(xyz.copy(), ct, st, cx, cy, dx, dy, dz, False, False)
    buf = xyz.copy()
    out, _ = native.finish_roll_native(
        buf, ct, st, cx, cy, dx, dy, dz, False, False
    )
    assert out is buf
    assert (buf == ref).all()


@pytest.mark.parametrize("seed,F,N", [(0, 1, 2), (3, 9, 128), (4, 41, 500)])
def test_wall_offset_bit_identical(seed, F, N):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-4.0, 4.0, (F, N, 3))
    centroids = src.mean(axis=1)
    relx = src[:, :, 0] - centroids[:, None, 0]
    rely = src[:, :, 1] - centroids[:, None, 1]
    length = np.sqrt(relx * relx + rely * rely)
    ok = length > np.finfo(np.float64).eps
    scale = np.where(ok, 1.0 / np.where(length > 0, length, 1.0), 0.0)
    ref = src.copy()
    ref[:, :, 0] += relx * scale
    ref[:, :, 1] += rely * scale
    out, cen = native.wall_offset_native(src)
    assert (cen == centroids).all()
    assert (out == ref).all()


def test_wall_offset_degenerate_radius():
    """A point exactly at the centroid gets zero offset, like the numpy
    eps-guarded scale."""
    src = np.zeros((1, 4, 3))
    # all four points identical -> centroid coincides, length == 0
    out, cen = native.wall_offset_native(src)
    assert (out == src).all()


def test_finish_transform_end_to_end_matches_pre_native_semantics():
    """TensorGeometry.finish_transform with the native path produces the
    same coordinates as the hand-run numpy pass (the pre-native code)."""
    from multimodars_tpu.models.tensor import geometry_to_tensor
    from multimodars_tpu.models import PyGeometry, PyFrame, PyContour

    rng = np.random.default_rng(11)
    F, N = 13, 40
    frames = []
    for f in range(F):
        th = np.linspace(0, 2 * np.pi, N, endpoint=False)
        pts = np.stack(
            [
                4.5 + (2 + 0.1 * rng.standard_normal()) * np.cos(th),
                4.5 + (1.5 + 0.1 * rng.standard_normal()) * np.sin(th),
                np.full(N, 0.2 * f),
            ],
            axis=-1,
        )
        lumen = PyContour.from_arrays(
            f, f, pts, tuple(pts.mean(axis=0)),
            np.full(N, f, dtype=np.int64), np.arange(N, dtype=np.int64),
            np.zeros(N, dtype=bool), None, None, "Lumen",
        )
        frame = PyFrame.__new__(PyFrame)
        frame.id = f
        frame.centroid = tuple(pts.mean(axis=0))
        frame.lumen = lumen
        frame.extras = {}
        frame.reference_point = None
        frames.append(frame)
    geom = PyGeometry(frames, "native-e2e")
    tg = geometry_to_tensor(geom)

    angles = rng.uniform(-0.3, 0.3, F)
    deltas = np.column_stack(
        [rng.uniform(-1, 1, F), rng.uniform(-1, 1, F), np.zeros(F)]
    )
    additional = 0.21

    # numpy replication of the do_roll pass
    xyz = tg.coords["Lumen"].copy()
    total = angles + additional
    ct, st = np.cos(total), np.sin(total)
    cx, cy = tg.centroids[:, 0].copy(), tg.centroids[:, 1].copy()
    ref, _ = _numpy_finish(
        xyz, ct, st, cx, cy,
        np.ascontiguousarray(deltas[:, 0]), np.ascontiguousarray(deltas[:, 1]),
        np.ascontiguousarray(deltas[:, 2]), False, True,
    )

    tg.finish_transform(angles, deltas, additional, ccw_roll=True)
    assert (tg.coords["Lumen"] == ref).all()


class TestSharedBlockTransforms:
    """The block fast paths in PyGeometry.translate_geometry and
    align_between.rotate_geometry_around_point must be bit-identical to the
    per-frame object loops they shortcut."""

    def _tensor_geometry(self, seed=7, F=11, N=60):
        import numpy as np
        from multimodars_tpu.models import PyGeometry, PyFrame, PyContour
        from multimodars_tpu.models.tensor import geometry_to_tensor

        rng = np.random.default_rng(seed)
        frames = []
        for f in range(F):
            th = np.linspace(0, 2 * np.pi, N, endpoint=False)
            pts = np.stack(
                [
                    4.5 + 2.0 * np.cos(th) + 0.05 * rng.standard_normal(N),
                    4.5 + 1.5 * np.sin(th) + 0.05 * rng.standard_normal(N),
                    np.full(N, 0.2 * f),
                ],
                axis=-1,
            )
            lumen = PyContour.from_arrays(
                f, f, pts, tuple(pts.mean(axis=0)),
                np.full(N, f, dtype=np.int64), np.arange(N, dtype=np.int64),
                np.zeros(N, dtype=bool), None, None, "Lumen",
            )
            frame = PyFrame.__new__(PyFrame)
            frame.id = f
            frame.centroid = tuple(pts.mean(axis=0))
            frame.lumen = lumen
            frame.extras = {}
            frame.reference_point = None
            frames.append(frame)
        geom = PyGeometry(frames, "blk")
        return geometry_to_tensor(geom).to_geometry()

    def test_blocks_detected_on_tensor_views(self):
        from multimodars_tpu.models.geometry import shared_contour_blocks

        geom = self._tensor_geometry()
        blocks = shared_contour_blocks(geom.frames)
        assert blocks is not None
        assert sum(len(cs) for _, _, cs in blocks) == len(geom.frames)

    @staticmethod
    def _deview(geom):
        """Strip the shared-block view structure (plain owning arrays) so
        the per-frame loop paths get exercised."""
        for f in geom.frames:
            for c in [f.lumen, *f.extras.values()]:
                c._coords = np.array(c._coords)
        return geom

    def test_copy_preserves_block_structure(self):
        """Geometry copies keep the shared [F, N, 3] block views (one numpy
        pass instead of per-contour copies), stay independent of the
        original, and keep the block fast path for their own transforms."""
        from multimodars_tpu.models.geometry import shared_contour_blocks

        geom = self._tensor_geometry()
        cp = geom.copy()
        assert shared_contour_blocks(cp.frames) is not None
        before = geom.frames[0].lumen.xyz_view().copy()
        cp.frames[0].lumen.xyz_view()[:] += 5.0
        assert (geom.frames[0].lumen.xyz_view() == before).all()

    def test_blocks_none_on_plain_arrays(self):
        from multimodars_tpu.models.geometry import shared_contour_blocks

        geom = self._deview(self._tensor_geometry().copy())
        assert shared_contour_blocks(geom.frames) is None

    def test_translate_block_matches_loop(self):
        import numpy as np

        fast = self._tensor_geometry()
        slow = self._deview(self._tensor_geometry().copy())  # per-frame loop
        t = (0.37, -1.21, 0.05)
        fast.translate_geometry(t)
        slow.translate_geometry(t)
        for ff, fs in zip(fast.frames, slow.frames):
            assert (ff.lumen.xyz_view() == fs.lumen.xyz_view()).all()
            assert ff.lumen.centroid == fs.lumen.centroid
            assert ff.centroid == fs.centroid

    def test_rotate_block_matches_loop(self):
        import numpy as np
        from multimodars_tpu.pipelines.align_between import (
            rotate_geometry_around_point,
        )

        fast = self._tensor_geometry()
        slow = self._deview(self._tensor_geometry().copy())
        rotate_geometry_around_point(fast, 0.31, (4.0, 4.25, 0.0))
        rotate_geometry_around_point(slow, 0.31, (4.0, 4.25, 0.0))
        for ff, fs in zip(fast.frames, slow.frames):
            assert (ff.lumen.xyz_view() == fs.lumen.xyz_view()).all()
            assert ff.centroid == fs.centroid

    def test_sparse_rows_leave_unviewed_tensor_rows_untouched(self):
        import numpy as np
        from multimodars_tpu.models.geometry import PyGeometry
        from multimodars_tpu.models.geometry import shared_contour_blocks

        geom = self._tensor_geometry()
        base = geom.frames[0].lumen.xyz_view().base
        dropped_row = base[3].copy()
        sub = PyGeometry(
            [f for i, f in enumerate(geom.frames) if i != 3], "sparse"
        )
        blocks = shared_contour_blocks(sub.frames)
        assert blocks is not None
        sub.translate_geometry((1.0, 2.0, 0.0))
        assert (base[3] == dropped_row).all()
        assert (geom.frames[4].lumen.xyz_view()[:, 0] > dropped_row[:, 0].min()).any()


class TestDeferredBetweenOrchestration:
    """entry.full_processing's overlapped orchestration (deferred
    materialisation + cloud-level initial translation) must be bit-identical
    to the eager align-within -> two align_between_geometries_batch stages
    it replaced."""

    def _inputs(self):
        import numpy as np
        from multimodars import numpy_to_inputdata

        from multimodars_tpu._processing import _to_inputdata

        rng = np.random.default_rng(17)
        datas = []
        for g in range(4):
            rows = []
            for f in range(12):
                th = np.linspace(0, 2 * np.pi, 40, endpoint=False)
                x = 4.5 + (2 + 0.2 * rng.standard_normal()) * np.cos(th + 0.1 * f)
                y = 4.5 + (1.5 + 0.2 * rng.standard_normal()) * np.sin(th + 0.1 * f)
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

    def test_full_processing_matches_eager_stages(self, capsys):
        import numpy as np
        from multimodars_tpu.pipelines.entry import (
            full_processing, prepare_n_geometries,
        )
        from multimodars_tpu.pipelines.align_within import (
            align_frames_in_geometries,
        )
        from multimodars_tpu.pipelines.align_between import (
            align_between_geometries_batch,
        )

        datas = self._inputs()
        kw = dict(step_deg=1.0, range_deg=10.0, smooth=False,
                  bruteforce=False, sample_size=480)

        # new orchestration
        pair_ab, pair_cd, pair_ac, pair_bd, *_ = full_processing(
            [d.label for d in datas], (4.5, 4.5), 0.5, 20,
            input_data=datas, write_obj=False, postprocessing=False,
            step_deg=1.0, range_deg=10.0, smooth=False, verbose=False,
        )

        # eager legacy sequence
        geoms = prepare_n_geometries(
            [d.label for d in datas], (4.5, 4.5), 0.5, 20, datas, True,
            None, None, "full", verbose=False,
        )
        aligned = align_frames_in_geometries(
            geoms, 1.0, 10.0, False, False, 480, verbose=False
        )
        (ga, _, _), (gb, _, _), (gc, _, _), (gd, _, _) = aligned
        e_ab, e_cd = align_between_geometries_batch(
            [(ga, gb), (gc, gd)], 10.0, 1.0, 480, verbose=False
        )
        e_ac, e_bd = align_between_geometries_batch(
            [(ga, gc), (gb, gd)], 10.0, 1.0, 480, verbose=False
        )

        for new, old in ((pair_ab, e_ab), (pair_cd, e_cd),
                         (pair_ac, e_ac), (pair_bd, e_bd)):
            for gn, go in ((new.geom_a, old.geom_a), (new.geom_b, old.geom_b)):
                assert len(gn.frames) == len(go.frames)
                for fn, fo in zip(gn.frames, go.frames):
                    assert (fn.lumen.xyz_view() == fo.lumen.xyz_view()).all()
                    assert fn.centroid == fo.centroid

    def test_extract_stack_matches_object_extraction(self):
        import numpy as np
        from multimodars_tpu.pipelines.align_between import (
            extract_geometry_points, extract_stack_points,
        )

        geom = TestSharedBlockTransforms()._tensor_geometry(seed=3, F=9, N=70)
        base = geom.frames[0].lumen.xyz_view().base
        a = extract_geometry_points(geom, 500)
        b = extract_stack_points(base, 500)
        assert (a == b).all()


class TestAorticWallBatch:
    """wall.aortic_walls_batch must be bitwise-identical to per-frame
    create_aortic_wall (wall.rs:109-213) on rectangular stacks."""

    def _contour(self, xyz, pidx, th, cid=0):
        from multimodars_tpu.models.contour import PyContour

        n = xyz.shape[0]
        return PyContour.from_arrays(
            cid, cid, xyz.copy(), tuple(xyz.mean(axis=0)),
            np.full(n, cid, dtype=np.int64), pidx.copy(),
            np.zeros(n, dtype=bool), float(th), None, "Lumen",
        )

    @pytest.mark.parametrize("P", [40, 120, 500, 501, 41])
    def test_matches_scalar(self, P):
        from multimodars_tpu.pipelines import wall

        rng = np.random.default_rng(11)
        K = 7
        theta = np.linspace(0, 2 * np.pi, P, endpoint=False)
        xyz = np.empty((K, P, 3))
        for k in range(K):
            r = 1.8 + 0.4 * rng.standard_normal(P)
            xyz[k, :, 0] = 4.5 + r * np.cos(theta)
            xyz[k, :, 1] = 4.5 + r * np.sin(theta)
            xyz[k, :, 2] = 0.3 * k
        pidx = np.tile(np.arange(P, dtype=np.int64), (K, 1))
        th = rng.uniform(0.3, 2.0, K)

        batch = wall.aortic_walls_batch(xyz, pidx, th)
        assert batch is not None
        for k in range(K):
            scalar = wall.create_aortic_wall(
                self._contour(xyz[k], pidx[k], th[k], cid=k)
            )
            assert scalar.n_points == P
            sv = scalar.xyz_view()
            # 1-point segments parameterise as 0/0 -> nan in BOTH paths
            same = (batch[k] == sv) | (np.isnan(batch[k]) & np.isnan(sv))
            assert same.all()
            assert (scalar.frame_indices == np.full(P, k)).all()
            assert (scalar.point_indices == pidx[k]).all()

    def test_segment_overflow_falls_back(self):
        from multimodars_tpu.pipelines import wall

        # dist_up and dist_right round up hard enough that n_low < 0:
        # an L-shaped degenerate frame with a huge thickness
        xyz = np.zeros((1, 8, 3))
        xyz[0, :, 0] = [0, 0, 0, 0, 0.0, 0, 0, 0]
        xyz[0, 0, 1] = 100.0  # up_mid far above low_mid -> dist_right huge
        pidx = np.tile(np.arange(8, dtype=np.int64), (1, 1))
        res = wall.aortic_walls_batch(xyz, pidx, np.array([1000.0]))
        if res is not None:  # rounding kept n_low >= 0: parity still holds
            from multimodars_tpu.models.contour import PyContour

            c = PyContour.from_arrays(
                0, 0, xyz[0].copy(), tuple(xyz[0].mean(axis=0)),
                np.zeros(8, dtype=np.int64), pidx[0].copy(),
                np.zeros(8, dtype=bool), 1000.0, None, "Lumen",
            )
            scalar = wall.create_aortic_wall(c)
            assert scalar.n_points == 8

    def test_degenerate_segments_match(self):
        """Tiny contours force 0/1-length segments (nan propagation from
        the 0/0 parameterisation) — the batch must reproduce them."""
        from multimodars_tpu.pipelines import wall

        rng = np.random.default_rng(5)
        P = 8
        xyz = rng.uniform(0, 9, (4, P, 3))
        xyz[:, :, 2] = xyz[:, :1, 2]
        pidx = np.tile(np.arange(P, dtype=np.int64), (4, 1))
        th = rng.uniform(0.1, 4.0, 4)
        batch = wall.aortic_walls_batch(xyz, pidx, th)
        if batch is None:
            return  # segment overflow: scalar path shortens, spine falls back
        for k in range(4):
            scalar = wall.create_aortic_wall(self._contour(xyz[k], pidx[k], th[k]))
            if scalar.n_points != P:
                continue
            sv = scalar.xyz_view()
            same = (batch[k] == sv) | (np.isnan(batch[k]) & np.isnan(sv))
            assert same.all()


class TestSortedPrefetchParity:
    """The post-CCW-sort sweep prefetch (downsampled sample sets) must be
    bit-identical to the in-align dispatch it replaces."""

    def _build(self, prefetch):
        from multimodars_tpu.io.csv_io import process_directory
        from multimodars_tpu.io.build import build_any_from_inputdata
        import contextlib, io as _io

        fix = "tests/data/fixtures/ivus_rest"
        with contextlib.redirect_stdout(_io.StringIO()):
            d = process_directory(fix, None, True, "x")
            return build_any_from_inputdata(
                d, label="x", diastole=True, prefetch=prefetch
            )

    def test_prefetch_engages_below_full_width(self):
        g = self._build(dict(step_deg=1.0, range_deg=10.0, bruteforce=False,
                             sample_size=100))
        assert getattr(g, "_pending_sweep", None) is not None

    def test_aligned_outputs_identical(self):
        from multimodars_tpu.pipelines.align_within import (
            align_frames_in_geometries,
        )
        import contextlib, io as _io

        kw = dict(step_deg=1.0, range_deg=10.0, bruteforce=False,
                  sample_size=100)
        g_pre = self._build(kw)
        g_plain = self._build(None)
        with contextlib.redirect_stdout(_io.StringIO()):
            (a, logs_a, anom_a), = align_frames_in_geometries(
                [g_pre], 1.0, 10.0, False, False, 100, verbose=False
            )
            (b, logs_b, anom_b), = align_frames_in_geometries(
                [g_plain], 1.0, 10.0, False, False, 100, verbose=False
            )
        assert anom_a == anom_b
        assert [
            (l.contour_id, l.matched_to, l.rot_deg, l.tx, l.ty, l.centroid)
            for l in logs_a
        ] == [
            (l.contour_id, l.matched_to, l.rot_deg, l.tx, l.ty, l.centroid)
            for l in logs_b
        ]
        for fa, fb in zip(a.frames, b.frames):
            assert (fa.lumen.xyz_view() == fb.lumen.xyz_view()).all()
            assert fa.centroid == fb.centroid

    def test_key_mismatch_ignores_stale_prefetch(self):
        from multimodars_tpu.pipelines.align_within import _take_pending_sweep

        g = self._build(dict(step_deg=1.0, range_deg=10.0, bruteforce=False,
                             sample_size=100))
        assert _take_pending_sweep(g, 0.5, 10.0, False, 100) is None


class TestCreateWallFramesBatchParity:
    """create_wall_frames' batched aortic path must equal the scalar
    per-frame composites exactly (the default postprocessing path)."""

    def test_object_path_matches_scalar(self):
        from multimodars_tpu.models import PyContour, PyFrame
        from multimodars_tpu.pipelines import wall

        rng = np.random.default_rng(21)
        P = 60
        frames = []
        for f in range(5):
            th = np.linspace(0, 2 * np.pi, P, endpoint=False)
            pts = np.stack(
                [4.5 + 2 * np.cos(th), 4.5 + 1.5 * np.sin(th), np.full(P, f * 0.4)],
                axis=-1,
            ) + 0.05 * rng.standard_normal((P, 3)) * [1, 1, 0]
            lum = PyContour.from_arrays(
                f, f, pts, tuple(pts.mean(axis=0)),
                np.full(P, f, dtype=np.int64), np.arange(P, dtype=np.int64),
                np.zeros(P, dtype=bool), 0.5 + 0.2 * f, None, "Lumen",
            )
            fr = PyFrame.__new__(PyFrame)
            fr.id = f
            fr.centroid = tuple(pts.mean(axis=0))
            fr.lumen = lum
            fr.extras = {}
            fr.reference_point = None
            frames.append(fr)

        out = wall.create_wall_frames(frames, anomalous=True)
        for fr, src in zip(out, frames):
            scalar = wall.create_aortic_wall(src.lumen)
            got = fr.extras["Wall"]
            sv, gv = scalar.xyz_view(), got.xyz_view()
            same = (gv == sv) | (np.isnan(gv) & np.isnan(sv))
            assert same.all()
            assert (got.frame_indices == scalar.frame_indices).all()
            assert (got.point_indices == scalar.point_indices).all()
            assert got.centroid == scalar.centroid
            assert got.kind == "Wall"


def _numpy_ccw(xyz, ang):
    """The exact numpy pass from TensorGeometry.ccw_sort (post-arctan2)."""
    F, n = xyz.shape[:2]
    order = np.argsort(ang, axis=1, kind="stable")
    y_sorted = np.take_along_axis(xyz[:, :, 1], order, axis=1)
    start = n - 1 - np.argmax(y_sorted[:, ::-1], axis=1)  # last max
    roll = (np.arange(n)[None, :] + start[:, None]) % n
    order = np.take_along_axis(order, roll, axis=1)
    return np.take_along_axis(xyz, order[:, :, None], axis=1), order


class TestNativeCcwSort:
    """mm_ccw_sort must replicate the numpy stable argsort + last-max-Y
    roll + gather bit for bit, including angle ties (duplicate points keep
    numpy's stable input order) and duplicated maximum y values."""

    @pytest.mark.parametrize("seed,F,N", [(0, 1, 3), (3, 9, 64), (4, 41, 501)])
    def test_bit_identical_random(self, seed, F, N):
        rng = np.random.default_rng(seed)
        xyz = np.ascontiguousarray(rng.uniform(-5.0, 5.0, (F, N, 3)))
        ang = np.arctan2(
            xyz[:, :, 1] - xyz[:, :, 1].mean(axis=1)[:, None],
            xyz[:, :, 0] - xyz[:, :, 0].mean(axis=1)[:, None],
        )
        res = native.ccw_sort_native(xyz, np.ascontiguousarray(ang))
        assert res is not None
        ref, ref_order = _numpy_ccw(xyz, ang)
        out, order = res
        assert (order == ref_order).all()
        assert (out == ref).all()

    def test_ties_match_numpy_stable_order(self):
        # duplicate points (equal angles) and a duplicated max-y: the native
        # stable sort must keep input order on ties and the roll must pick
        # the LAST highest-y point, exactly like the numpy expressions
        rng = np.random.default_rng(7)
        F, N = 4, 24
        xyz = np.ascontiguousarray(rng.uniform(-2.0, 2.0, (F, N, 3)))
        xyz[:, 5] = xyz[:, 11]          # duplicate point -> angle tie
        xyz[:, 17] = xyz[:, 2]
        ymax = xyz[:, :, 1].max(axis=1)
        xyz[:, 9, 1] = ymax             # duplicated maximum y
        xyz = np.ascontiguousarray(xyz)
        ang = np.arctan2(
            xyz[:, :, 1] - xyz[:, :, 1].mean(axis=1)[:, None],
            xyz[:, :, 0] - xyz[:, :, 0].mean(axis=1)[:, None],
        )
        res = native.ccw_sort_native(xyz, np.ascontiguousarray(ang))
        assert res is not None
        ref, ref_order = _numpy_ccw(xyz, ang)
        out, order = res
        assert (order == ref_order).all()
        assert (out == ref).all()

    def test_tensor_ccw_sort_native_vs_numpy(self, monkeypatch):
        # end to end through TensorGeometry.ccw_sort: the native path and
        # the numpy fallback must produce identical coords and metadata
        from multimodars_tpu.models import tensor as tmod

        def make():
            rng = np.random.default_rng(11)
            F, N = 6, 33
            coords = np.ascontiguousarray(rng.uniform(-4.0, 4.0, (F, N, 3)))
            return tmod.TensorGeometry(
                label="t",
                kinds=["Lumen"],
                coords={"Lumen": coords.copy()},
                present={"Lumen": np.ones(F, dtype=bool)},
                pt_frame={"Lumen": np.repeat(np.arange(F), N).reshape(F, N)},
                pt_index={"Lumen": np.tile(np.arange(N), (F, 1))},
                pt_aortic={"Lumen": rng.random((F, N)) < 0.3},
                con_centroid={"Lumen": coords.mean(axis=1)},
                aortic_th={"Lumen": np.full(F, np.nan)},
                pulm_th={"Lumen": np.full(F, np.nan)},
                ids=np.arange(F, dtype=np.int64),
                orig_frame=np.arange(F, dtype=np.int64),
                centroids=coords.mean(axis=1),
            )

        tg_native = make()
        tg_native.ccw_sort()
        tg_numpy = make()
        monkeypatch.setattr(native, "ccw_sort_native", lambda *a: None)
        tg_numpy.ccw_sort()
        assert (tg_native.coords["Lumen"] == tg_numpy.coords["Lumen"]).all()
        assert (tg_native.pt_frame["Lumen"] == tg_numpy.pt_frame["Lumen"]).all()
        assert (tg_native.pt_index["Lumen"] == tg_numpy.pt_index["Lumen"]).all()
        assert (
            tg_native.pt_aortic["Lumen"] == tg_numpy.pt_aortic["Lumen"]
        ).all()
