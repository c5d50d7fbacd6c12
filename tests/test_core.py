"""Core data-model tests mirroring the reference's tests/test_core.py and
the Rust unit tests in contour.rs / geometry.rs."""

import math

import numpy as np
import pytest

from multimodars_tpu import PyContour, PyContourPoint, PyContourType


def circle_contour(n=16, r=2.0, cx=0.0, cy=0.0, z=0.0):
    pts = [
        PyContourPoint(
            0, i, cx + r * math.cos(2 * math.pi * i / n), cy + r * math.sin(2 * math.pi * i / n), z, False
        )
        for i in range(n)
    ]
    c = PyContour(0, 0, pts, (cx, cy, z), None, None, "Lumen")
    c.compute_centroid()
    return c


def test_point_distance():
    p1 = PyContourPoint(1, 0, 0.0, 0.0, 0.0, False)
    p2 = PyContourPoint(1, 1, 3.0, 4.0, 0.0, False)
    assert abs(p1.distance(p2) - 5.0) < 1e-12


def test_point_rotate():
    p = PyContourPoint(1, 0, 1.0, 0.0, 0.0, False)
    r = p.rotate(math.pi / 2, (0.0, 0.0))
    assert abs(r.x) < 1e-12 and abs(r.y - 1.0) < 1e-12


def test_contour_centroid_and_area():
    c = circle_contour(n=256, r=2.0)
    assert np.allclose(c.centroid[:2], (0.0, 0.0), atol=1e-12)
    # regular polygon area -> pi r^2 as n grows
    assert abs(c.get_area() - math.pi * 4.0) < 0.01


def test_square_area():
    pts = [(0, 0), (2, 0), (2, 2), (0, 2)]
    c = PyContour(
        0, 0, [PyContourPoint(0, i, x, y, 0.0, False) for i, (x, y) in enumerate(pts)],
        (1, 1, 0), None, None, "Lumen",
    )
    assert abs(c.get_area() - 4.0) < 1e-12


def test_farthest_and_opposite():
    c = circle_contour(n=64, r=3.0)
    (_, _), dist = c.find_farthest_points()
    assert abs(dist - 6.0) < 0.02
    (_, _), min_d = c.find_closest_opposite()
    assert abs(min_d - 6.0) < 0.05  # circle: all opposite chords equal
    assert abs(c.get_elliptic_ratio() - 1.0) < 0.01


def test_elliptic_ratio_of_ellipse():
    n = 128
    pts = [
        PyContourPoint(
            0, i, 4.0 * math.cos(2 * math.pi * i / n), 1.0 * math.sin(2 * math.pi * i / n), 0.0, False
        )
        for i in range(n)
    ]
    c = PyContour(0, 0, pts, (0, 0, 0), None, None, "Lumen")
    c.compute_centroid()
    assert c.get_elliptic_ratio() > 3.5


def test_rotate_round_trip():
    c = circle_contour(n=32, r=1.5, cx=2.0, cy=3.0)
    r = c.rotate(37.0).rotate(-37.0)
    np.testing.assert_allclose(r.xyz(), c.xyz(), atol=1e-12)


def test_translate():
    c = circle_contour()
    t = c.translate(1.0, -2.0, 0.5)
    np.testing.assert_allclose(t.xyz(), c.xyz() + np.array([1.0, -2.0, 0.5]), atol=1e-12)


def test_sort_contour_points_highest_y_first():
    c = circle_contour(n=16, r=2.0)
    # scramble
    import random

    rng = random.Random(0)
    rng.shuffle(c.points)
    s = c.sort_contour_points()
    ys = [p.y for p in s.points]
    assert ys[0] == max(ys)
    assert [p.point_index for p in s.points] == list(range(16))
    # counterclockwise: consecutive angles increase (mod 2pi)
    ang = np.unwrap([math.atan2(p.y, p.x) for p in s.points])
    assert np.all(np.diff(ang) > 0) or np.all(np.diff(ang) < 0)


def test_contour_type_enum():
    assert PyContourType.Lumen.name == "Lumen"
    assert PyContourType.from_string("calcification") is PyContourType.Calcification
    assert len(PyContourType.all_types()) == 6
    with pytest.raises(ValueError):
        PyContourType.from_string("bogus")


def test_downsample():
    from multimodars_tpu.models import downsample_contour_points

    pts = [PyContourPoint(0, i, float(i), 0, 0, False) for i in range(10)]
    ds = downsample_contour_points(pts, 4)
    assert [p.x for p in ds] == [0.0, 2.0, 5.0, 7.0]
    assert len(downsample_contour_points(pts, 20)) == 10


def test_trace_spans_and_summary():
    """utils.trace: spans accumulate, dump renders, disabled by default."""
    import io

    from multimodars_tpu.utils import trace as T

    T.reset()
    assert not T.is_enabled() or True  # env-dependent default
    with T.span("unit.stage"):
        pass

    @T.trace("unit.fn")
    def f(x):
        return x + 1

    assert f(1) == 2
    s = T.summary()
    assert s["unit.stage"][1] == 1
    assert s["unit.fn"][1] == 1
    buf = io.StringIO()
    T.dump(buf)
    assert "unit.fn" in buf.getvalue()
    T.reset()
    assert T.summary() == {}


class TestEdgeCases:
    """Property-ish edge cases mirrored from the reference suite
    (SURVEY §4: empty sets, <3 points, zero/negative step)."""

    def test_hausdorff_empty_sets_zero(self):
        import jax.numpy as jnp

        from multimodars_tpu.ops.hausdorff import hausdorff_distance_masked

        a = jnp.zeros((1, 4, 2))
        b = jnp.zeros((1, 4, 2))
        empty = jnp.zeros((1, 4), dtype=bool)
        full = jnp.ones((1, 4), dtype=bool)
        # reference: directed hausdorff of an empty set is 0.0
        assert float(hausdorff_distance_masked(a, b, empty, empty)[0]) == 0.0
        assert float(hausdorff_distance_masked(a, b, empty, full)[0]) == 0.0

    def test_search_zero_step_returns_center(self):
        import jax.numpy as jnp
        import numpy as np

        from multimodars_tpu.ops.rotation_search import search_range_batched

        test = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 2)))
        mask = jnp.ones((2, 8), dtype=bool)
        centers = jnp.asarray([0.3, -0.2])
        out, _tie = search_range_batched(test, test, mask, mask, 0.0, 5.0, centers, 10.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(centers))

    def test_contour_minimum_points(self):
        import numpy as np
        import pytest as _pytest

        from multimodars_tpu.models.contour import (
            closest_opposite,
            elliptic_ratio,
            farthest_pair,
        )

        two = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        i, j, d = farthest_pair(two)
        assert (i, j) == (0, 1) and abs(d - 1.0) < 1e-12
        with _pytest.raises(AssertionError):
            closest_opposite(two)
        one = np.array([[0.0, 0.0, 0.0]])
        assert farthest_pair(one) == (0, 0, 0.0)

    def test_degenerate_angle_grid_clamped(self):
        import jax.numpy as jnp
        import numpy as np

        from multimodars_tpu.ops.rotation_search import candidate_angles

        # center far outside a tiny limes -> the clamped window inverts and
        # the search falls back to the clamped start angle, matching the
        # reference's clamp (process_utils.rs:33-75)
        from multimodars_tpu.ops.rotation_search import search_range_batched

        test = jnp.zeros((1, 4, 2))
        mask = jnp.ones((1, 4), dtype=bool)
        out, _tie = search_range_batched(
            test, test, mask, mask, 1.0, 5.0, jnp.asarray([np.pi]), 0.001
        )
        clamped_start = max(np.pi - np.radians(5.0), -np.radians(0.001))
        np.testing.assert_allclose(np.asarray(out), [clamped_start])

        # collapsed-but-not-inverted window (stop == start) still evaluates
        # its single grid point instead of passing the center through
        out, _tie = search_range_batched(
            test, test, mask, mask, 1.0, 5.0, jnp.asarray([0.0]), 0.0
        )
        np.testing.assert_allclose(np.asarray(out), [0.0])


def test_downsample_stride_pattern():
    """Parity: contour.rs test_downsample_geometry — n=3 of 5 picks indices
    0,2,4 (floor(i*m/n)); n >= m keeps everything in order."""
    from multimodars_tpu.models import downsample_contour_points
    from multimodars_tpu.models.point import PyContourPoint

    # 6 points -> 3: step 2, indices 0,2,4 (the reference's dummy fixture)
    pts6 = [PyContourPoint(0, i, float(i), 0.0, 0.0, False) for i in range(6)]
    assert [p.point_index for p in downsample_contour_points(pts6, 3)] == [0, 2, 4]
    # 5 points -> 3: step 5/3, floor(i*step) = 0,1,3
    pts5 = [PyContourPoint(0, i, float(i), 0.0, 0.0, False) for i in range(5)]
    assert [p.point_index for p in downsample_contour_points(pts5, 3)] == [0, 1, 3]
    # n >= m keeps everything in order
    assert [p.point_index for p in downsample_contour_points(pts5, 6)] == [0, 1, 2, 3, 4]


def test_downsample_edge_cases():
    """Parity: contour.rs test_downsample_edge_cases — n equal to m, and
    empty inputs."""
    from multimodars_tpu.models import downsample_contour_points
    from multimodars_tpu.models.point import PyContourPoint

    pts = [PyContourPoint(0, i, float(i), 0.0, 0.0, False) for i in range(2)]
    assert [p.point_index for p in downsample_contour_points(pts, 2)] == [0, 1]
    assert len(downsample_contour_points([], 3)) == 0
    assert len(downsample_contour_points([], 0)) == 0


# --- frame-level transform tests (ported from frame.rs frame_tests) --------

def _contour(pts_xy, z=0.0, cid=1, kind="Lumen", frame_index=1):
    from multimodars_tpu.models.frame import PyFrame  # noqa: F401  (import check)

    pts = [
        PyContourPoint(frame_index, i, x, y, z, False)
        for i, (x, y) in enumerate(pts_xy)
    ]
    c = PyContour(cid, frame_index, pts, (0.0, 0.0, z), None, None, kind)
    c.compute_centroid()
    return c


def _diamond_frame(with_eem=False, with_ref=False):
    """Lumen diamond around (1,1) like frame.rs:213-330; optional eem
    diamond around (2,2) and reference point."""
    from multimodars_tpu.models.frame import PyFrame

    lumen = _contour([(0.0, 2.0), (2.0, 0.0), (4.0, 2.0), (2.0, 4.0)])
    extras = {}
    if with_eem:
        extras["Eem"] = _contour(
            [(-1.0, 2.0), (2.0, 5.0), (5.0, 2.0), (0.0, -1.0)], cid=2, kind="Eem",
            frame_index=2,
        )
    ref = PyContourPoint(1, 0, 0.5, 0.5, 0.0, False) if with_ref else None
    return PyFrame(1, (1.0, 1.0, 0.0), lumen, extras, ref)


def test_frame_rotate_with_eem_90deg():
    """Parity: frame.rs test_frame_rotate_with_eem_90deg — lumen AND eem
    rotate together about the frame centroid."""
    frame = _diamond_frame(with_eem=True)
    # reference lumen starts at (0,2),(2,0),(4,2),(2,4) but the rs test's
    # expectations are for lumen (0,2),(2,0),(4,2),(2,4) rotated about (1,1):
    frame.rotate_inplace(math.pi / 2.0, (1.0, 1.0))
    expected_lumen = [(0.0, 0.0), (2.0, 2.0), (0.0, 4.0), (-2.0, 2.0)]
    # rs ordering differs (its lumen is (0,2),(2,0)...); assert as sets
    got_lumen = {(round(p.x, 6), round(p.y, 6)) for p in frame.lumen.points}
    assert got_lumen == {(round(x, 6), round(y, 6)) for x, y in expected_lumen}
    expected_eem = [(0.0, -1.0), (-3.0, 2.0), (0.0, 5.0), (3.0, 0.0)]
    got_eem = {(round(p.x, 6), round(p.y, 6)) for p in frame.extras["Eem"].points}
    assert got_eem == {(round(x, 6), round(y, 6)) for x, y in expected_eem}


def test_frame_rotate_back_and_forth_restores_reference():
    """Rotating +theta then -theta restores lumen, eem and reference point
    (frame.rs:393-445)."""
    frame = _diamond_frame(with_eem=True, with_ref=True)
    orig = [(p.x, p.y) for p in frame.lumen.points]
    orig_eem = [(p.x, p.y) for p in frame.extras["Eem"].points]
    orig_ref = (frame.reference_point.x, frame.reference_point.y)
    frame.rotate_inplace(0.7, (1.0, 1.0))
    frame.rotate_inplace(-0.7, (1.0, 1.0))
    for p, (ox, oy) in zip(frame.lumen.points, orig):
        assert abs(p.x - ox) < 1e-9 and abs(p.y - oy) < 1e-9
    for p, (ox, oy) in zip(frame.extras["Eem"].points, orig_eem):
        assert abs(p.x - ox) < 1e-9 and abs(p.y - oy) < 1e-9
    assert abs(frame.reference_point.x - orig_ref[0]) < 1e-9
    assert abs(frame.reference_point.y - orig_ref[1]) < 1e-9


def test_frame_rotate_around_external_point():
    """180-degree rotation around (1,1) maps (x,y) to (2-x,2-y)
    (frame.rs test_frame_rotate_around_point)."""
    frame = _diamond_frame()
    originals = [(p.x, p.y) for p in frame.lumen.points]
    frame.rotate_inplace(math.pi, (1.0, 1.0))
    for p, (ox, oy) in zip(frame.lumen.points, originals):
        assert abs(p.x - (2.0 - ox)) < 1e-6
        assert abs(p.y - (2.0 - oy)) < 1e-6
    assert abs(frame.centroid[0] - 1.0) < 1e-9  # centroid (1,1) is fixed


def test_frame_translate_with_eem_and_reference():
    """Translate moves lumen, eem, reference point and frame centroid
    (frame.rs test_frame_translate_with_eem_and_reference)."""
    frame = _diamond_frame(with_eem=True, with_ref=True)
    out = frame.translate(1.0, 2.0, 3.0)
    assert out.centroid == (2.0, 3.0, 3.0)
    for p, q in zip(out.lumen.points, frame.lumen.points):
        assert (p.x, p.y, p.z) == (q.x + 1.0, q.y + 2.0, q.z + 3.0)
    for p, q in zip(out.extras["Eem"].points, frame.extras["Eem"].points):
        assert (p.x, p.y, p.z) == (q.x + 1.0, q.y + 2.0, q.z + 3.0)
    rp = out.reference_point
    assert (rp.x, rp.y, rp.z) == (1.5, 2.5, 3.0)
    # original untouched (translate is a copy)
    assert frame.centroid == (1.0, 1.0, 0.0)


def test_create_catheter_points_circle():
    """20 catheter points on a radius-0.5 circle at the frame z
    (frame.rs test_create_catheter_points)."""
    from multimodars_tpu.models.frame import create_catheter_points

    pts = [PyContourPoint(1, 0, 1.0, 2.0, 5.0, False)]
    catheter = create_catheter_points(pts, (4.5, 4.5), 0.5, 20)
    assert len(catheter) == 20
    for p in catheter:
        assert p.frame_index == 1
        assert p.z == 5.0
        dist = math.hypot(p.x - 4.5, p.y - 4.5)
        assert abs(dist - 0.5) < 1e-6


def test_frame_set_value_updates_all_targets():
    """set_value propagates id / centroid / z to lumen, extras and the
    reference point (frame.rs test_frame_set_value_updates_all_targets)."""
    frame = _diamond_frame(with_eem=True, with_ref=True)
    frame.set_value(id=7, centroid=(9.0, 9.0, 9.0), z_value=4.0)
    assert frame.id == 7
    assert frame.lumen.id == 7 and frame.extras["Eem"].id == 7
    assert frame.centroid == (9.0, 9.0, 4.0)
    assert frame.lumen.centroid == (9.0, 9.0, 4.0)
    assert all(p.z == 4.0 for p in frame.lumen.points)
    assert all(p.z == 4.0 for p in frame.extras["Eem"].points)
    assert frame.reference_point.z == 4.0


# --- geometry frame-index bookkeeping (ported from geometry.rs) ------------

def _meta_frame(fid, original_frame, z, with_ref=False):
    from multimodars_tpu.models.frame import PyFrame

    lumen = PyContour(fid, original_frame, [], (0.0, 0.0, z), None, None, "Lumen")
    ref = (
        PyContourPoint(original_frame, 2, 1.0, 3.0, 2.0, False)
        if with_ref
        else None
    )
    return PyFrame(fid, (1.0, 1.0, z), lumen, {}, ref)


def test_geometry_idx_and_ensure_proximal_at_zero():
    """Parity: geometry.rs test_geometry_idx_and_ensure — proximal end is
    the max-z frame; ensure_proximal_at_position_zero reverses frames and
    renumbers z while the reference frame keeps its original_frame."""
    from multimodars_tpu.models.geometry import PyGeometry

    geom = PyGeometry(
        [
            _meta_frame(0, 621, 0.0),
            _meta_frame(1, 678, 1.0, with_ref=True),
            _meta_frame(2, 717, 2.0),
        ],
        "test",
    )
    prox = geom.find_proximal_end_idx()
    ref = geom.find_ref_frame_idx()
    assert prox == 2 and geom.frames[prox].lumen.original_frame == 717
    assert geom.frames[prox].centroid[2] == 2.0
    assert ref == 1 and geom.frames[ref].lumen.original_frame == 678
    assert geom.frames[ref].centroid[2] == 1.0

    geom.ensure_proximal_at_position_zero()
    prox = geom.find_proximal_end_idx()
    ref = geom.find_ref_frame_idx()
    assert prox == 0 and geom.frames[prox].lumen.original_frame == 717
    assert geom.frames[prox].centroid[2] == 0.0
    assert ref == 1 and geom.frames[ref].lumen.original_frame == 678
    assert geom.frames[ref].centroid[2] == 1.0


def test_reorder_geometry_by_records():
    """Parity: geometry.rs test_reorder_geometry — frames permute into
    record order (unknown record frames ignored), ids and z renumber in
    place, and the reference point follows its frame."""
    from multimodars_tpu.models.geometry import PyGeometry
    from multimodars_tpu.models.record import PyRecord

    geom = PyGeometry(
        [
            _meta_frame(0, 621, 0.0),
            _meta_frame(1, 678, 1.0, with_ref=True),
            _meta_frame(2, 717, 2.0),
        ],
        "test",
    )
    records = [
        PyRecord(678, "S", 1.1, 2.3),
        PyRecord(717, "S", 1.2, None),
        PyRecord(621, "S", None, None),
        PyRecord(999, "D", 1.5, 2.1),
    ]
    geom.reorder_frames(records, False)
    assert [f.lumen.original_frame for f in geom.frames] == [678, 717, 621]
    assert [f.id for f in geom.frames] == [0, 1, 2]
    assert [f.lumen.id for f in geom.frames] == [0, 1, 2]
    assert [f.centroid[2] for f in geom.frames] == [0.0, 1.0, 2.0]
    assert geom.frames[0].reference_point is not None
    assert geom.frames[0].reference_point.z == 0.0
