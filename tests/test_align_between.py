"""Inter-pullback alignment tests mirroring align_between.rs unit tests."""

import math
from pathlib import Path

import pytest

from multimodars_tpu.pipelines.align_between import (
    align_between_geometries,
    rotate_geometry_around_point,
)

FIXTURES = Path(__file__).resolve().parent / "data" / "fixtures"


def test_align_between_simple_geometries(dummy_geom_aligned_long):
    """Parity: align_between.rs test_align_between_simple_geometries —
    a 15 deg-rotated copy is recovered to within 1e-6."""
    geom_a = dummy_geom_aligned_long
    geom_b = geom_a.copy()
    geom_b.rotate_geometry(math.radians(15.0))

    pair = align_between_geometries(geom_a, geom_b, 30.0, 0.01, 6, verbose=False)

    for frame_a, frame_b in zip(pair.geom_a.frames, pair.geom_b.frames):
        assert abs(frame_a.centroid[2] - frame_b.centroid[2]) < 1e-6
        for pa, pb in zip(frame_a.lumen.points, frame_b.lumen.points):
            assert abs(pa.x - pb.x) < 1e-6
            assert abs(pa.y - pb.y) < 1e-6
            assert abs(pa.z - pb.z) < 1e-6


@pytest.mark.skipif(not FIXTURES.exists(), reason="fixtures not mounted")
def test_align_between_idealized():
    """Parity: align_between.rs test_align_between_optimized_geometries —
    rotate a realistic aligned geometry by 15 deg and recover it to <0.01 mm
    max error."""
    from multimodars_tpu.io import build_geometry_from_inputdata
    from multimodars_tpu.pipelines.align_within import align_frames_in_geometry

    geometry = build_geometry_from_inputdata(
        None, FIXTURES / "idealized_geometry", "stress", True, (4.5, 4.5), 0.5, 20,
        verbose=False,
    )
    geom, _, _ = align_frames_in_geometry(
        geometry, 0.01, 45.0, smooth=True, bruteforce=False, sample_size=200,
        verbose=False,
    )
    geom_a = geom.copy()
    geom_b = geom.copy()
    ref_idx_b = geom_b.find_proximal_end_idx()
    ref_centroid = geom_b.frames[ref_idx_b].centroid
    rotate_geometry_around_point(geom_b, math.radians(15.0), ref_centroid)

    pair = align_between_geometries(geom_a, geom_b, 30.0, 0.01, 500, verbose=False)

    max_error = 0.0
    total_error = 0.0
    count = 0
    for frame_a, frame_b in zip(pair.geom_a.frames, pair.geom_b.frames):
        assert abs(frame_a.centroid[2] - frame_b.centroid[2]) < 1e-4
        assert len(frame_a.lumen.points) == len(frame_b.lumen.points)
        for pa, pb in zip(frame_a.lumen.points, frame_b.lumen.points):
            ex = abs(pa.x - pb.x)
            ey = abs(pa.y - pb.y)
            max_error = max(max_error, ex, ey)
            total_error += ex + ey
            count += 2
    assert max_error < 0.01, f"Maximum alignment error {max_error}"
    assert total_error / count < 0.001


def test_batched_matches_single(dummy_geom_aligned_long):
    """align_between_geometries_batch on two independent pairs gives the
    same result as two sequential single-pair calls."""
    from multimodars_tpu.pipelines.align_between import (
        align_between_geometries_batch,
    )

    base = dummy_geom_aligned_long

    def make_pair(angle_deg):
        a = base.copy()
        b = base.copy()
        b.rotate_geometry(math.radians(angle_deg))
        return a, b

    singles = []
    for angle in (15.0, -11.0):
        a, b = make_pair(angle)
        singles.append(align_between_geometries(a, b, 30.0, 0.1, 6, verbose=False))

    pairs = [make_pair(15.0), make_pair(-11.0)]
    batched = align_between_geometries_batch(pairs, 30.0, 0.1, 6, verbose=False)

    for single, batch in zip(singles, batched):
        for fs, fb in zip(single.geom_b.frames, batch.geom_b.frames):
            assert abs(fs.centroid[0] - fb.centroid[0]) < 1e-12
            assert abs(fs.centroid[1] - fb.centroid[1]) < 1e-12
            import numpy as np

            np.testing.assert_allclose(
                fs.lumen.xyz_view(), fb.lumen.xyz_view(), atol=1e-12
            )


def test_fused_epilogue_bitwise_matches_sequential(dummy_geom_aligned_long):
    """The one-pass block epilogue (pre_translated=False) produces bitwise
    the coordinates, centroids and reference points of the sequential
    translate -> rotate -> exact re-translate passes."""
    import numpy as np

    from multimodars_tpu.models.geometry import shared_contour_blocks
    from multimodars_tpu.models.tensor import geometry_to_tensor
    from multimodars_tpu.pipelines.align_between import apply_between_epilogue

    geom_a = dummy_geom_aligned_long.copy()
    # block-backed twin (tensor materialisation) and plain object twin
    blocky = geometry_to_tensor(dummy_geom_aligned_long).to_geometry()
    plain = dummy_geom_aligned_long.copy()
    assert shared_contour_blocks(blocky.frames) is not None
    assert shared_contour_blocks(plain.frames) is None

    args = dict(
        best_rotation=math.radians(7.3),
        ref_a_centroid=geom_a.frames[geom_a.ref_or_proximal_idx()].centroid,
        initial_translation=(0.25, -1.5, 0.75),
        rot_deg=30.0,
        step_rot_deg=0.5,
        verbose=False,
        pre_translated=False,
    )
    apply_between_epilogue(geom_a, blocky, **args)
    apply_between_epilogue(geom_a, plain, **args)

    for fb, fp in zip(blocky.frames, plain.frames):
        assert fb.centroid == fp.centroid
        assert np.array_equal(fb.lumen.xyz_view(), fp.lumen.xyz_view())
        assert fb.lumen.centroid == fp.lumen.centroid
        for k in fb.extras:
            assert np.array_equal(fb.extras[k].xyz_view(), fp.extras[k].xyz_view())
            assert fb.extras[k].centroid == fp.extras[k].centroid
        if fb.reference_point is not None:
            assert (fb.reference_point.x, fb.reference_point.y, fb.reference_point.z) == (
                fp.reference_point.x, fp.reference_point.y, fp.reference_point.z,
            )
