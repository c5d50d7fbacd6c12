"""Randomized cross-path exactness fuzz for the CCTA counting kernels.

Every counting path — the public host path (`count_within_radius`), the
device-resident wave path (`count_pairs_resident`), the whole-cloud
bounded-mask path, and the row-sharded multi-chip path — must agree with
a brute-force component-form f64 count on every input, including
boundary-exact lattices where pairs sit AT the radius (the certification
band's worst case).  Complements the targeted parity tests in
test_ccta.py with breadth across random scales/offsets/duplicates.
"""

import numpy as np
import pytest

from multimodars_tpu.ccta.kernels import (
    DeviceVerts,
    bounded_masks_resident,
    count_pairs_resident,
    count_within_radius,
)


def _brute(a, b, r):
    """Component-form f64 oracle: ((a-b)^2).sum() <= r^2 inclusive."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros(len(a), dtype=np.int64)
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return (d2 <= r * r).sum(axis=1).astype(np.int64)


def _case(seed):
    """Random cloud pair: clustered blobs + a shell of boundary-exact
    points (integer lattice scaled so distances hit the radius exactly)."""
    rng = np.random.default_rng(seed)
    scale = float(rng.choice([0.05, 1.0, 40.0]))
    offset = rng.normal(scale=rng.choice([0.0, 5.0, 300.0]), size=3)
    n_a, n_b = int(rng.integers(200, 1200)), int(rng.integers(100, 800))
    a = rng.normal(size=(n_a, 3)) * scale + offset
    b = rng.normal(size=(n_b, 3)) * scale + offset
    # duplicates on both sides (merged-vertex analog)
    a[rng.integers(0, n_a, 20)] = a[rng.integers(0, n_a, 20)]
    b[: 10] = a[: 10]
    radius = float(rng.uniform(0.3, 2.0)) * scale
    # boundary-exact block: axis-aligned pairs at EXACTLY the radius
    k = 24
    base = offset + scale * rng.integers(-3, 3, size=(k, 3)).astype(float)
    a = np.concatenate([a, base])
    b = np.concatenate([b, base + np.eye(3)[rng.integers(0, 3, k)] * radius])
    return a, b, radius


@pytest.mark.parametrize("seed", range(8))
def test_host_path_matches_component_oracle(seed):
    a, b, r = _case(seed)
    got = count_within_radius(a, b, r)
    want = _brute(a, b, r)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_resident_paths_match_component_oracle(seed, monkeypatch):
    monkeypatch.setenv("MMTPU_CCTA_RESIDENT", "1")
    a, b, r = _case(seed)
    verts = np.concatenate([a, b])
    dv = DeviceVerts(verts)
    ai = np.arange(len(a))
    bi = np.arange(len(a), len(verts))
    # index b side AND explicit-coordinate b side
    (got_idx,) = count_pairs_resident(dv, [(ai, bi)], r)
    (got_xyz,) = count_pairs_resident(dv, [(ai, np.ascontiguousarray(b))], r)
    want = _brute(a, b, r)
    np.testing.assert_array_equal(got_idx, want)
    np.testing.assert_array_equal(got_xyz, want)


@pytest.mark.parametrize("seed", range(4))
def test_bounded_mask_matches_component_oracle(seed, monkeypatch):
    from multimodars import numpy_to_centerline

    monkeypatch.setenv("MMTPU_CCTA_RESIDENT", "1")
    a, b, r = _case(seed + 100)
    cl = numpy_to_centerline(np.ascontiguousarray(b[:64]))
    dv = DeviceVerts(a)
    (mask,) = bounded_masks_resident(dv, [cl], r)
    want = _brute(a, cl.positions(), r) > 0
    np.testing.assert_array_equal(mask, want)


@pytest.mark.parametrize("seed", range(4))
def test_sharded_count_matches_component_oracle(seed):
    import jax

    from multimodars_tpu.parallel.ccta_shard import (
        rows_mesh,
        sharded_count_within_radius,
    )

    a, b, r = _case(seed + 200)
    mesh = rows_mesh(jax.devices()[:1])
    got = sharded_count_within_radius(a, b, r, mesh=mesh)
    np.testing.assert_array_equal(got, _brute(a, b, r))
