"""Pallas rotation-sweep kernel: parity with the XLA cost table
(interpret mode, so it runs on the CPU test backend)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from multimodars_tpu.ops.pallas_kernels import (  # noqa: E402
    PALLAS_AVAILABLE,
    rotation_cost_table_pallas,
)
from multimodars_tpu.ops.rotation_search import (  # noqa: E402
    candidate_angles,
    rotation_cost_table,
)

pytestmark = pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")


def _case(F, N, M, n_invalid_t=0, n_invalid_r=0, seed=0):
    rng = np.random.default_rng(seed)
    test = rng.standard_normal((F, N, 2))
    ref = rng.standard_normal((F, M, 2))
    tmask = np.ones((F, N), bool)
    rmask = np.ones((F, M), bool)
    if n_invalid_t:
        tmask[:, -n_invalid_t:] = False
    if n_invalid_r:
        rmask[:, -n_invalid_r:] = False
    return (
        jnp.asarray(test),
        jnp.asarray(ref),
        jnp.asarray(tmask),
        jnp.asarray(rmask),
    )


@pytest.mark.parametrize("invalid", [(0, 0), (5, 7)])
def test_cost_table_parity(invalid):
    test, ref, tmask, rmask = _case(3, 50, 60, *invalid)
    centers = jnp.zeros((3,))
    angles, valid = candidate_angles(centers, 1.0, 10.0, 10.0)
    c_ref = np.asarray(rotation_cost_table(test, ref, tmask, rmask, angles, valid))
    c_pal = np.asarray(
        rotation_cost_table_pallas(test, ref, tmask, rmask, angles, valid, interpret=True)
    )
    finite = np.isfinite(c_ref)
    assert (np.isfinite(c_pal) == finite).all()
    np.testing.assert_allclose(c_pal[finite], c_ref[finite], rtol=1e-10, atol=1e-12)
    assert (c_ref.argmin(axis=1) == c_pal.argmin(axis=1)).all()


def test_clamped_grid_parity():
    """Stage grids whose centers are clamped by the limes."""
    test, ref, tmask, rmask = _case(2, 30, 30)
    centers = jnp.asarray([0.15, -0.15])  # near the limes of 10 deg
    angles, valid = candidate_angles(centers, 0.5, 5.0, 10.0)
    c_ref = np.asarray(rotation_cost_table(test, ref, tmask, rmask, angles, valid))
    c_pal = np.asarray(
        rotation_cost_table_pallas(test, ref, tmask, rmask, angles, valid, interpret=True)
    )
    finite = np.isfinite(c_ref)
    np.testing.assert_allclose(c_pal[finite], c_ref[finite], rtol=1e-10, atol=1e-12)
