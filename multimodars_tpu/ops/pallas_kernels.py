"""Fused TPU kernels (Pallas) for the registration hot loop.

The rotation search evaluates, for every (frame pair, candidate angle), a
masked symmetric Hausdorff between a rotated test set and a reference set.
Rotations are rigid, so the squared distance decomposes as

    d2(R(th) t_i, r_j) = C_ij - 2 (cos(th) A_ij + sin(th) B_ij)

with A = <t_i, r_j>, B = <t_i^perp, r_j>, C = |t_i|^2 + |r_j|^2 — all
angle-independent.  The kernel computes A/B/C once per frame pair, keeps
them resident in VMEM, and sweeps the whole angle grid with two fused
multiply-adds plus min/max reductions per element — HBM traffic is one read
of the point sets per frame instead of one [N, M] tile per angle.

Masking uses +inf folded into C for invalid reference columns and -inf/+inf
guard vectors so padded slots can never win a reduction (matching
ops.hausdorff.hausdorff_sq_masked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sweep_kernel(
    tx_ref, ty_ref, rx_ref, ry_ref,
    row_guard_ref, col_inf_ref, col_guard_ref,
    angles_ref, penalty_ref,
    out_ref,
    a_scr, b_scr, c_scr,
):
    tx = tx_ref[0, 0, :]
    ty = ty_ref[0, 0, :]
    rx = rx_ref[0, 0, :]
    ry = ry_ref[0, 0, :]
    row_guard = row_guard_ref[0, 0, :]  # 0 valid / -inf invalid rows
    col_inf = col_inf_ref[0, 0, :]  # 0 valid / +inf invalid cols
    col_guard = col_guard_ref[0, 0, :]  # 0 valid / -inf invalid cols

    # angle-independent decomposition, resident in VMEM for the whole sweep
    a_scr[:, :] = tx[:, None] * rx[None, :] + ty[:, None] * ry[None, :]
    b_scr[:, :] = tx[:, None] * ry[None, :] - ty[:, None] * rx[None, :]
    c_scr[:, :] = (
        (tx * tx + ty * ty)[:, None]
        + (rx * rx + ry * ry)[None, :]
        + col_inf[None, :]
    )
    row_inf = -row_guard  # 0 valid / +inf invalid rows

    n_angles = out_ref.shape[2]
    lane_ids = lax.broadcasted_iota(jnp.int32, (1, 1, n_angles), 2)
    penalty = penalty_ref[0, :, :]

    neg_inf = jnp.asarray(-jnp.inf, out_ref.dtype)

    def body(k, _):
        theta = angles_ref[0, 0, k]
        cos_t = 2.0 * jnp.cos(theta)
        sin_t = 2.0 * jnp.sin(theta)
        d2 = c_scr[:, :] - cos_t * a_scr[:, :] - sin_t * b_scr[:, :]
        # forward: max over valid i of (min over valid j); selects (not
        # additive guards) so inf + -inf can never produce NaN
        fwd = jnp.max(jnp.where(row_guard == 0.0, jnp.min(d2, axis=1), neg_inf))
        # backward: max over valid j of (min over valid i)
        bwd = jnp.max(
            jnp.where(
                col_guard == 0.0,
                jnp.min(d2 + row_inf[:, None], axis=0),
                neg_inf,
            )
        )
        cost = jnp.maximum(fwd, bwd)
        # scalar stores to VMEM are unsupported: masked lane store instead
        pltpu.store(
            out_ref,
            jnp.full((1, 1, n_angles), cost, out_ref.dtype) + penalty[None],
            mask=lane_ids == k,
        )
        return 0

    lax.fori_loop(0, n_angles, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_call(tx, ty, rx, ry, row_guard, col_inf, col_guard, angles, penalty,
                interpret=False):
    F = tx.shape[0]
    N = tx.shape[2]
    M = rx.shape[2]
    K = angles.shape[2]
    dtype = tx.dtype

    def spec(last):
        return pl.BlockSpec((1, 1, last), lambda f: (f, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _sweep_kernel,
        grid=(F,),
        in_specs=[
            spec(N), spec(N), spec(M), spec(M),
            spec(N), spec(M), spec(M),
            spec(K), spec(K),
        ],
        out_specs=spec(K),
        out_shape=jax.ShapeDtypeStruct((F, 1, K), dtype),
        scratch_shapes=[
            pltpu.VMEM((N, M), dtype),
            pltpu.VMEM((N, M), dtype),
            pltpu.VMEM((N, M), dtype),
        ],
        interpret=interpret,
    )(tx, ty, rx, ry, row_guard, col_inf, col_guard, angles, penalty)


def rotation_cost_table_pallas(test, ref, test_mask, ref_mask, angles, angles_valid,
                               interpret: bool = False):
    """Drop-in replacement for ops.rotation_search.rotation_cost_table.

    test: [F, N, 2], ref: [F, M, 2] (centered), masks [F, N]/[F, M],
    angles/valid [F, K].  Returns squared-Hausdorff costs [F, K] (+inf at
    invalid slots).
    """
    F, N, _ = test.shape
    M = ref.shape[1]
    K = angles.shape[1]
    dtype = test.dtype
    inf = jnp.asarray(jnp.inf, dtype)

    n_pad = _round_up(max(N, 128), 128)
    m_pad = _round_up(max(M, 128), 128)
    k_pad = _round_up(max(K, 128), 128)

    def pad(x, target, value=0.0):
        return jnp.pad(
            x, ((0, 0), (0, target - x.shape[1])), constant_values=value
        )[:, None, :]

    tx = pad(test[..., 0], n_pad)
    ty = pad(test[..., 1], n_pad)
    rx = pad(ref[..., 0], m_pad)
    ry = pad(ref[..., 1], m_pad)

    row_guard = pad(jnp.where(test_mask, 0.0, -jnp.inf).astype(dtype), n_pad, -np.inf)
    col_inf = pad(jnp.where(ref_mask, 0.0, jnp.inf).astype(dtype), m_pad, np.inf)
    col_guard = pad(jnp.where(ref_mask, 0.0, -jnp.inf).astype(dtype), m_pad, -np.inf)
    angles_p = pad(angles.astype(dtype), k_pad)
    penalty = pad(jnp.where(angles_valid, 0.0, jnp.inf).astype(dtype), k_pad, np.inf)

    costs = _sweep_call(
        tx, ty, rx, ry, row_guard, col_inf, col_guard, angles_p, penalty,
        interpret=interpret,
    )
    return costs[:, 0, :K]
