"""Fused TPU kernels (Pallas) for the registration hot loop.

The rotation search evaluates, for every (frame pair, candidate angle), a
masked symmetric Hausdorff between a rotated test set and a reference set.
Rotations are rigid, so the squared distance decomposes as

    d2(R(th) t_i, r_j) = C_ij - 2 (cos(th) A_ij + sin(th) B_ij)

with A = <t_i, r_j>, B = <t_i^perp, r_j>, C = |t_i|^2 + |r_j|^2 -- all
angle-independent.

Grid layout: (frame pair, angle block, test-row chunk), row chunks
innermost.  Each program builds the A/B/C slabs for its 128-row chunk once
and combines them with its block of KB angles as two fused multiply-adds,
updating forward-max / backward-min accumulators held in VMEM scratch
(scratch persists across the sequential TPU grid).  The first row chunk
initialises the accumulators; the last one reduces them and writes the
cost row.

All chunking is expressed through BlockSpecs (Mosaic on this backend
rejects dynamically-offset lane access), stores are full vectors, and
masking uses selects so +/-inf sentinels never meet and produce NaNs.
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

ANGLE_BLOCK = 32  # angles per program
ROW_CHUNK = 128  # test rows per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sweep_kernel(
    tx_ref, ty_ref, row_valid_ref,
    rx_ref, ry_ref, col_valid_ref,
    cos_ref, sin_ref, penalty_ref,
    out_ref,
    fwd_scr, bwd_scr,
):
    ci = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    rx = rx_ref[0, 0, 0, :]  # [M]
    ry = ry_ref[0, 0, 0, :]
    col_valid_f = col_valid_ref[0, 0, 0, :]

    dtype = out_ref.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    neg_inf = -inf

    @pl.when(ci == 0)
    def _():
        fwd_scr[:, :] = jnp.full(fwd_scr.shape, neg_inf, dtype)
        bwd_scr[:, :] = jnp.full(bwd_scr.shape, inf, dtype)

    txc = tx_ref[0, 0, 0, :]  # [RC]
    tyc = ty_ref[0, 0, 0, :]
    row_valid_f = row_valid_ref[0, 0, 0, :]

    a_c = txc[:, None] * rx[None, :] + tyc[:, None] * ry[None, :]  # [RC, M]
    b_c = txc[:, None] * ry[None, :] - tyc[:, None] * rx[None, :]
    # fold the column mask into the constant term
    c_c = (txc * txc + tyc * tyc)[:, None] + jnp.where(
        col_valid_f > 0.5, rx * rx + ry * ry, inf
    )[None, :]

    cos_t = 2.0 * cos_ref[0, 0, 0, :]  # [KB]
    sin_t = 2.0 * sin_ref[0, 0, 0, :]

    # [KB, RC, M]
    d2 = (
        c_c[None, :, :]
        - cos_t[:, None, None] * a_c[None, :, :]
        - sin_t[:, None, None] * b_c[None, :, :]
    )

    # forward: min over columns, masked max over this chunk's rows
    min_j = jnp.min(d2, axis=2)  # [KB, RC]
    min_j = jnp.where(row_valid_f[None, :] > 0.5, min_j, neg_inf)
    chunk_fwd = jnp.max(min_j, axis=1)  # [KB]
    fwd_scr[0, :] = jnp.maximum(fwd_scr[0, :], chunk_fwd)

    # backward: running min over rows (invalid rows excluded via select)
    d2_rows = jnp.where(row_valid_f[None, :, None] > 0.5, d2, inf)
    bwd_scr[:, :] = jnp.minimum(bwd_scr[:, :], jnp.min(d2_rows, axis=1))

    @pl.when(ci == n_chunks - 1)
    def _():
        bwd_cost = jnp.max(
            jnp.where(col_valid_f[None, :] > 0.5, bwd_scr[:, :], neg_inf), axis=1
        )  # [KB]
        cost = jnp.maximum(fwd_scr[0, :], bwd_cost) + penalty_ref[0, 0, 0, :]
        out_ref[0, 0, 0, :] = cost


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_call(tx, ty, row_valid, rx, ry, col_valid, cos_t, sin_t, penalty,
                interpret=False):
    F, NC, _, RC = tx.shape
    M = rx.shape[3]
    n_kb = cos_t.shape[1]
    KB = cos_t.shape[3]
    dtype = tx.dtype

    row_spec = pl.BlockSpec(
        (1, 1, 1, RC), lambda f, kb, ci: (f, ci, 0, 0), memory_space=pltpu.VMEM
    )
    ref_spec = pl.BlockSpec(
        (1, 1, 1, M), lambda f, kb, ci: (f, 0, 0, 0), memory_space=pltpu.VMEM
    )
    angle_spec = pl.BlockSpec(
        (1, 1, 1, KB), lambda f, kb, ci: (f, kb, 0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        _sweep_kernel,
        grid=(F, n_kb, NC),
        in_specs=[
            row_spec, row_spec, row_spec,
            ref_spec, ref_spec, ref_spec,
            angle_spec, angle_spec, angle_spec,
        ],
        out_specs=angle_spec,
        out_shape=jax.ShapeDtypeStruct((F, n_kb, 1, KB), dtype),
        scratch_shapes=[
            pltpu.VMEM((8, KB), dtype),  # fwd accumulator (row 0 used)
            pltpu.VMEM((KB, M), dtype),  # bwd accumulator
        ],
        interpret=interpret,
    )(tx, ty, row_valid, rx, ry, col_valid, cos_t, sin_t, penalty)


def rotation_cost_table_pallas(test, ref, test_mask, ref_mask, angles, angles_valid,
                               interpret: bool = False):
    """Drop-in replacement for ops.rotation_search.rotation_cost_table.

    test: [F, N, 2], ref: [F, M, 2] (centered), masks [F, N]/[F, M],
    angles/valid [F, K].  Returns squared-Hausdorff costs [F, K] (+inf at
    invalid slots)."""
    F, N, _ = test.shape
    M = ref.shape[1]
    K = angles.shape[1]
    dtype = test.dtype

    n_pad = _round_up(max(N, ROW_CHUNK), ROW_CHUNK)
    m_pad = _round_up(max(M, 128), 128)
    k_pad = _round_up(max(K, ANGLE_BLOCK), ANGLE_BLOCK)
    nc = n_pad // ROW_CHUNK
    n_kb = k_pad // ANGLE_BLOCK

    def pad_rows(x, value=0.0):
        out = jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1])), constant_values=value)
        return out.reshape(F, nc, 1, ROW_CHUNK)

    def pad_cols(x, value=0.0):
        out = jnp.pad(x, ((0, 0), (0, m_pad - x.shape[1])), constant_values=value)
        return out.reshape(F, 1, 1, m_pad)

    def pad_angles(x, value=0.0):
        out = jnp.pad(x, ((0, 0), (0, k_pad - x.shape[1])), constant_values=value)
        return out.reshape(F, n_kb, 1, ANGLE_BLOCK)

    tx = pad_rows(test[..., 0])
    ty = pad_rows(test[..., 1])
    row_valid = pad_rows(test_mask.astype(dtype))
    rx = pad_cols(ref[..., 0])
    ry = pad_cols(ref[..., 1])
    col_valid = pad_cols(ref_mask.astype(dtype))
    cos_t = pad_angles(jnp.cos(angles).astype(dtype), 1.0)
    sin_t = pad_angles(jnp.sin(angles).astype(dtype))
    penalty = pad_angles(
        jnp.where(angles_valid, 0.0, jnp.inf).astype(dtype), np.inf
    )

    costs = _sweep_call(
        tx, ty, row_valid, rx, ry, col_valid, cos_t, sin_t, penalty,
        interpret=interpret,
    )
    return costs.reshape(F, k_pad)[:, :K]
