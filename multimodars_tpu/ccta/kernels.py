"""CCTA mesh-fusion compute kernels.

Parity: ``src/ccta/adjust_mesh/{label_coronary,scale_coronary}.rs``,
``src/ccta/discretizing/{projecting,resampling,vessel_tree}.rs`` and the
pyfunctions in ``src/ccta/binding/ccta_py.rs`` of the reference.

TPU mapping: the reference accelerates these with rayon + R-trees; here the
same queries are dense batched reductions — pairwise-distance min/argmin
tiles (chunked to bound memory), a vmapped Möller–Trumbore ray-triangle
kernel, and grid sweeps evaluated as one batch over all scaling candidates.
Exact-identity set operations (the labeling bookkeeping) stay host-side on
bit-pattern keys, as in the reference.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import config, default_backend
from ..models.centerline import PyCenterline
from ..utils.device import to_device
from ..models.contour import PyContour
from ..models.frame import PyFrame
from .mesh import fix_faces_winding

# device routing threshold for the batched morph sweep: below this many
# point pairs per candidate, the 41-candidate host loop beats a dispatch
_SWEEP_DEVICE_PAIRS = int(os.environ.get("MMTPU_CCTA_SWEEP_DEVICE_PAIRS", 60_000))

Coords3 = Tuple[float, float, float]

_CHUNK = 16384

# banded count kernel tiling: a-rows per dispatch, b-columns per scan slice
_COUNT_A_CHUNK = 32768
_COUNT_B_SLICE = 16384
# chunk size for the axis-banded count plan: small enough that a sorted
# chunk spans a narrow window of the sort axis (tight b slices), large
# enough to fill the vector unit
_COUNT_A_CHUNK_BANDED = 4096
# finite far-away sentinel for pad rows/columns: d2 of any real-vs-pad
# pairing lands at ~1e34, far outside any radius band (pad x pad cancels to
# 0 in the diff form, but those rows are sliced out before use)
_FAR = 1e17


def _as_array(points) -> np.ndarray:
    arr = np.asarray(points, dtype=np.float64)
    if arr.size == 0:
        return arr.reshape(0, 3)
    return arr.reshape(-1, 3)


# ---------------------------------------------------------------------------
# pairwise distance primitives (device, chunked)
# ---------------------------------------------------------------------------

@jax.jit
def _min_sqdist_block(a, b):
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d2.min(axis=1), d2.argmin(axis=1)


@jax.jit
def _min_sqdist_block2(a, b):
    """Min + argmin + runner-up min (for the low-precision tie
    certificate): rows whose two best candidates are closer than the f32
    rounding band route to an exact f64 re-pick on the host."""
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    m1 = d2.min(axis=1)
    am = d2.argmin(axis=1)
    inf = jnp.asarray(jnp.inf, d2.dtype)
    wo = jnp.where(jnp.arange(d2.shape[1])[None, :] == am[:, None], inf, d2)
    m2 = wo.min(axis=1)
    return jnp.stack([m1, m2]), am


def _pack_count_near(certain, near):
    """Pack (certain count, any-near flag) into ONE int32 per row: the sign
    bit carries the flag (counts are < 2^31), so every wave pull moves half
    the bytes over the ~15-30 MB/s tunnel.  Decode: near = packed < 0,
    count = packed & 0x7fffffff."""
    return jnp.where(near > 0, certain | jnp.int32(-(2**31)), certain)


@partial(jax.jit, static_argnames=("ch", "w"))
def _count_band_window_block(block, b_full, lo, r2lo, r2hi, ch, w):
    """Banded neighbour count over a ``w``-column window of ``b_full``
    starting at ``lo``: pairs certainly inside (d2 <= r2lo) and pairs in
    the uncertainty band (r2lo, r2hi] whose rows need an exact f64 recount
    on the host, sign-bit-packed (:func:`_pack_count_near`) so each chunk
    costs a single minimal device->host pull.
    The full sweep is the lo=0, w=len(b) case.

    TPU mapping: the window is swept in ``ch``-column slices under
    ``lax.scan`` so the [N, ch] tile is the largest live intermediate —
    the unsliced [N, M, 3] broadcast form materialised an [N, M] HBM temp
    (8-16 GB at clinical sizes) and ran ~4x slower, HBM-bound.  d2 is the
    direct difference form: the gram identity |a|^2+|b|^2-2ab measured
    only ~10% faster here, and its f32 cancellation error (~96 maxc^2 eps)
    forces an uncertainty band wide enough that regular-lattice meshes
    flag nearly every row for the exact host recount — the diff form
    keeps the band at the ~(24 r maxc + 10 r^2) eps rounding floor.

    Windowing: ``w`` is static so every chunk of a plan shares one
    executable.  Real points inside the fixed-width window but outside a
    chunk's true axis band are provably beyond the near-band (the dispatch
    margin exceeds 3*band/(2r)), so they contribute nothing;
    dynamic_slice's clamping at the array ends only widens the window,
    which is harmless for the same reason."""
    win = lax.dynamic_slice(b_full, (lo, 0), (w, 3))
    bc = win.reshape(-1, ch, 3)
    # component (SoA) form: each [N, ch] term keeps the ch axis in lanes —
    # the [N, ch, 3] broadcast of the vector form left 125/128 lanes idle in
    # the subtract/square stage and measured ~2.5x slower
    ax, ay, az = block[:, 0:1], block[:, 1:2], block[:, 2:3]

    def step(carry, bi):
        dx = ax - bi[None, :, 0]
        dy = ay - bi[None, :, 1]
        dz = az - bi[None, :, 2]
        d2 = (dx * dx + dy * dy) + dz * dz
        c, nr = carry
        return (
            c + (d2 <= r2lo).sum(axis=1, dtype=jnp.int32),
            nr + ((d2 > r2lo) & (d2 <= r2hi)).sum(axis=1, dtype=jnp.int32),
        ), None

    z = jnp.zeros(block.shape[0], jnp.int32)
    (certain, near), _ = lax.scan(step, (z, z), bc)
    return _pack_count_near(certain, near)


@partial(jax.jit, static_argnames=("ch", "w"))
def _count_band_window_block_idx(buf, a_rows, b_buf, lo, r2lo, r2hi, ch, w):
    """:func:`_count_band_window_block` with the a-block gathered on device
    from the resident buffer ``buf`` by ``a_rows`` (pad positions index the
    _FAR sentinel row) — only int32 indices travel over the tunnel."""
    block = buf[a_rows]
    win = lax.dynamic_slice(b_buf, (lo, 0), (w, 3))
    bc = win.reshape(-1, ch, 3)
    ax, ay, az = block[:, 0:1], block[:, 1:2], block[:, 2:3]  # SoA form

    def step(carry, bi):
        dx = ax - bi[None, :, 0]
        dy = ay - bi[None, :, 1]
        dz = az - bi[None, :, 2]
        d2 = (dx * dx + dy * dy) + dz * dz
        c, nr = carry
        return (
            c + (d2 <= r2lo).sum(axis=1, dtype=jnp.int32),
            nr + ((d2 > r2lo) & (d2 <= r2hi)).sum(axis=1, dtype=jnp.int32),
        ), None

    z = jnp.zeros(block.shape[0], jnp.int32)
    (certain, near), _ = lax.scan(step, (z, z), bc)
    return _pack_count_near(certain, near)


@partial(jax.jit, static_argnames=("ch", "n_pad"))
def _bounded_flags_all(buf, b_buf, r2lo, r2hi, ch, n_pad):
    """Per-row (certainly-bounded, near-band) uint8 flags of EVERY resident
    row against a small target cloud — the device core of the
    centerline-bounded mask.  No index upload (rows pad inside the jit) and
    a 2-byte/row pull instead of 8 (the tunnel moves ~15-30 MB/s, so pull
    size is the cost)."""
    block = jnp.pad(
        buf[:-1], ((0, n_pad - (buf.shape[0] - 1)), (0, 0)),
        constant_values=_FAR,
    )
    bc = b_buf.reshape(-1, ch, 3)

    ax, ay, az = block[:, 0:1], block[:, 1:2], block[:, 2:3]  # SoA form

    def step(carry, bi):
        dx = ax - bi[None, :, 0]
        dy = ay - bi[None, :, 1]
        dz = az - bi[None, :, 2]
        d2 = (dx * dx + dy * dy) + dz * dz
        c, nr = carry
        return (c | (d2 <= r2lo).any(axis=1), nr | (d2 <= r2hi).any(axis=1)), None

    z = jnp.zeros(block.shape[0], bool)
    (certain, near), _ = lax.scan(step, (z, z), bc)
    # slice the pad off on device AND pack both flags into one byte (bit 0
    # certain, bit 1 near): the tunnel moves ~15-30 MB/s, so the pull pays
    # per byte
    n = buf.shape[0] - 1
    return certain[:n].astype(jnp.uint8) | (near[:n].astype(jnp.uint8) << 1)


@jax.jit
def _gather_rows(buf, idx):
    return buf[idx]


@partial(jax.jit, static_argnames=("ch", "row_blk"))
def _count_resident_slot(buf, a_rows, b_rows, r2lo, r2hi, ch, row_blk):
    """One full-sweep count slot in a SINGLE dispatch: both sides gather
    from the resident buffer, rows sweep in ``row_blk`` blocks under an
    outer scan (bounding the live [row_blk, ch] tile) and columns in
    ``ch`` slices under the inner scan.  Replaces the per-chunk dispatch
    loop — over the tunnel every extra dispatch/upload costs ~5-15 ms of
    latency, which dominated the wave at clinical sizes."""
    a = buf[a_rows].reshape(-1, row_blk, 3)
    bc = buf[b_rows].reshape(-1, ch, 3)

    def row_step(_, blk):
        ax, ay, az = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]  # SoA: ch in lanes

        def col_step(carry, bi):
            dx = ax - bi[None, :, 0]
            dy = ay - bi[None, :, 1]
            dz = az - bi[None, :, 2]
            d2 = (dx * dx + dy * dy) + dz * dz
            c, nr = carry
            return (
                c + (d2 <= r2lo).sum(axis=1, dtype=jnp.int32),
                nr + ((d2 > r2lo) & (d2 <= r2hi)).sum(axis=1, dtype=jnp.int32),
            ), None

        z = jnp.zeros(blk.shape[0], jnp.int32)
        (certain, near), _ = lax.scan(col_step, (z, z), bc)
        return None, _pack_count_near(certain, near)

    _, out = lax.scan(row_step, None, a)  # [n_blocks, row_blk]
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("ch", "row_blk"))
def _count_resident_slot_explicit_b(buf, a_rows, b_pad, r2lo, r2hi, ch, row_blk):
    """:func:`_count_resident_slot` with an explicit (small) b-side cloud."""
    a = buf[a_rows].reshape(-1, row_blk, 3)
    bc = b_pad.reshape(-1, ch, 3)

    def row_step(_, blk):
        ax, ay, az = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]  # SoA: ch in lanes

        def col_step(carry, bi):
            dx = ax - bi[None, :, 0]
            dy = ay - bi[None, :, 1]
            dz = az - bi[None, :, 2]
            d2 = (dx * dx + dy * dy) + dz * dz
            c, nr = carry
            return (
                c + (d2 <= r2lo).sum(axis=1, dtype=jnp.int32),
                nr + ((d2 > r2lo) & (d2 <= r2hi)).sum(axis=1, dtype=jnp.int32),
            ), None

        z = jnp.zeros(blk.shape[0], jnp.int32)
        (certain, near), _ = lax.scan(col_step, (z, z), bc)
        return None, _pack_count_near(certain, near)

    _, out = lax.scan(row_step, None, a)
    return out.reshape(-1)


class DeviceVerts:
    """Globally-centered compute-dtype device residency of a vertex cloud.

    Over the tunneled backend transfers run at ~15-30 MB/s, so re-uploading
    vertex SUBSETS for every count wave dominates the labeling stage.  The
    cloud uploads ONCE — centered at its f64 bounding-box midpoint, cast on
    the host, one _FAR sentinel row appended for gather padding — and every
    subsequent wave ships int32 gather indices (3x smaller than points, or
    nothing at all for whole-cloud queries).

    Exactness is unchanged: the rounding model is identical to the per-call
    path (f64 centering, then one cast), only the centering midpoint is
    global, so the certification band uses the global ``maxc``; rows inside
    the band still recount exactly in f64 on the host.
    """

    def __init__(self, verts, dtype=None):
        if dtype is None:
            dtype = config.compute_dtype
        self.verts64 = np.ascontiguousarray(verts, dtype=np.float64).reshape(-1, 3)
        n = len(self.verts64)
        if n:
            lo = self.verts64.min(axis=0)
            hi = self.verts64.max(axis=0)
        else:
            lo = hi = np.zeros(3)
        self.mid = 0.5 * (lo + hi)
        self.centered = self.verts64 - self.mid
        self.maxc = max(
            float(np.abs(self.centered).max()) if n else 0.0, 1e-30
        )
        self.n = n
        self.dtype = dtype
        pad = np.concatenate([self.centered, np.full((1, 3), _FAR)])
        # dispatch the upload immediately; callers create the cache right
        # after loading the mesh so the transfer overlaps host prep work
        self.dev = to_device(pad, dtype, kind="replicated")

    def _band(self, radius: float, maxb: float) -> Tuple[float, float, float]:
        r2 = radius * radius
        maxc = max(self.maxc, maxb)
        eps = float(np.finfo(np.dtype(self.dtype)).eps)
        band = (24.0 * radius * maxc + 10.0 * r2) * eps
        return r2, r2 - band, r2 + band


def _resident_b_side(dv: DeviceVerts, b):
    """(bc_centered_f64, b64_original, maxb) for an index-array or explicit
    coordinate b side."""
    b = np.asarray(b)
    if b.ndim == 1 and np.issubdtype(b.dtype, np.integer):
        b_idx = b.astype(np.int64)
        return dv.centered[b_idx], dv.verts64[b_idx], dv.maxc
    b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(-1, 3)
    bc = b64 - dv.mid
    maxb = max(float(np.abs(bc).max()) if len(bc) else 0.0, 1e-30)
    return bc, b64, maxb


def _count_device_dispatch_resident(dv: DeviceVerts, a_idx, b, radius: float):
    """:func:`_count_device_dispatch` against the resident buffer: the same
    host-side banded/full planning (sort orders, windows) computed from the
    host copies, but the device arrays are built by ON-DEVICE gathers, so
    only int32 index arrays travel.  Returns a _collect_device_counts-
    compatible state."""
    dtype = dv.dtype
    a_idx = np.asarray(a_idx, dtype=np.int64)
    ac = dv.centered[a_idx]
    bc, b64, maxb = _resident_b_side(dv, b)
    r2, r2lo_f, r2hi_f = dv._band(radius, maxb)
    r2lo = jnp.asarray(r2lo_f, dtype)
    r2hi = jnp.asarray(r2hi_f, dtype)
    band = r2hi_f - r2
    maxc = max(dv.maxc, maxb)

    b_arr = np.asarray(b)
    b_is_idx = b_arr.ndim == 1 and np.issubdtype(b_arr.dtype, np.integer)
    handles = []
    a_ord = None
    plan = None
    banded_enabled = os.environ.get("MMTPU_CCTA_AXIS_BAND", "1") != "0"
    min_pairs = float(os.environ.get("MMTPU_CCTA_AXIS_BAND_MIN_PAIRS", 1e10))
    if banded_enabled and len(ac) * len(bc) >= min_pairs and len(ac) and len(bc):
        spread = bc.max(axis=0) - bc.min(axis=0)
        ax = int(np.argmax(spread))
        b_ord = np.argsort(bc[:, ax], kind="stable")
        bz = np.ascontiguousarray(bc[b_ord, ax])
        a_ord_c = np.argsort(ac[:, ax], kind="stable")
        a_sorted_c = ac[a_ord_c]
        chunk = _COUNT_A_CHUNK_BANDED
        while chunk > 1024 and chunk * 8 > len(ac):
            chunk //= 2
        starts = np.arange(0, len(ac), chunk)
        ends = np.minimum(starts + chunk, len(ac))
        margin = (
            2.0 * band / max(radius, 1e-30)
            + 64.0 * np.finfo(np.float64).eps * (maxc + radius)
        )
        z0 = a_sorted_c[starts, ax] - radius - margin
        z1 = a_sorted_c[ends - 1, ax] + radius + margin
        los = np.searchsorted(bz, z0, side="left")
        his = np.searchsorted(bz, z1, side="right")
        m_pad_full = _pow2_at_least(len(bc), 1024)
        w = min(_pow2_at_least(max(int((his - los).max()), 1), 1024), m_pad_full)
        n_pad = _pow2_at_least(int((ends - starts).max()), 1024)
        if len(starts) * n_pad * w * 3 <= len(ac) * m_pad_full * 2:
            a_ord = a_ord_c
            plan = (b_ord, starts, ends, los, n_pad, w, m_pad_full)

    if plan is not None:
        b_ord, starts, ends, los, n_pad, w, m_pad_full = plan
        if b_is_idx:
            perm = np.full(m_pad_full, dv.n, dtype=np.int32)
            perm[: len(bc)] = np.asarray(b, dtype=np.int64)[b_ord]
            b_d = _gather_rows(dv.dev, to_device(perm, np.int32))
        else:
            b_pad = np.full((m_pad_full, 3), _FAR)
            b_pad[: len(bc)] = bc[b_ord]
            b_d = to_device(b_pad, dtype)
        ch = min(_COUNT_B_SLICE, w)
        a_sorted_idx = a_idx[a_ord]
        for s, e, lo in zip(starts, ends, los):
            n_blk = int(e - s)
            rows = np.full(n_pad, dv.n, dtype=np.int32)
            rows[:n_blk] = a_sorted_idx[s:e]
            handles.append(
                (int(s), n_blk, n_pad,
                 _count_band_window_block_idx(
                     dv.dev, to_device(rows, np.int32, kind="rows"), b_d,
                     jnp.asarray(int(lo)), r2lo, r2hi, ch, w,
                 ))
            )
        return dict(
            a64=dv.verts64[a_idx], b64=b64, radius=radius, r2=r2,
            handles=handles, a_ord=a_ord,
        )

    # full sweep: ONE dispatch per slot — rows block-scan inside the jit.
    # 8192x8192 tiles measured ~20% faster than 32768x16384 at clinical
    # sizes (and multiple-of-block padding wastes less than pow2)
    ch = min(8192, _pow2_at_least(len(bc), 1024))
    m_pad = max(ch, -(-len(bc) // ch) * ch)
    row_blk = min(8192, _pow2_at_least(len(ac), 2048))
    n_pad = -(-len(ac) // row_blk) * row_blk
    rows = np.full(n_pad, dv.n, dtype=np.int32)
    rows[: len(ac)] = a_idx
    rows_d = to_device(rows, np.int32, kind="rows")
    if b_is_idx:
        perm = np.full(m_pad, dv.n, dtype=np.int32)
        perm[: len(bc)] = np.asarray(b, dtype=np.int64)
        h = _count_resident_slot(
            dv.dev, rows_d, to_device(perm, np.int32), r2lo, r2hi, ch, row_blk
        )
    else:
        b_pad = np.full((m_pad, 3), _FAR)
        b_pad[: len(bc)] = bc
        h = _count_resident_slot_explicit_b(
            dv.dev, rows_d, to_device(b_pad, dtype), r2lo, r2hi, ch, row_blk
        )
    handles.append((0, len(ac), n_pad, h))
    return dict(
        a64=dv.verts64[a_idx], b64=b64, radius=radius, r2=r2,
        handles=handles, a_ord=None,
    )


# resident waves beat the host grid from a few million pairs: the upload is
# indices-only, so the crossover sits far below the re-upload path's
_RESIDENT_MIN_PAIRS = int(os.environ.get("MMTPU_CCTA_RESIDENT_PAIRS", 8_000_000))


def _resident_eligible(dv, n_a: int, n_b: int, radius: float) -> bool:
    if radius <= 0 or n_a == 0 or n_b == 0:
        return False
    if os.environ.get("MMTPU_CCTA_RESIDENT", "1") == "0":
        return False
    if os.environ.get("MMTPU_CCTA_RESIDENT") == "1":
        return True  # forced (tests exercise the path on the CPU backend)
    return n_a * n_b >= _RESIDENT_MIN_PAIRS and default_backend() == "tpu"


def count_pairs_resident(
    dv: DeviceVerts, pairs: Sequence[Tuple], radius: float
) -> List[np.ndarray]:
    """:func:`count_within_radius_pairs` with both sides drawn from the
    resident cloud (index arrays) or small explicit coordinate sets; one
    dispatch wave, exact counts."""
    states = []
    fallbacks = []
    for a_idx, b in pairs:
        n_b = len(b)
        if _resident_eligible(dv, len(a_idx), n_b, radius):
            states.append(_count_device_dispatch_resident(dv, a_idx, b, radius))
            fallbacks.append(None)
        else:
            states.append(None)
            _, b64, _ = _resident_b_side(dv, b)
            fallbacks.append((dv.verts64[np.asarray(a_idx, np.int64)], b64))
    _enqueue_wave_pull(states)
    device_counts = _collect_device_counts([st for st in states if st is not None])
    out = []
    di = 0
    for st, fb in zip(states, fallbacks):
        if st is not None:
            out.append(device_counts[di])
            di += 1
        else:
            out.append(count_within_radius(fb[0], fb[1], radius))
    return out


def bounded_masks_resident(
    dv: DeviceVerts, centerlines: Sequence[PyCenterline], radius: float
) -> List[np.ndarray]:
    """bool[n] per centerline: resident row within ``radius`` of any
    centerline point — every mask in ONE device wave, exact (near-band rows
    recount on the host against the tiny centerline cloud)."""
    states = []
    n_pad = _pow2_at_least(max(dv.n, 1), 1024)
    for cl in centerlines:
        cl_pos = _check_centerline_sorted(cl)
        bc, b64, maxb = _resident_b_side(dv, cl_pos)
        r2, r2lo_f, r2hi_f = dv._band(radius, maxb)
        m_pad = _pow2_at_least(max(len(bc), 1), 64)
        b_pad = np.full((m_pad, 3), _FAR)
        b_pad[: len(bc)] = bc
        h = _bounded_flags_all(
            dv.dev,
            to_device(b_pad, dv.dtype),
            jnp.asarray(r2lo_f, dv.dtype),
            jnp.asarray(r2hi_f, dv.dtype),
            min(_COUNT_B_SLICE, m_pad),
            n_pad,
        )
        states.append((h, b64, r2))
    try:
        for h, _, _ in states:
            h.copy_to_host_async()
    except Exception:
        pass
    out = []
    for h, b64, r2 in states:
        flags = np.asarray(h)  # packed uint8: bit 0 certain, bit 1 near
        certain = (flags[: dv.n] & 1).astype(bool)
        near = (flags[: dv.n] & 2).astype(bool) & ~certain
        if near.any():
            sub = np.ascontiguousarray(dv.verts64[near])
            d2 = ((sub[:, None, :] - b64[None, :, :]) ** 2).sum(-1).min(axis=1)
            certain[near] = d2 <= r2
        out.append(certain)
    return out


@partial(jax.jit, static_argnames=("ch",))
def _fused_absorb_impl(
    buf, prox_rows, dist_rows, btw_rows, n_prox, n_dist, min_ratio, r2lo,
    r2hi, ch
):
    """Both outlier-absorption passes of the region split in ONE device
    program (scale_coronary.rs:341-404 semantics, chained like the host
    sequence): pass 1 counts prox vs (between, prox); its move decision —
    the exact f64 ratio test on the certain counts — extends the reference
    set for pass 2 ON DEVICE, so the second tunnel round-trip disappears.
    Rows with any near-band pair are re-decided exactly on the host
    afterwards (and the chain re-validated there).

    ``*_rows``: int32 gather indices into the resident ``buf`` (pad slots
    index the _FAR sentinel); ``n_prox``/``n_dist`` the real counts (the
    _FAR pads never land in the rounding band, but the move masks must not
    mark pad slots as reference members).  Returns ``(flags, stacked)``:

    - ``flags`` uint8[n] — bit 0 device prox move, bit 1 prox near-band,
      bit 2 device dist move, bit 3 dist near-band.  This 1-byte/row pull
      is all the host needs on the common path: for non-near rows the
      certain counts ARE exact, so the device's f64 decision replica
      necessarily equals the host decision.
    - ``stacked`` [4, n] int32 — the four count streams {p_btw, p_self,
      d_ref2, d_self} sign-bit-packed with their near flags
      (:func:`_pack_count_near`).  NOT pulled on the common path; the host
      fetches it (second round-trip) only when an exact near-row
      re-decision flips a prox row, which invalidates the device's pass-2
      reference set.
    """
    prox = buf[prox_rows]
    dist = buf[dist_rows]
    btw = buf[btw_rows]

    def counts(block, b_arr):
        bc = b_arr.reshape(-1, ch, 3)
        ax, ay, az = block[:, 0:1], block[:, 1:2], block[:, 2:3]  # SoA form

        def step(carry, bi):
            dx = ax - bi[None, :, 0]
            dy = ay - bi[None, :, 1]
            dz = az - bi[None, :, 2]
            d2 = (dx * dx + dy * dy) + dz * dz
            c, nr = carry
            return (
                c + (d2 <= r2lo).sum(axis=1, dtype=jnp.int32),
                nr + ((d2 > r2lo) & (d2 <= r2hi)).sum(axis=1, dtype=jnp.int32),
            ), None

        z = jnp.zeros(block.shape[0], jnp.int32)
        (certain, near), _ = lax.scan(step, (z, z), bc)
        return certain, near

    p_btw, p_btw_near = counts(prox, btw)
    p_self, p_self_near = counts(prox, prox)

    # the exact host decision replica (reassign_mask_from_counts) on the
    # certain counts, in f64 like numpy
    ref = p_btw.astype(jnp.float64)
    self_c = jnp.maximum(p_self.astype(jnp.float64) - 1.0, 0.0)
    total = ref + self_c
    move = (total > 0) & (ref / jnp.maximum(total, 1.0) >= min_ratio)
    move = move & (jnp.arange(prox.shape[0]) < n_prox)

    # pass 2's reference set = between ∪ moved prox: masked prox rows park
    # at the sentinel so they count nothing
    far = jnp.asarray(_FAR, buf.dtype)
    prox_ref = jnp.where(move[:, None], prox, far)
    d_btw, d_btw_near = counts(dist, btw)
    d_moved, d_moved_near = counts(dist, prox_ref)
    d_self, d_self_near = counts(dist, dist)

    # pass 2's decision replica (same f64 expression tree)
    d_ref2 = d_btw + d_moved
    d_ref2_near = d_btw_near + d_moved_near
    ref_d = d_ref2.astype(jnp.float64)
    self_d = jnp.maximum(d_self.astype(jnp.float64) - 1.0, 0.0)
    total_d = ref_d + self_d
    move_d = (total_d > 0) & (ref_d / jnp.maximum(total_d, 1.0) >= min_ratio)
    move_d = move_d & (jnp.arange(dist.shape[0]) < n_dist)

    flags = (
        move.astype(jnp.uint8)
        | (((p_btw_near + p_self_near) > 0).astype(jnp.uint8) << 1)
        | (move_d.astype(jnp.uint8) << 2)
        | (((d_ref2_near + d_self_near) > 0).astype(jnp.uint8) << 3)
    )
    # sign-bit-pack each (count, near) pair: halves the lazy pull's bytes
    stacked = jnp.stack(
        [
            _pack_count_near(p_btw, p_btw_near),
            _pack_count_near(p_self, p_self_near),
            _pack_count_near(d_ref2, d_ref2_near),
            _pack_count_near(d_self, d_self_near),
        ]
    )
    return flags, stacked


def fused_absorb_resident(
    dv: DeviceVerts,
    prox_idx: np.ndarray,
    dist_idx: np.ndarray,
    btw_idx: np.ndarray,
    radius: float,
    min_ratio: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """(move_prox, move_dist) of the two chained absorption passes, exact.

    Device counts carry the usual certification band; any row whose
    decision could be touched by a near-band pair — or any prox decision
    the device chain got wrong — is re-decided exactly on the host against
    the true reference sets.
    """
    prox_idx = np.asarray(prox_idx, dtype=np.int64)
    dist_idx = np.asarray(dist_idx, dtype=np.int64)
    btw_idx = np.asarray(btw_idx, dtype=np.int64)
    r2 = radius * radius
    _, r2lo_f, r2hi_f = dv._band(radius, dv.maxc)

    def pad_rows(idx, floor=1024):
        n_pad = _pow2_at_least(max(len(idx), 1), floor)
        rows = np.full(n_pad, dv.n, dtype=np.int32)
        rows[: len(idx)] = idx
        return rows

    ch = _COUNT_B_SLICE
    # prox and dist share one padded width: the output counts stack [8, n]
    ab_pad = _pow2_at_least(max(len(prox_idx), len(dist_idx), 1), 1024)
    p_rows = pad_rows(prox_idx, ab_pad)
    d_rows = pad_rows(dist_idx, ab_pad)
    b_rows = pad_rows(btw_idx)
    ch_eff = min(ch, len(b_rows), len(p_rows), len(d_rows))
    flags_h, stacked = _fused_absorb_impl(
        dv.dev,
        to_device(p_rows, np.int32, kind="rows"),
        to_device(d_rows, np.int32, kind="rows"),
        to_device(b_rows, np.int32, kind="rows"),
        jnp.asarray(len(prox_idx)),
        jnp.asarray(len(dist_idx)),
        jnp.asarray(float(min_ratio), jnp.float64),
        jnp.asarray(r2lo_f, dv.dtype),
        jnp.asarray(r2hi_f, dv.dtype),
        ch_eff,
    )
    try:
        flags_h.copy_to_host_async()  # 1 byte/row; `stacked` stays on device
    except Exception:
        pass
    flags = np.asarray(flags_h)

    np_ = len(prox_idx)
    nd = len(dist_idx)
    move_dev_p = (flags[:np_] & 1) > 0
    near_p = (flags[:np_] & 2) > 0
    move_dev_d = (flags[:nd] & 4) > 0
    near_d = (flags[:nd] & 8) > 0

    prox64 = dv.verts64[prox_idx]
    btw64 = dv.verts64[btw_idx]
    # non-near rows: certain counts are exact, so the device's f64 decision
    # replica IS the host decision; only near-band rows re-decide exactly
    move_prox = move_dev_p.copy()
    if near_p.any():
        sub = np.ascontiguousarray(prox64[near_p])
        pb = _count_rows_exact_host(sub, btw64, r2)
        ps = _count_rows_exact_host(sub, prox64, r2)
        move_prox[near_p] = reassign_mask_from_counts(pb, ps, min_ratio)

    dist64 = dv.verts64[dist_idx]
    wrong = move_prox != move_dev_p  # ⊆ near_p by construction
    if wrong.any():
        # rare path: a near-row re-decision flipped a prox row, so the
        # device's pass-2 reference set was wrong — pull the count streams
        # (the one lazy round-trip) and delta-correct before re-deciding
        # every dist row from counts
        flat = np.asarray(stacked)
        d_ref2 = flat[2, :nd].astype(np.int64) & 0x7FFFFFFF
        d_self = flat[3, :nd].astype(np.int64) & 0x7FFFFFFF
        if int(wrong.sum()) * max(nd, 1) > 20_000_000:
            # too many flipped columns for the dense fix: recount pass 2
            # outright against the true reference set
            ref2_full = np.concatenate([btw64, prox64[move_prox]])
            d_ref2 = (
                _count_rows_exact_host(dist64, ref2_full, r2)
                if len(ref2_full) and nd
                else np.zeros(nd, dtype=np.int64)
            )
        else:
            # the device chain's pass-2 reference set differed on these
            # prox rows: adjust by the exact per-column contribution
            fix = dv.verts64[prox_idx[wrong]]
            delta = _count_columns_within_host(dist64, fix, r2)
            sign = np.where(move_prox[wrong], 1, -1)
            d_ref2 = d_ref2 + (delta * sign[None, :]).sum(axis=1)
        if near_d.any():
            sub = np.ascontiguousarray(dist64[near_d])
            ref2 = np.concatenate([btw64, prox64[move_prox]])
            d_ref2[near_d] = (
                _count_rows_exact_host(sub, ref2, r2) if len(ref2) else 0
            )
            d_self[near_d] = _count_rows_exact_host(sub, dist64, r2)
        return move_prox, reassign_mask_from_counts(d_ref2, d_self, min_ratio)

    move_dist = move_dev_d.copy()
    if near_d.any():
        sub = np.ascontiguousarray(dist64[near_d])
        ref2 = np.concatenate([btw64, prox64[move_prox]])
        dr = (
            _count_rows_exact_host(sub, ref2, r2)
            if len(ref2)
            else np.zeros(int(near_d.sum()), dtype=np.int64)
        )
        ds = _count_rows_exact_host(sub, dist64, r2)
        move_dist[near_d] = reassign_mask_from_counts(dr, ds, min_ratio)
    return move_prox, move_dist


def _count_columns_within_host(a64: np.ndarray, cols64: np.ndarray, r2: float):
    """[N, K] exact bool: a-row within radius of each of the K columns,
    chunked over rows so the broadcast temporary stays tens of MB."""
    out = np.zeros((len(a64), len(cols64)), dtype=np.int64)
    if len(a64) == 0 or len(cols64) == 0:
        return out
    chunk = max(1, 2_000_000 // max(len(cols64), 1))
    for s_ in range(0, len(a64), chunk):
        blk = a64[s_ : s_ + chunk]
        d2 = ((blk[:, None, :] - cols64[None, :, :]) ** 2).sum(-1)
        out[s_ : s_ + chunk] = d2 <= r2
    return out


def outlier_reassign_mask_resident(
    dv: DeviceVerts,
    cleanup_idx: np.ndarray,
    ref_idx: np.ndarray,
    neighborhood_radius: float,
    min_neigbor_ratio: float,
) -> np.ndarray:
    """:func:`outlier_reassign_mask` with index-resident counts."""
    cleanup_idx = np.asarray(cleanup_idx, dtype=np.int64)
    if len(cleanup_idx) == 0:
        return np.zeros(0, dtype=bool)
    ref_counts, self_raw = count_pairs_resident(
        dv,
        [(cleanup_idx, np.asarray(ref_idx, np.int64)), (cleanup_idx, cleanup_idx)],
        neighborhood_radius,
    )
    return reassign_mask_from_counts(ref_counts, self_raw, min_neigbor_ratio)


# Above this many pairwise evaluations min_sqdist runs on the device
# (bucket-padded shapes keep the jit cache small; winning distances are
# recomputed exactly in f64 on the host).  Below it, the BLAS/gram and
# column-sweep host paths win because a dispatch costs ~30 ms over a
# tunneled backend.
_DEVICE_PAIR_THRESHOLD = int(os.environ.get("MMTPU_CCTA_DEVICE_PAIRS", 5_000_000))

# the native grid-DDA ray kernel beats the dense device Möller–Trumbore up
# to very large ray x face products (it skips empty space); only beyond
# this does the dense device batch win
_RAY_NATIVE_THRESHOLD = int(os.environ.get("MMTPU_CCTA_RAY_NATIVE_PAIRS", 1_000_000_000))


def _min_sqdist_device_start(a: np.ndarray, b: np.ndarray):
    """Dispatch half of :func:`_min_sqdist_device`: enqueues the chunked
    NN blocks and the packed pull WITHOUT blocking, so independent NN
    passes can share one tunnel round-trip window.  Resolve with
    :func:`_min_sqdist_device_finish`."""
    dtype = config.compute_dtype
    a64 = np.ascontiguousarray(a, dtype=np.float64).reshape(len(a), 3)
    b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(len(b), 3)
    # center to tighten the rounding band
    mid = 0.5 * (
        np.minimum(a64.min(axis=0), b64.min(axis=0))
        + np.maximum(a64.max(axis=0), b64.max(axis=0))
    )
    ac = a64 - mid
    bc = b64 - mid
    maxc = float(max(np.abs(ac).max(), np.abs(bc).max(), 1e-30))
    eps = float(np.finfo(np.dtype(dtype)).eps)

    m_pad = max(((len(bc) + 1023) // 1024) * 1024, 1024)
    b_padded = np.full((m_pad, 3), np.inf)
    b_padded[: len(bc)] = bc
    b_d = to_device(b_padded, dtype)

    handles = []
    for start in range(0, len(ac), _CHUNK):
        blk = ac[start : start + _CHUNK]
        n_pad = max(((len(blk) + 2047) // 2048) * 2048, 2048)
        blk_padded = np.zeros((n_pad, 3))
        blk_padded[: len(blk)] = blk
        handles.append(
            (start, len(blk), n_pad, _min_sqdist_block2(to_device(blk_padded, dtype, kind="rows"), b_d))
        )

    # one device-side concat across chunks, then ONE pull for both output
    # streams: the argmin row rides along VALUE-cast to the float dtype
    # (exact for indices < 2^24 in f32 / 2^53 in f64 — m_pad is far below
    # both), so the tunnel pays a single round-trip instead of two
    # serialized ones.  NOT a bitcast: int bit patterns below ~2^24 decode
    # as f32 DENORMALS, and the TPU output path flushes denormals to zero
    # — every argmin came back 0 (caught round 5 by the native-A/B
    # identity assertions, benchmarks/benchmark_native_ab.py; CPU runs
    # don't flush, so the CPU suite couldn't see it)
    if len(handles) > 1:
        ms_cat = jnp.concatenate([h[3][0] for h in handles], axis=1)
        g_cat = jnp.concatenate([h[3][1] for h in handles])
    else:
        ms_cat, g_cat = handles[0][3]
    itemsize = jnp.dtype(ms_cat.dtype).itemsize
    if itemsize >= 4:
        packed = jnp.concatenate(
            [ms_cat, g_cat.astype(ms_cat.dtype)[None, :]], axis=0
        )
        pulls = (packed,)
    else:  # sub-4-byte compute dtype cannot carry exact indices: two pulls
        pulls = (ms_cat, g_cat)
    for p in pulls:
        p.copy_to_host_async()  # stream back as compute finishes
    return (pulls, itemsize, handles, a64, b64, maxc, eps)


def _min_sqdist_device_finish(state):
    """Resolve half of :func:`_min_sqdist_device` — blocks on the packed
    pull, certifies the low-precision argmin, and repairs ambiguous rows
    exactly on the host."""
    pulls, itemsize, handles, a64, b64, maxc, eps = state
    if itemsize >= 4:
        flat = np.asarray(pulls[0])
        ms_all = flat[:2]
        g_all = flat[2].astype(np.int64)  # value-cast decode (exact)
    else:
        ms_all = np.asarray(pulls[0])
        g_all = np.asarray(pulls[1])

    args = np.empty(len(a64), dtype=np.int64)
    ambiguous = np.zeros(len(a64), dtype=bool)
    col = 0
    for start, n, n_pad, _h in handles:
        args[start : start + n] = g_all[col : col + n].astype(np.int64)
        m1 = ms_all[0, col : col + n].astype(np.float64)
        m2 = ms_all[1, col : col + n].astype(np.float64)
        band = (24.0 * np.sqrt(np.maximum(m1, 0.0)) * maxc + 10.0 * m1) * eps
        ambiguous[start : start + n] = (m2 - m1) <= band
        col += n_pad
    if ambiguous.any():
        _, exact_args = _min_sqdist_host(
            np.ascontiguousarray(a64[ambiguous]), b64
        )
        args[ambiguous] = exact_args
    mins = ((a64 - b64[args]) ** 2).sum(axis=1)
    return mins, args


def _min_sqdist_device(a: np.ndarray, b: np.ndarray):
    """Device nearest-neighbour pass: N chunked, M padded to a 1024 bucket
    with +inf sentinel rows.  Winning distances are recomputed exactly in
    f64, and rows whose best and runner-up candidates fall within the f32
    rounding band (a possible argmin flip vs the exact host scan) are
    re-picked entirely on the host — results match the host path for every
    input."""
    return _min_sqdist_device_finish(_min_sqdist_device_start(a, b))


def min_sqdist(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row min squared distance (and argmin) from a (N,3) to b (M,3)."""
    return _min_sqdist_finish(_min_sqdist_start(a, b))


def _min_sqdist_start(a: np.ndarray, b: np.ndarray):
    """Dispatch half of :func:`min_sqdist`: device-sized inputs enqueue
    without blocking; host-sized inputs compute eagerly (the host path has
    no round-trip to overlap).  Resolve with :func:`_min_sqdist_finish`."""
    if len(a) == 0 or len(b) == 0:
        return ("done", (np.full(len(a), np.inf), np.zeros(len(a), dtype=np.int64)))
    if len(a) * len(b) > _DEVICE_PAIR_THRESHOLD and len(b) > 128:
        return ("device", _min_sqdist_device_start(a, b))
    a64 = np.ascontiguousarray(a, dtype=np.float64).reshape(len(a), 3)
    b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(len(b), 3)
    return ("done", _min_sqdist_host(a64, b64))


def _min_sqdist_finish(state) -> Tuple[np.ndarray, np.ndarray]:
    if state[0] == "device":
        return _min_sqdist_device_finish(state[1])
    return state[1]


def _min_sqdist_host(a64: np.ndarray, b64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact f64 nearest neighbours (column sweep for small b, gram matmul
    with near-tie exact refinement otherwise)."""
    if len(b64) <= 128:
        if len(a64) * len(b64) >= 100_000:
            from ..io.native import min_sqdist_cols_native

            if (
                a64.flags["C_CONTIGUOUS"]
                and b64.flags["C_CONTIGUOUS"]
                and (res := min_sqdist_cols_native(a64, b64)) is not None
            ):
                return res
        # column sweep: temporaries stay [N]-sized (cache-resident),
        # strict < keeps the first j like argmin; all work lands in two
        # preallocated buffers so no iteration faults fresh pages
        ax, ay, az = a64[:, 0], a64[:, 1], a64[:, 2]
        best = np.full(len(a64), np.inf)
        args = np.zeros(len(a64), dtype=np.int64)
        d = np.empty(len(a64))
        t = np.empty(len(a64))
        for j in range(len(b64)):
            np.subtract(ax, b64[j, 0], out=d)
            np.multiply(d, d, out=d)
            np.subtract(ay, b64[j, 1], out=t)
            np.multiply(t, t, out=t)
            d += t
            np.subtract(az, b64[j, 2], out=t)
            np.multiply(t, t, out=t)
            d += t
            upd = d < best
            args[upd] = j
            best[upd] = d[upd]
        return best, args
    # gram form rides BLAS and keeps temporaries [chunk, M] instead of
    # [chunk, M, 3]; per-row offsets don't change the argmin, so the
    # combination is one fused pass; winning distances are recomputed
    # exactly afterwards
    sb = (b64 * b64).sum(axis=1)
    half_sb = 0.5 * sb
    bT = np.ascontiguousarray(b64.T)
    args = np.empty(len(a64), dtype=np.int64)
    scale = float(max(np.abs(sb).max(), 1.0))
    chunk = max(1, min(len(a64), 4_000_000 // max(len(b64), 1) + 1))
    for start in range(0, len(a64), chunk):
        blk = a64[start : start + chunk]
        dot = blk @ bT
        np.subtract(half_sb[None, :], dot, out=dot)
        am = dot.argmin(axis=1)
        # near-ties in the gram surrogate are re-resolved with exact
        # distances (first-wins like the reference's scan)
        two = np.partition(dot, 1, axis=1)[:, :2] if dot.shape[1] > 1 else None
        if two is not None:
            tied = (two[:, 1] - two[:, 0]) < 1e-9 * scale
            if tied.any():
                rows = np.nonzero(tied)[0]
                sub = blk[rows]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    + sb[None, :]
                    - 2.0 * (sub @ bT)
                )
                # 4 smallest candidate columns in ascending (value, column)
                # order — identical to stable argsort's first 4 (argmin is
                # first-wins on ties) but O(M) per pass instead of a full
                # row sort, which dominated on tie-heavy lattice meshes
                k = min(4, d2.shape[1])
                jj = np.empty((len(rows), k), dtype=np.int64)
                rr = np.arange(len(rows))
                for c in range(k):
                    jj[:, c] = d2.argmin(axis=1)
                    if c + 1 < k:
                        d2[rr, jj[:, c]] = np.inf
                exact = ((sub[:, None, :] - b64[jj]) ** 2).sum(-1)
                am[rows] = jj[rr, exact.argmin(axis=1)]
        args[start : start + chunk] = am
    mins = ((a64 - b64[args]) ** 2).sum(axis=1)
    return mins, args


def _count_within_radius_grid(a64, b64, radius):
    """Exact neighbor counting via a uniform cell grid (the numpy analog of
    the reference's R-tree, label/scale_coronary.rs): bucket b into
    radius-sized cells, gather each a-row's 27-cell candidates with
    searchsorted range arithmetic, and test the candidates exactly.
    Returns None when the grid would not pay off (degenerate radius,
    overflowing key space, or over-dense clustering)."""
    if radius <= 0:
        return None
    cell = radius
    ga = np.floor(a64 / cell).astype(np.int64)
    gb = np.floor(b64 / cell).astype(np.int64)
    mn = np.minimum(ga.min(axis=0), gb.min(axis=0)) - 1
    ga -= mn
    gb -= mn
    dims = np.maximum(ga.max(axis=0), gb.max(axis=0)) + 2
    if float(dims[0]) * float(dims[1]) * float(dims[2]) > 2**60:
        return None

    def enc(g):
        return (g[:, 0] * dims[1] + g[:, 1]) * dims[2] + g[:, 2]

    kb = enc(gb)
    b_order = np.argsort(kb, kind="stable")
    kb_sorted = kb[b_order]
    b_sorted = b64[b_order]
    sb = (b_sorted * b_sorted).sum(axis=1)

    ka = enc(ga)
    a_order = np.argsort(ka, kind="stable")
    ka_sorted = ka[a_order]
    cell_keys, cell_starts = np.unique(ka_sorted, return_index=True)
    cell_bounds = np.append(cell_starts, len(a64))

    # candidate b-ranges for every (occupied a-cell, neighbor offset) pair,
    # found with vectorized searchsorted; the exact test then runs as one
    # small gram matmul per occupied cell
    offsets = np.array(
        [
            (dx * dims[1] + dy) * dims[2] + dz
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ],
        dtype=np.int64,
    )
    q = cell_keys[:, None] + offsets[None, :]  # [C, 27]
    lo = np.searchsorted(kb_sorted, q.ravel(), side="left").reshape(q.shape)
    hi = np.searchsorted(kb_sorted, q.ravel(), side="right").reshape(q.shape)

    r2 = radius * radius
    counts = np.zeros(len(a64), dtype=np.int64)
    # strategy: per-cell gram matmuls when every cell's [points, candidates]
    # tile stays small; otherwise flat per-point ranges with bounded blocks
    # (dense self-counts on tubular clouds blow up the per-cell tiles)
    na_per_cell = np.diff(cell_bounds)
    cand_per_cell = (hi - lo).sum(axis=1)
    per_cell_ok = (
        len(cell_keys) <= 4096
        and int((na_per_cell * cand_per_cell).max()) <= 4_000_000
    )
    if per_cell_ok:
        # few occupied cells: one small gram matmul per cell
        for c in range(len(cell_keys)):
            spans = [
                np.arange(lo[c, k], hi[c, k]) for k in range(27) if hi[c, k] > lo[c, k]
            ]
            if not spans:
                continue
            cand = np.concatenate(spans)
            rows = a_order[cell_bounds[c] : cell_bounds[c + 1]]
            blk = a64[rows]
            d2 = (
                (blk * blk).sum(axis=1)[:, None]
                + sb[cand][None, :]
                - 2.0 * (blk @ b_sorted[cand].T)
            )
            # exact recheck of boundary-tolerance hits (gram rounding)
            near = np.abs(d2 - r2) < 1e-9 * max(r2, 1.0)
            if near.any():
                ii, jj = np.nonzero(near)
                d2[ii, jj] = ((blk[ii] - b_sorted[cand][jj]) ** 2).sum(axis=1)
            counts[rows] = (d2 <= r2).sum(axis=1)
        return counts

    # dense clouds: per-(a-cell, neighbor-offset) tiles — both operands are
    # contiguous runs of the cell-sorted arrays, so every tile is one small
    # gram matmul with no gather traffic; a-rows are sub-chunked to bound
    # tile size
    a_sorted = a64[a_order]
    sa_sorted = (a_sorted * a_sorted).sum(axis=1)
    counts_sorted = np.zeros(len(a64), dtype=np.int64)
    tol = 1e-9 * max(r2, 1.0)
    for c in range(len(cell_keys)):
        a_lo, a_hi = cell_bounds[c], cell_bounds[c + 1]
        for k in range(27):
            b_lo, b_hi = lo[c, k], hi[c, k]
            nb = b_hi - b_lo
            if nb <= 0:
                continue
            step = max(int(4_000_000 // max(nb, 1)), 1)
            bt = b_sorted[b_lo:b_hi]
            sbt = sb[b_lo:b_hi]
            for r0 in range(a_lo, a_hi, step):
                r1 = min(r0 + step, a_hi)
                blk = a_sorted[r0:r1]
                d2 = sa_sorted[r0:r1, None] + sbt[None, :] - 2.0 * (blk @ bt.T)
                near = np.abs(d2 - r2) < tol
                if near.any():
                    ii, jj = np.nonzero(near)
                    d2[ii, jj] = ((blk[ii] - bt[jj]) ** 2).sum(axis=1)
                counts_sorted[r0:r1] += (d2 <= r2).sum(axis=1)
    counts[a_order] = counts_sorted
    return counts


def _count_rows_exact_host(a64: np.ndarray, b64: np.ndarray, r2: float) -> np.ndarray:
    """Exact f64 neighbour counts (gram matmul + exact recheck of
    boundary-tolerance hits) for a typically-small row subset.

    Above ~2M raw pairs both sets are sorted along b's widest-spread axis
    and each a-chunk grams only the b window it can reach: any b outside
    [min_a - r - margin, max_a + r + margin] on that axis exceeds r along
    a single coordinate, so exclusion is exact (the margin covers the one
    rounding of ``min_a - r``; window membership compares unrounded f64)."""
    n, m = len(a64), len(b64)
    if n == 0 or m == 0:
        return np.zeros(n, dtype=np.int64)
    if n * m > 2_000_000:
        r = math.sqrt(r2)
        spread = b64.max(axis=0) - b64.min(axis=0)
        ax = int(np.argmax(spread))
        b_ord = np.argsort(b64[:, ax], kind="stable")
        bs = b64[b_ord]
        bz = np.ascontiguousarray(bs[:, ax])
        a_ord = np.argsort(a64[:, ax], kind="stable")
        a_sorted = a64[a_ord]
        az = a_sorted[:, ax]
        maxabs = max(float(np.abs(az).max()), float(np.abs(bz).max()))
        margin = 1e-9 * (maxabs + r) + 1e-300
        out_sorted = np.empty(n, dtype=np.int64)
        # small chunks keep each window narrow even when the flagged rows
        # scatter across the whole axis (797 scattered rows in 256-row
        # chunks each spanned ~1/3 of the axis; 32-row chunks span ~4%)
        chunk = 32
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            lo = int(np.searchsorted(bz, az[s] - r - margin, side="left"))
            hi = int(np.searchsorted(bz, az[e - 1] + r + margin, side="right"))
            out_sorted[s:e] = (
                _count_rows_exact_dense(a_sorted[s:e], bs[lo:hi], r2)
                if hi > lo
                else 0
            )
        out = np.empty(n, dtype=np.int64)
        out[a_ord] = out_sorted
        return out
    return _count_rows_exact_dense(a64, b64, r2)


def _count_rows_exact_dense(a64: np.ndarray, b64: np.ndarray, r2: float) -> np.ndarray:
    n, m = len(a64), len(b64)
    sb = (b64 * b64).sum(axis=1)
    bT = np.ascontiguousarray(b64.T)
    out = np.empty(n, dtype=np.int64)
    tol = 1e-9 * max(r2, 1.0)
    chunk = max(1, min(n, 4_000_000 // max(m, 1) + 1))
    for start in range(0, n, chunk):
        blk = a64[start : start + chunk]
        d2 = (blk * blk).sum(axis=1)[:, None] + sb[None, :] - 2.0 * (blk @ bT)
        near = np.abs(d2 - r2) < tol
        if near.any():
            ii, jj = np.nonzero(near)
            d2[ii, jj] = ((blk[ii] - b64[jj]) ** 2).sum(axis=1)
        out[start : start + chunk] = (d2 <= r2).sum(axis=1)
    return out


# device routing threshold for banded neighbour counting: the dispatch +
# tunnel latency (~30 ms) amortizes only on large pair products
_COUNT_DEVICE_PAIRS = int(os.environ.get("MMTPU_CCTA_COUNT_DEVICE_PAIRS", 50_000_000))


def _pow2_at_least(n: int, floor: int) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def _count_device_dispatch(a64, b64, radius, dtype):
    """Dispatch phase of the banded device neighbour count: enqueue every
    chunk's transfer + kernel, return the collect state.

    Axis-windowed prefilter (the R-tree spirit of label_coronary.rs on the
    device path): both sets are sorted along the widest-spread axis of b;
    the sorted b uploads ONCE, and each consecutive a-chunk sweeps only the
    fixed-width device window (lax.dynamic_slice) covering its axis band —
    one executable for every chunk.  Real points inside the fixed window
    but outside a chunk's true band sit beyond the near-band by the margin
    construction (margin > 3*band/(2r)), so counts are identical to the
    unfiltered sweep.  On vessel-like meshes this cuts the evaluated pair
    space ~3-20x; engages when the padded-window estimate shows >=1.5x
    reduction (MMTPU_CCTA_AXIS_BAND=0 disables)."""
    r2 = radius * radius
    # center to minimise the magnitude entering the low-precision square
    mid = 0.5 * (
        np.minimum(a64.min(axis=0), b64.min(axis=0))
        + np.maximum(a64.max(axis=0), b64.max(axis=0))
    )
    ac = a64 - mid
    bc = b64 - mid
    maxc = float(max(np.abs(ac).max(), np.abs(bc).max(), 1e-30))
    eps = float(np.finfo(np.dtype(dtype)).eps)
    # error through the rounded-input / diff / square / 3-sum chain at the
    # boundary |d| ~ radius is <= ~(6 r maxc + 2.5 r^2) eps; factor 4 margin
    band = (24.0 * radius * maxc + 10.0 * r2) * eps
    r2lo = jnp.asarray(r2 - band, dtype)
    r2hi = jnp.asarray(r2 + band, dtype)

    # --- axis-windowed plan --------------------------------------------------
    a_ord = None
    plan = None
    banded_enabled = os.environ.get("MMTPU_CCTA_AXIS_BAND", "1") != "0"
    # absolute floor: below ~1e10 raw pairs the plan's many smaller kernel
    # launches lose to the single overlapped full-sweep wave (measured on
    # label's 50k x 60k sets: windowed ~35% slower; at 160k x 160k it is
    # ~25% faster)
    min_pairs = float(os.environ.get("MMTPU_CCTA_AXIS_BAND_MIN_PAIRS", 1e10))
    if banded_enabled and len(a64) * len(b64) >= min_pairs and len(a64) and len(b64):
        spread = bc.max(axis=0) - bc.min(axis=0)
        ax = int(np.argmax(spread))
        b_ord = np.argsort(bc[:, ax], kind="stable")
        bs = bc[b_ord]
        bz = np.ascontiguousarray(bs[:, ax])
        a_ord_c = np.argsort(ac[:, ax], kind="stable")
        a_sorted = ac[a_ord_c]
        # adaptive chunk: at least ~8 chunks so each spans a narrow axis
        # window even on small clouds; a 1024-row floor bounds dispatches
        chunk = _COUNT_A_CHUNK_BANDED
        while chunk > 1024 and chunk * 8 > len(a64):
            chunk //= 2
        starts = np.arange(0, len(a64), chunk)
        ends = np.minimum(starts + chunk, len(a64))
        # margin: out-of-band points inside the fixed window must sit above
        # the near-band (needs > 3*band/(2r) of axis slack; factor 4 used)
        # plus the f64 centering/endpoint rounding
        margin = (
            2.0 * band / max(radius, 1e-30)
            + 64.0 * np.finfo(np.float64).eps * (maxc + radius)
        )
        z0 = a_sorted[starts, ax] - radius - margin
        z1 = a_sorted[ends - 1, ax] + radius + margin
        los = np.searchsorted(bz, z0, side="left")
        his = np.searchsorted(bz, z1, side="right")
        m_pad_full = _pow2_at_least(len(bc), 1024)
        w = min(_pow2_at_least(max(int((his - los).max()), 1), 1024), m_pad_full)
        n_pad = _pow2_at_least(int((ends - starts).max()), 1024)
        banded_pairs = len(starts) * n_pad * w
        full_pairs = len(a64) * m_pad_full
        if banded_pairs * 3 <= full_pairs * 2:
            a_ord = a_ord_c
            plan = (a_sorted, bs, starts, ends, los, n_pad, w, m_pad_full)

    handles = []
    if plan is not None:
        a_sorted, bs, starts, ends, los, n_pad, w, m_pad_full = plan
        # the axis-sorted b uploads once; every chunk shares one executable
        # (static n_pad / w / ch)
        b_pad = np.full((m_pad_full, 3), _FAR)
        b_pad[: len(bs)] = bs
        b_d = to_device(b_pad, dtype)
        ch = min(_COUNT_B_SLICE, w)
        for s, e, lo in zip(starts, ends, los):
            n = int(e - s)
            blk = a_sorted[s:e]
            if n < n_pad:
                pad = np.full((n_pad, 3), _FAR)
                pad[:n] = blk
                blk = pad
            handles.append(
                (int(s), n, n_pad,
                 _count_band_window_block(
                     to_device(blk, dtype, kind="rows"), b_d, jnp.asarray(int(lo)),
                     r2lo, r2hi, ch, w,
                 ))
            )
        return dict(
            a64=a64, b64=b64, radius=radius, r2=r2, handles=handles,
            a_ord=a_ord,
        )

    # --- full sweep (shared b upload) ---------------------------------------
    m_pad = _pow2_at_least(len(bc), 1024)
    ch = min(_COUNT_B_SLICE, m_pad)
    # finite far sentinel: keeps the gram-form d2 of padding rows/columns a
    # huge ordinary float (inf would feed 0*inf = nan into the dot)
    b_pad = np.full((m_pad, 3), _FAR)
    b_pad[: len(bc)] = bc
    b_d = to_device(b_pad, dtype)

    for start in range(0, len(a64), _COUNT_A_CHUNK):
        blk = ac[start : start + _COUNT_A_CHUNK]
        n = len(blk)
        n_pad = _pow2_at_least(n, 2048)
        if n < n_pad:
            pad = np.full((n_pad, 3), _FAR)
            pad[:n] = blk
            blk = pad
        handles.append(
            (start, n, n_pad,
             _count_band_window_block(
                 to_device(blk, dtype, kind="rows"), b_d, jnp.asarray(0),
                 r2lo, r2hi, ch, m_pad,
             ))
        )
    return dict(
        a64=a64, b64=b64, radius=radius, r2=r2, handles=handles, a_ord=None
    )


def _enqueue_wave_pull(states) -> None:
    """Enqueue the wave's device-side concat + d2h pull right behind the
    dispatches: over the tunnel a pull requested after compute completes
    pays a full round-trip, while one enqueued early streams back the
    moment the kernels finish.  Call after ALL of a wave's dispatches."""
    real = [st for st in states if st is not None]
    all_handles = [h for st in real for (_, _, _, h) in st["handles"]]
    if not all_handles:
        return
    stacked = (
        jnp.concatenate(all_handles, axis=0)
        if len(all_handles) > 1
        else all_handles[0]
    )
    try:
        stacked.copy_to_host_async()
    except Exception:
        pass
    for st in real:
        st["_wave_stack"] = (stacked, len(all_handles))


def _collect_device_counts(states) -> List[np.ndarray]:
    """Collect phase for one or more dispatch states: all chunk outputs are
    concatenated on the device and pulled in a single transfer (each pull
    over the tunnel costs a full round-trip), then banded rows are
    recounted exactly on the host."""
    all_handles = [h for st in states for (_, _, _, h) in st["handles"]]
    if not all_handles:
        return [np.zeros(0, dtype=np.int64) for _ in states]
    pre = states[0].get("_wave_stack") if states else None
    if pre is not None and pre[1] == len(all_handles) and all(
        st.get("_wave_stack") is not None and st["_wave_stack"][0] is pre[0]
        for st in states
    ):
        stacked = pre[0]  # enqueued (with its pull) at dispatch time
    elif len(all_handles) > 1:
        stacked = jnp.concatenate(all_handles, axis=0)
    else:
        stacked = all_handles[0]
    flat = np.asarray(stacked)  # packed int32 [sum of chunk pad widths]
    out: List[np.ndarray] = []
    col = 0
    for st in states:
        a64 = st["a64"]
        b64 = st["b64"]
        counts = np.empty(len(a64), dtype=np.int64)
        near_rows = np.zeros(len(a64), dtype=bool)
        for start, n, n_pad, _h in st["handles"]:
            packed = flat[col : col + n]
            counts[start : start + n] = (
                packed.astype(np.int64) & 0x7FFFFFFF
            )
            near_rows[start : start + n] = packed < 0
            col += n_pad
        a_ord = st.get("a_ord")
        if a_ord is not None:
            # banded plan worked in axis-sorted order: row i of the device
            # output is a64[a_ord[i]] — scatter back to original order
            unsorted_counts = np.empty_like(counts)
            unsorted_counts[a_ord] = counts
            counts = unsorted_counts
            unsorted_near = np.zeros_like(near_rows)
            unsorted_near[a_ord] = near_rows
            near_rows = unsorted_near
        if near_rows.any():
            # exact recount of flagged rows.  Tiny subsets go through one
            # direct gram matmul (`_count_rows_exact_host`); beyond a few
            # dozen flagged rows a cKDTree over b wins on this single-core
            # host (the windowed gram pays ~2 ms of Python per 32-row
            # chunk) — component-form f64 d^2 <= r^2, the same decision
            # the gram path's boundary recheck resolves to.  The tree is
            # kept on the state for callers with follow-up queries against
            # the same b side.
            sub = np.ascontiguousarray(a64[near_rows])
            if len(sub) * len(b64) > 2_000_000 and len(sub) > 64:
                tree = _b_side_tree(st)
                counts[near_rows] = tree.query_ball_point(
                    sub, st["radius"], return_length=True
                )
            elif len(sub) * len(b64) <= 64_000_000:
                counts[near_rows] = _count_rows_exact_host(sub, b64, st["r2"])
            else:
                grid = _count_within_radius_grid(sub, b64, st["radius"])
                counts[near_rows] = (
                    grid
                    if grid is not None
                    else _count_rows_exact_host(sub, b64, st["r2"])
                )
        out.append(counts)
    return out


def _b_side_tree(st):
    """Memoised cKDTree over a collect state's b-side cloud."""
    tree = st.get("b_tree")
    if tree is None:
        from scipy.spatial import cKDTree

        tree = cKDTree(st["b64"])
        st["b_tree"] = tree
    return tree


def _ball_hits_flat(tree, queries: np.ndarray, radius: float) -> np.ndarray:
    """Flat int64 array of all tree-point indices within ``radius`` of any
    query (cKDTree.query_ball_point decode shared by the membership and
    correction paths; closed-ball d <= r, the counting paths' decision)."""
    hits = tree.query_ball_point(np.asarray(queries, dtype=np.float64), radius)
    if len(hits) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate([np.asarray(h, dtype=np.int64) for h in hits])


def _count_device_collect(state) -> np.ndarray:
    return _collect_device_counts([state])[0]


def _count_within_radius_device(
    a64: np.ndarray, b64: np.ndarray, radius: float, dtype=None
) -> np.ndarray:
    """Banded device neighbour counting with exact-parity certification.

    The [N, M] distance/compare/sum pipeline runs on the accelerator in the
    compute dtype; pairs whose squared distance lands within a rigorous
    rounding-error band of r^2 flag their row, and flagged rows are recounted
    exactly in f64 on the host.  Counts are therefore identical to the host
    grid path (the R-tree analog, scale/label_coronary.rs) for every input.
    """
    if dtype is None:
        dtype = config.compute_dtype
    state = _count_device_dispatch(a64, b64, radius, dtype)
    _enqueue_wave_pull([state])
    return _count_device_collect(state)


def _count_device_eligible(a, b, radius) -> bool:
    return (
        len(a) * len(b) >= _COUNT_DEVICE_PAIRS
        and radius > 0
        and default_backend() == "tpu"
    )


def count_within_radius_multi(
    a: np.ndarray, targets: Sequence[np.ndarray], radius: float
) -> List[np.ndarray]:
    """Counts of ``a`` against several target sets in one dispatch wave:
    device-eligible targets enqueue all their work before any result is
    pulled, so the tunnel round-trip latency is paid once per wave instead
    of once per target."""
    return count_within_radius_pairs([(a, b) for b in targets], radius)


def count_within_radius_pairs(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]], radius: float
) -> List[np.ndarray]:
    """Counts for several independent (a, b) pairs in one dispatch wave —
    the per-pair generalisation of :func:`count_within_radius_multi`.
    Device-eligible pairs enqueue all their work before any result is
    pulled, so the tunnel round-trip latency is paid once per wave."""
    dtype = config.compute_dtype
    states: List[Optional[dict]] = []
    casts: List[Tuple[np.ndarray, np.ndarray]] = []
    for a, b in pairs:
        a64 = np.ascontiguousarray(a, dtype=np.float64).reshape(len(a), 3)
        b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(len(b), 3)
        casts.append((a64, b64))
        if (
            len(a64)
            and len(b64)
            and _count_device_eligible(a64, b64, radius)
            and np.isfinite(a64).all()
            and np.isfinite(b64).all()
        ):
            states.append(_count_device_dispatch(a64, b64, float(radius), dtype))
        else:
            states.append(None)
    _enqueue_wave_pull(states)
    device_counts = _collect_device_counts([st for st in states if st is not None])
    out: List[np.ndarray] = []
    di = 0
    for (a64, b64), st in zip(casts, states):
        if st is not None:
            out.append(device_counts[di])
            di += 1
        else:
            out.append(count_within_radius(a64, b64, radius))
    return out


def count_within_radius(a: np.ndarray, b: np.ndarray, radius: float) -> np.ndarray:
    """For each row of a, the number of rows of b with squared distance
    <= radius^2 (inclusive, matching rstar's locate_within_distance)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros(len(a), dtype=np.int64)
    r2 = radius * radius
    if len(a) * len(b) > 4_000_000:
        a64g = np.ascontiguousarray(a, dtype=np.float64).reshape(len(a), 3)
        b64g = np.ascontiguousarray(b, dtype=np.float64).reshape(len(b), 3)
        if (
            len(a) * len(b) >= _COUNT_DEVICE_PAIRS
            and radius > 0
            and np.isfinite(a64g).all()
            and np.isfinite(b64g).all()
            and default_backend() == "tpu"
        ):
            return _count_within_radius_device(a64g, b64g, float(radius))
        grid = _count_within_radius_grid(a64g, b64g, float(radius))
        if grid is not None:
            return grid
    # gram matmul with the same near-boundary component-form recheck as the
    # recount paths: the decision for pairs within rounding of the radius
    # is component f64 on EVERY path (rstar's locate_within_distance
    # semantics), so the public host path, the recount paths, and the
    # certified device paths can never disagree.  The >5e6-pair non-TPU
    # tail (grid refused: degenerate radius / overflowing keys /
    # over-dense clustering) lands here too — slower than the old
    # uncertified f32 block sweep, but a correctness fallback must be
    # exact.
    a64 = np.ascontiguousarray(a, dtype=np.float64).reshape(len(a), 3)
    b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(len(b), 3)
    return _count_rows_exact_dense(a64, b64, r2)


# ---------------------------------------------------------------------------
# labeling kernels
# ---------------------------------------------------------------------------

def _check_centerline_sorted(centerline: PyCenterline) -> np.ndarray:
    """Centerline positions sorted by descending z (label_coronary.rs:424-432)."""
    pos = centerline.positions()
    order = np.argsort(-pos[:, 2], kind="stable")
    return pos[order]


def centerline_bounded_mask(
    centerline: PyCenterline, pts: np.ndarray, radius: float
) -> np.ndarray:
    """bool[N]: point within ``radius`` of any centerline point (index core
    of find_centerline_bounded_points, label_coronary.rs:195-225)."""
    cl = _check_centerline_sorted(centerline)
    if len(pts) == 0 or len(cl) == 0:
        return np.zeros(len(pts), dtype=bool)
    d2, _ = min_sqdist(pts, cl)
    return d2 <= radius * radius


def find_centerline_bounded_points_simple(
    centerline: PyCenterline, points: Sequence[Coords3], radius: float
) -> List[Coords3]:
    """Points within ``radius`` of any centerline point.
    Parity: find_centerline_bounded_points (label_coronary.rs:195-225)."""
    pts = _as_array(points)
    keep = centerline_bounded_mask(centerline, pts, radius)
    if not keep.any():
        return []
    if isinstance(points, np.ndarray):
        return [tuple(row) for row in pts[keep].tolist()]
    return [tuple(p) for i, p in enumerate(points) if keep[i]]


def find_faces_near_points(
    vertices: Sequence[Coords3],
    faces: Sequence[Sequence[int]],
    points: Sequence[Coords3],
    tol: float = 1e-6,
):
    """Faces touching any vertex within ``tol`` of a query point; returned as
    vertex-coordinate triangles.  Parity: label_coronary.rs:233-277."""
    verts = np.ascontiguousarray(_as_array(vertices))
    pts = np.ascontiguousarray(_as_array(points))
    faces_arr = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
    if len(pts) == 0 or len(verts) == 0 or len(faces_arr) == 0:
        return []
    # Fast path: in the labeling pipeline the query points ARE mesh
    # vertices (exact copies), so a bit-pattern hash finds them in O(N);
    # only points without an exact twin fall back to the distance kernel.
    pts_keys = {tuple(row) for row in pts.view(np.uint64).reshape(-1, 3).tolist()}
    vert_keys = verts.view(np.uint64).reshape(-1, 3)
    matched = np.fromiter(
        (tuple(row) in pts_keys for row in vert_keys.tolist()),
        dtype=bool,
        count=len(verts),
    )
    exact_hits = {tuple(row) for row in verts[matched].view(np.uint64).reshape(-1, 3).tolist()}
    residual_mask = np.fromiter(
        (tuple(row) not in exact_hits for row in pts.view(np.uint64).reshape(-1, 3).tolist()),
        dtype=bool,
        count=len(pts),
    )
    residual = pts[residual_mask]
    if len(residual):
        d2, _ = min_sqdist(verts, residual)
        matched |= d2 <= tol * tol
    face_mask = matched[faces_arr].any(axis=1)
    vl = verts.tolist()
    out = []
    for a, b, c in faces_arr[face_mask].tolist():
        out.append((tuple(vl[a]), tuple(vl[b]), tuple(vl[c])))
    return out


@jax.jit
def _ray_triangle_hits(origins, directions, v0, v1, v2):
    """Batched Möller–Trumbore: t-values [R, F] (+inf where no hit).

    origins/directions: [R, 3]; v0/v1/v2: [F, 3].
    Parity: ray_triangle_intersection (label_coronary.rs:29-68).
    """
    eps = 1e-8
    edge1 = v1 - v0  # [F, 3]
    edge2 = v2 - v0
    h = jnp.cross(directions[:, None, :], edge2[None, :, :])  # [R, F, 3]
    a = (edge1[None] * h).sum(-1)  # [R, F]
    parallel = jnp.abs(a) < eps
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = origins[:, None, :] - v0[None, :, :]
    u = f * (s * h).sum(-1)
    q = jnp.cross(s, edge1[None, :, :])
    v = f * (directions[:, None, :] * q).sum(-1)
    t = f * (edge2[None] * q).sum(-1)
    valid = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    return jnp.where(valid, t, jnp.inf)


def _ray_triangle_hits_np(origins, directions, v0, v1, v2):
    """Host twin of _ray_triangle_hits for workloads too small to amortize
    a device dispatch (identical Moller-Trumbore semantics).  Written with
    componentwise cross products: np.cross on broadcast operands builds
    large strided temporaries that this class of host tolerates poorly."""
    eps = 1e-8
    e1 = v1 - v0  # [F, 3]
    e2 = v2 - v0

    def cross(ax, ay, az, bx, by, bz):
        return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx

    dx = directions[:, 0:1]
    dy = directions[:, 1:2]
    dz = directions[:, 2:3]
    hx, hy, hz = cross(dx, dy, dz, e2[None, :, 0], e2[None, :, 1], e2[None, :, 2])
    a = e1[None, :, 0] * hx + e1[None, :, 1] * hy + e1[None, :, 2] * hz  # [R, F]
    parallel = np.abs(a) < eps
    f = 1.0 / np.where(parallel, 1.0, a)
    sx = origins[:, 0:1] - v0[None, :, 0]
    sy = origins[:, 1:2] - v0[None, :, 1]
    sz = origins[:, 2:3] - v0[None, :, 2]
    u = f * (sx * hx + sy * hy + sz * hz)
    qx, qy, qz = cross(sx, sy, sz, e1[None, :, 0], e1[None, :, 1], e1[None, :, 2])
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2[None, :, 0] * qx + e2[None, :, 1] * qy + e2[None, :, 2] * qz)
    valid = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    return np.where(valid, t, np.inf)


def occlusion_remove_mask(
    centerline_coronary: PyCenterline,
    centerline_aorta: PyCenterline,
    range_coronary: int,
    pts: np.ndarray,
    tri: np.ndarray,
    step_size_mm: float,
    dv: "DeviceVerts" = None,
    pts_idx: np.ndarray = None,
) -> np.ndarray:
    """bool[N] mask core of the occlusion removal: True = intramural point
    to relabel.  pts: [N, 3]; tri: [F, 3, 3] face vertex coordinates.
    ``dv``/``pts_idx``: optional residency of the full vertex cloud + the
    indices of ``pts`` in it (the membership count then ships indices)."""
    if len(pts) == 0 or len(tri) == 0:
        return np.zeros(len(pts), dtype=bool)
    cl_cor = _check_centerline_sorted(centerline_coronary)
    cl_ao = _check_centerline_sorted(centerline_aorta)
    spacing = (centerline_aorta.mean_spacing() + centerline_coronary.mean_spacing()) / 2.0
    step_cl_points = max(int(math.ceil(step_size_mm / spacing)), 1)

    cor_targets = cl_cor[:range_coronary][::step_cl_points]
    if len(cor_targets) == 0 or len(cl_ao) == 0:
        return np.zeros(len(pts), dtype=bool)

    dtype = config.compute_dtype

    origins = np.repeat(cl_ao, len(cor_targets), axis=0)  # [R, 3]
    targets = np.tile(cor_targets, (len(cl_ao), 1))
    directions = targets - origins

    faces_to_exclude = set()
    native = None
    if len(origins) * len(tri) <= _RAY_NATIVE_THRESHOLD:
        from ..io.native import ray_occlusion_native

        native = ray_occlusion_native(origins, directions, tri.reshape(-1, 9))
    if native is not None:
        n_hits, closest_face = native
        faces_to_exclude.update(closest_face[n_hits >= 3].tolist())
    else:
        use_device = len(origins) * len(tri) > _RAY_NATIVE_THRESHOLD
        if use_device:
            # upload the triangle columns only on the device path — the
            # native path above never reads them, and the transfer is paid
            # over the ~15-30 MB/s tunnel
            v0 = to_device(tri[:, 0], dtype, kind="replicated")
            v1 = to_device(tri[:, 1], dtype, kind="replicated")
            v2 = to_device(tri[:, 2], dtype, kind="replicated")
        RAY_CHUNK = 4096 if use_device else max(1, 1_000_000 // max(len(tri), 1))
        for rs in range(0, len(origins), RAY_CHUNK):
            if use_device:
                t_vals = np.asarray(
                    _ray_triangle_hits(
                        to_device(origins[rs : rs + RAY_CHUNK], dtype, kind="rows"),
                        to_device(directions[rs : rs + RAY_CHUNK], dtype, kind="rows"),
                        v0,
                        v1,
                        v2,
                    )
                )
            else:
                t_vals = _ray_triangle_hits_np(
                    origins[rs : rs + RAY_CHUNK],
                    directions[rs : rs + RAY_CHUNK],
                    tri[:, 0], tri[:, 1], tri[:, 2],
                )
            n_hits = np.isfinite(t_vals).sum(axis=1)
            closest_face = np.argmin(t_vals, axis=1)
            faces_to_exclude.update(closest_face[n_hits >= 3].tolist())

    print(f"Total faces to exclude: {len(faces_to_exclude)}")

    DISTANCE_THRESHOLD = 0.5  # squared semantics, like the reference

    if faces_to_exclude:
        excluded_vertices = tri[sorted(faces_to_exclude)].reshape(-1, 3)
        # membership query, not a nearest-neighbour one.  A host cKDTree
        # over the region points queried BY the few excluded vertices wins
        # at clinical sizes — and it keeps the device queue free for the
        # island wave that overlaps this pass (count_pairs_resident here
        # serialized behind that wave's compute).  Same exact f64
        # d <= sqrt(0.5) decision as the counting paths.
        radius_t = math.sqrt(DISTANCE_THRESHOLD)
        # the forced-resident test override bypasses the size gate so the
        # membership branch stays exercisable on the CPU backend
        forced = os.environ.get("MMTPU_CCTA_RESIDENT") == "1"
        if (
            (forced or len(pts) > 400_000)
            and dv is not None
            and pts_idx is not None
            and _resident_eligible(dv, len(pts_idx), len(excluded_vertices), radius_t)
        ):
            (cnt,) = count_pairs_resident(
                dv, [(pts_idx, excluded_vertices)], radius_t
            )
            remove_mask = cnt > 0
        else:
            from scipy.spatial import cKDTree

            remove_mask = np.zeros(len(pts), dtype=bool)
            remove_mask[
                _ball_hits_flat(cKDTree(pts), excluded_vertices, radius_t)
            ] = True
    else:
        remove_mask = np.zeros(len(pts), dtype=bool)

    print(
        f"Excluded {len(faces_to_exclude)} faces, removed "
        f"{int(remove_mask.sum())} points (filtered from {len(pts)} to "
        f"{len(pts) - int(remove_mask.sum())} points)"
    )
    return remove_mask


def remove_occluded_points_ray_triangle(
    centerline_coronary: PyCenterline,
    centerline_aorta: PyCenterline,
    range_coronary: int,
    points: Sequence[Coords3],
    faces,
    step_size_mm: float,
) -> List[Coords3]:
    """Möller–Trumbore occlusion removal of intramural-course points.

    Rays run from every aorta centerline point to strided coronary
    centerline points; when a ray pierces >= 3 faces, the nearest face is
    excluded and all mesh points within 0.5 mm of its vertices are removed.
    Parity: label_coronary.rs:70-193 (rays batched as one device kernel).
    """
    pts = list(points)
    if not pts or not len(faces):
        return list(pts)
    tri = np.asarray(faces, dtype=np.float64).reshape(-1, 3, 3)
    remove_mask = occlusion_remove_mask(
        centerline_coronary, centerline_aorta, range_coronary,
        _as_array(pts), tri, step_size_mm,
    )
    return [tuple(p) for i, p in enumerate(pts) if not remove_mask[i]]


def _bits_key(p: Coords3) -> Tuple[int, int, int]:
    return (
        np.float64(p[0]).view(np.uint64).item(),
        np.float64(p[1]).view(np.uint64).item(),
        np.float64(p[2]).view(np.uint64).item(),
    )


def _bits_keys(arr: np.ndarray) -> np.ndarray:
    """(N,) structured view for exact-bit-pattern set operations."""
    a = np.ascontiguousarray(arr, dtype=np.float64).view(np.uint64).reshape(-1, 3)
    return np.ascontiguousarray(a).view([("x", np.uint64), ("y", np.uint64), ("z", np.uint64)]).reshape(-1)


def find_aortic_points(
    vertices: Sequence[Coords3],
    points_a: Sequence[Coords3],
    points_b: Sequence[Coords3],
) -> List[Coords3]:
    """Vertices present in neither set (exact bit-pattern difference).
    Parity: label_coronary.rs:291-306."""
    verts = _as_array(vertices)
    if len(verts) == 0:
        return []
    excluded = set()
    for group in (points_a, points_b):
        arr = _as_array(group)
        if len(arr):
            excluded.update(_bits_keys(arr).tolist())
    keys = _bits_keys(verts).tolist()
    return [tuple(v) for v, k in zip(vertices, keys) if k not in excluded]


def build_adjacency_map(faces) -> Dict[int, Set[int]]:
    """Vertex adjacency from faces, built from deduplicated edge keys in one
    numpy pass.  Parity: ccta_py.rs:502-520."""
    faces_arr = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
    if len(faces_arr) == 0:
        return {}
    e = np.concatenate(
        [faces_arr[:, [0, 1]], faces_arr[:, [1, 2]], faces_arr[:, [2, 0]]]
    )
    e = np.concatenate([e, e[:, ::-1]])
    n = int(e.max()) + 1
    keys = np.unique(e[:, 0] * n + e[:, 1])
    src = keys // n
    dst = keys % n
    uniq_src, idx_start = np.unique(src, return_index=True)
    bounds = np.append(idx_start, len(src))
    dst_list = dst.tolist()
    return {
        int(s): set(dst_list[bounds[i] : bounds[i + 1]])
        for i, s in enumerate(uniq_src.tolist())
    }


def smooth_mesh_labels(labels, adjacency_map, iterations: int):
    """Unanimous-majority label smoothing.  Parity: ccta_py.rs:718-758."""
    current = list(labels)
    n = len(current)
    for _ in range(iterations):
        nxt = list(current)
        for i in range(n):
            neighbors = adjacency_map.get(i)
            if not neighbors:
                continue
            counts: Dict[int, int] = {}
            for nb in neighbors:
                counts[current[nb]] = counts.get(current[nb], 0) + 1
            majority_label, max_count = max(counts.items(), key=lambda kv: kv[1])
            if max_count == len(neighbors) and current[i] != majority_label:
                nxt[i] = majority_label
        current = nxt
    return current


def fix_mesh_winding(faces):
    """Parity: ccta_py.rs:545-633 (see ccta.mesh.fix_faces_winding)."""
    return fix_faces_winding([list(f) for f in faces])


def reclassify_labels(labels: np.ndarray, faces) -> np.ndarray:
    """Vectorised adjacency label smoothing on an int label array
    (0=aorta, 1=rca, 2=lca, 3=rca_removed, 4=lca_removed).

    Logic A: a coronary vertex with zero same-label neighbours -> aorta.
    Logic B: a removed vertex whose same-side coronary neighbours exceed
    70% of its degree is restored.  Parity: label_coronary.rs:328-420,
    computed with per-vertex neighbour-label counts from the edge list
    instead of a per-vertex Python loop."""
    labels = np.asarray(labels, dtype=np.uint8)
    n = len(labels)
    faces_arr = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
    if n == 0 or len(faces_arr) == 0:
        return labels.copy()
    # unique UNDIRECTED edges — the sorted volume is half of deduping the
    # directed list (the adjacency SETS of the reference are symmetric, so
    # this is the same edge set).  Written to minimise fresh allocations:
    # this host's page-fault latency makes each big temporary cost real
    # time, so the three face-edge key thirds are filled into one buffer
    # and the dedup is an in-place sort + mask instead of np.unique
    nf = len(faces_arr)
    keys = np.empty(3 * nf, dtype=np.int64)
    for t, (i, j) in enumerate(((0, 1), (1, 2), (2, 0))):
        part = keys[t * nf : (t + 1) * nf]
        np.minimum(faces_arr[:, i], faces_arr[:, j], out=part)
        part *= n
        part += np.maximum(faces_arr[:, i], faces_arr[:, j])
    keys.sort(kind="quicksort")
    first = np.empty(len(keys), dtype=bool)
    first[0] = True
    np.not_equal(keys[1:], keys[:-1], out=first[1:])
    keys = keys[first]
    ka, kb = np.divmod(keys, n)
    ns = ka != kb  # self-edges from degenerate faces enter the set once
    kbn = kb[ns]
    kan = ka[ns]
    # per-vertex degree / neighbour-label counts without materialising the
    # doubled src/dst arrays: bincount each direction and sum
    deg = np.bincount(ka, minlength=n) + np.bincount(kbn, minlength=n)
    cnt1 = np.bincount(ka[labels[kb] == 1], minlength=n) + np.bincount(
        kbn[labels[kan] == 1], minlength=n
    )
    cnt2 = np.bincount(ka[labels[kb] == 2], minlength=n) + np.bincount(
        kbn[labels[kan] == 2], minlength=n
    )
    new_labels = labels.copy()
    has_nb = deg > 0
    new_labels[(labels == 1) & has_nb & (cnt1 == 0)] = 0
    new_labels[(labels == 2) & has_nb & (cnt2 == 0)] = 0
    new_labels[(labels == 3) & has_nb & (cnt1 > deg * 0.7)] = 1
    new_labels[(labels == 4) & has_nb & (cnt2 > deg * 0.7)] = 2
    return new_labels


def final_reclassification(
    vertices: Sequence[Coords3],
    faces,
    rca_points: Sequence[Coords3],
    lca_points: Sequence[Coords3],
    rca_removed_points: Sequence[Coords3],
    lca_removed_points: Sequence[Coords3],
):
    """Adjacency label smoothing: isolated coronary vertex -> aorta (Logic A);
    removed vertex with >70% coronary neighbours restored (Logic B).
    Parity: label_coronary.rs:328-420."""
    n_vertices = len(vertices)
    coord_to_idx: Dict[Tuple[int, int, int], int] = {}
    verts = _as_array(vertices)
    vert_keys = _bits_keys(verts).tolist() if n_vertices else []
    for i, k in enumerate(vert_keys):
        coord_to_idx[k] = i  # last wins, like the reference

    labels = np.zeros(n_vertices, dtype=np.uint8)
    for group, value in (
        (rca_points, 1),
        (lca_points, 2),
        (rca_removed_points, 3),
        (lca_removed_points, 4),
    ):
        arr = _as_array(group)
        if len(arr) == 0:
            continue
        for k in _bits_keys(arr).tolist():
            idx = coord_to_idx.get(k)
            if idx is not None:
                labels[idx] = value

    new_labels = reclassify_labels(labels, faces)

    buckets: List[List[Coords3]] = [[], [], [], [], []]
    for i, label in enumerate(new_labels):
        buckets[label].append(tuple(verts[i]))
    return tuple(buckets)


def reassign_mask_from_counts(
    ref_counts: np.ndarray, self_raw: np.ndarray, min_ratio: float
) -> np.ndarray:
    """Density-ratio decision of the outlier absorption, given the two
    neighbour counts (self_raw includes the point itself)."""
    self_counts = np.maximum(self_raw - 1, 0)
    total = ref_counts + self_counts
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(total > 0, ref_counts / np.maximum(total, 1), 0.0)
    return (total > 0) & (ratio >= min_ratio)


def outlier_reassign_mask(
    cleanup_arr: np.ndarray,
    ref_arr: np.ndarray,
    neighborhood_radius: float,
    min_neigbor_ratio: float,
) -> np.ndarray:
    """bool[N] core of the density-based outlier absorption: True = point
    reassigned into the reference set (scale_coronary.rs:341-404)."""
    if len(cleanup_arr) == 0:
        return np.zeros(0, dtype=bool)
    ref_counts, self_raw = count_within_radius_multi(
        cleanup_arr, [ref_arr, cleanup_arr], neighborhood_radius
    )
    return reassign_mask_from_counts(ref_counts, self_raw, min_neigbor_ratio)


def clean_outlier_points(
    points_to_cleanup: Sequence[Coords3],
    reference_points: Sequence[Coords3],
    neighborhood_radius: float,
    min_neigbor_ratio: float,
):
    """Density-based outlier absorption into the reference set.
    Parity: clean_up_non_section_points (scale_coronary.rs:341-404)."""
    cleanup = list(points_to_cleanup)
    reassigned = [tuple(p) for p in reference_points]
    if not cleanup:
        return [], reassigned
    move = outlier_reassign_mask(
        _as_array(cleanup), _as_array(reference_points),
        neighborhood_radius, min_neigbor_ratio,
    )
    cleaned = [tuple(p) for i, p in enumerate(cleanup) if not move[i]]
    reassigned.extend(tuple(p) for i, p in enumerate(cleanup) if move[i])
    return cleaned, reassigned


def cl_region_split_masks(
    centerline: PyCenterline,
    frames: Sequence[PyFrame],
    pts: np.ndarray,
    dv: "DeviceVerts" = None,
    pts_idx: np.ndarray = None,
):
    """(proximal, distal, between) bool[N] masks — vectorised core of the
    region partition (scale_coronary.rs:263-312) incl. the two outlier
    absorption passes.  ``dv``/``pts_idx``: optional device residency of the
    full vertex cloud + the indices of ``pts`` in it, letting the two
    absorption counts ship indices instead of coordinates."""
    centroids = np.array([f.centroid for f in frames], dtype=np.float64)
    zdiffs = np.abs(np.diff(centroids[:, 2]))
    cumulative = float(zdiffs.sum() / (len(frames) - 1)) if len(frames) > 1 else 0.0

    cl_pos = centerline.positions()
    cl_frame_idx = np.array(
        [p.contour_point.frame_index for p in centerline.points], dtype=np.int64
    )

    d2, _ = min_sqdist(cl_pos, centroids)
    in_range = np.unique(cl_frame_idx[d2 <= cumulative * cumulative])

    _, nearest_cl = min_sqdist(pts, cl_pos)
    between = np.isin(cl_frame_idx[nearest_cl], in_range)

    dist_ref = centroids[-1]
    above = (pts > dist_ref[None, :]).all(axis=1)
    proximal = ~between & above
    distal = ~between & ~above

    resident = dv is not None and pts_idx is not None
    if resident and _resident_eligible(
        dv, max(len(pts), 1), max(int(between.sum()), 1), 1.0
    ):
        # both chained passes in one device round-trip; exact by the same
        # certification + host-re-decision construction
        move_p, move_d = fused_absorb_resident(
            dv, pts_idx[proximal], pts_idx[distal], pts_idx[between], 1.0, 0.6
        )
        if move_p.any():
            moved = np.nonzero(proximal)[0][move_p]
            proximal[moved] = False
            between[moved] = True
        if move_d.any():
            moved = np.nonzero(distal)[0][move_d]
            distal[moved] = False
            between[moved] = True
        return proximal, distal, between

    def _absorb(cleanup_m, ref_m):
        if resident:
            return outlier_reassign_mask_resident(
                dv, pts_idx[cleanup_m], pts_idx[ref_m], 1.0, 0.6
            )
        return outlier_reassign_mask(pts[cleanup_m], pts[ref_m], 1.0, 0.6)

    move = _absorb(proximal, between)
    if move.any():
        moved = np.nonzero(proximal)[0][move]
        proximal[moved] = False
        between[moved] = True
    move = _absorb(distal, between)
    if move.any():
        moved = np.nonzero(distal)[0][move]
        distal[moved] = False
        between[moved] = True
    return proximal, distal, between


def find_points_by_cl_region(
    centerline: PyCenterline,
    frames: Sequence[PyFrame],
    points: Sequence[Coords3],
):
    """Partition mesh points into proximal / distal / between regions
    relative to the frames' extent along the centerline.
    Parity: find_points_by_cl_region_rs (scale_coronary.rs:263-312)."""
    pts = _as_array(points)
    prox, dist, between = cl_region_split_masks(centerline, frames, pts)
    as_tuples = [tuple(p) for p in points]
    proximal = [p for p, m in zip(as_tuples, prox) if m]
    distal = [p for p, m in zip(as_tuples, dist) if m]
    btw = [p for p, m in zip(as_tuples, between) if m]
    return proximal, distal, btw


# ---------------------------------------------------------------------------
# morphing / scaling kernels
# ---------------------------------------------------------------------------

def adjust_diameter_centerline_morphing_simple(
    centerline: PyCenterline,
    points: Sequence[Coords3],
    diameter_adjustment_mm: float,
) -> List[Coords3]:
    """Move each point along its nearest-centerline radial direction.
    Parity: centerline_based_diameter_morphing (scale_coronary.rs:218-243)."""
    pts = _as_array(points)
    if len(pts) == 0:
        return []
    cl_pos = centerline.positions()
    moved = _morph_points(pts, cl_pos, diameter_adjustment_mm)
    return [tuple(p) for p in moved]


def _morph_points(pts: np.ndarray, cl_pos: np.ndarray, adjustment: float) -> np.ndarray:
    _, nearest = min_sqdist(pts, cl_pos)
    return _morph_points_from_nn(pts, cl_pos, nearest, adjustment)


def _morph_points_from_nn(
    pts: np.ndarray, cl_pos: np.ndarray, nearest: np.ndarray, adjustment: float
) -> np.ndarray:
    """:func:`_morph_points` with the nearest-centerline pass precomputed —
    the NN argmin is independent of ``adjustment``, so callers can dispatch
    it early (overlapping the scaling sweeps) and apply the identical
    per-element expression tree here."""
    rel = pts - cl_pos[nearest]
    norms = np.linalg.norm(rel, axis=1)
    ok = norms > 0.0
    scale = np.where(ok, adjustment / np.where(ok, norms, 1.0), 0.0)
    return pts + rel * scale[:, None]


def _symmetric_nn_distance(a: np.ndarray, b: np.ndarray) -> float:
    """RMS of symmetric mean nearest-neighbour squared distances.
    Parity: scale_coronary.rs:188-216."""
    if len(a) == 0 or len(b) == 0:
        return float("inf")
    d_ab, _ = min_sqdist(a, b)
    d_ba, _ = min_sqdist(b, a)
    return float(math.sqrt((d_ab.mean() + d_ba.mean()) / 2.0))


@jax.jit
def _sweep_cost_table(points, unit, pmask, reference, rmask, xs):
    """Symmetric-NN cost of every morph candidate in one fused program.

    points/unit: [N, 3] (padded); pmask [N]; reference [M, 3] (padded);
    rmask [M]; xs [K].  Returns [K] RMS symmetric mean-NN distances —
    the whole reference grid sweep (scale_coronary.rs:65-130) as a single
    device launch instead of 2K nearest-neighbour passes.
    """
    inf = jnp.asarray(jnp.inf, points.dtype)
    n_p = jnp.maximum(pmask.sum(), 1)
    n_r = jnp.maximum(rmask.sum(), 1)

    def cost(k):
        moved = points + unit * xs[k]
        d2 = ((moved[:, None, :] - reference[None, :, :]) ** 2).sum(-1)  # [N, M]
        fwd = jnp.where(rmask[None, :], d2, inf).min(axis=1)  # moved -> ref
        bwd = jnp.where(pmask[:, None], d2, inf).min(axis=0)  # ref -> moved
        fwd_mean = jnp.where(pmask, fwd, 0.0).sum() / n_p
        bwd_mean = jnp.where(rmask, bwd, 0.0).sum() / n_r
        return jnp.sqrt((fwd_mean + bwd_mean) / 2.0)

    return lax.map(cost, jnp.arange(xs.shape[0]))


def _pad_rows(arr: np.ndarray, quantum: int):
    """Pad rows to a multiple of ``quantum`` (bucketed shapes keep the jit
    cache small); returns (padded, mask)."""
    n = len(arr)
    target = max(((n + quantum - 1) // quantum) * quantum, quantum)
    mask = np.zeros(target, dtype=bool)
    mask[:n] = True
    if target == n:
        return arr, mask
    out = np.zeros((target,) + arr.shape[1:], dtype=arr.dtype)
    out[:n] = arr
    return out, mask


def _sweep_start(points: np.ndarray, reference: np.ndarray, cl_pos: np.ndarray):
    """Dispatch half of :func:`_grid_sweep_scaling`: for device-sized
    inputs the cost-table launch is enqueued here and NOT pulled, so
    callers can overlap several sweeps' tunnel round-trips (the scale
    stage runs three independent sweeps).  Returns an opaque state for
    :func:`_sweep_finish`."""
    start, end, step = -2.0, 2.0, 0.1
    steps = int(round((end - start) / step))
    if len(points) == 0 or len(reference) == 0:
        # degenerate inputs: every candidate cost is inf — propagate the
        # sentinel like the host scan's never-firing strict < (the device
        # argmin would silently return xs[0] = -2.0)
        return ("inf",)
    # the nearest-centerline direction is scaling-invariant: precompute once
    _, nearest = min_sqdist(points, cl_pos)
    rel = points - cl_pos[nearest]
    norms = np.linalg.norm(rel, axis=1)
    ok = norms > 0.0
    unit = np.where(ok[:, None], rel / np.where(ok, norms, 1.0)[:, None], 0.0)
    xs = start + step * np.arange(steps + 1)

    if len(points) * len(reference) >= _SWEEP_DEVICE_PAIRS:
        dtype = config.compute_dtype
        pts_p, pmask = _pad_rows(np.ascontiguousarray(points), 2048)
        unit_p, _ = _pad_rows(np.ascontiguousarray(unit), 2048)
        ref_p, rmask = _pad_rows(np.ascontiguousarray(reference), 256)
        # one batched pytree transfer: each device_put call pays a fixed
        # dispatch cost over the tunneled backend, so six separate uploads
        # cost ~6x one
        np_dtype = np.dtype(dtype)
        operands = jax.device_put(
            (
                pts_p.astype(np_dtype), unit_p.astype(np_dtype), pmask,
                ref_p.astype(np_dtype), rmask, xs.astype(np_dtype),
            )
        )
        handle = _sweep_cost_table(*operands)
        handle.copy_to_host_async()  # stream back as compute finishes
        return ("device", handle, xs, points, unit, reference)
    return ("host", xs, points, unit, reference)


def _sweep_finish(state) -> float:
    """Resolve half of :func:`_grid_sweep_scaling` — pulls the device cost
    table (or runs the host scan) and re-evaluates the winner exactly."""
    if state[0] == "inf":
        return float("inf")
    if state[0] == "device":
        _, handle, xs, points, unit, reference = state
        costs = np.asarray(handle, dtype=np.float64)
        # certify the low-precision argmin: any candidate whose device cost
        # sits within the rounding band of the minimum is re-evaluated
        # exactly in f64; the true argmin is provably among them and the
        # strict-less first-wins scan below reproduces the host selection
        cmin = float(costs.min())
        band = 2.0 * cmin * 1e-4 + 1e-12
        cand = np.nonzero(costs <= cmin + band)[0]
        iter_xs = [float(xs[k]) for k in cand.tolist()]
    else:
        _, xs, points, unit, reference = state
        iter_xs = xs.tolist()
    best_x = float("inf")
    min_dist = float("inf")
    for x in iter_xs:
        moved = points + unit * x
        dist = _symmetric_nn_distance(reference, moved)
        if dist < min_dist:
            min_dist = dist
            best_x = x
    return best_x


def _grid_sweep_scaling(points: np.ndarray, reference: np.ndarray, cl_pos: np.ndarray) -> float:
    """Sweep x in [-2, 2] step 0.1 of the morphing and keep the x minimising
    the symmetric NN distance (strictly-less, first wins).
    Parity: scale_coronary.rs:65-130 — the candidate axis and both NN
    directions run as one batched device launch."""
    return _sweep_finish(_sweep_start(points, reference, cl_pos))


def find_proximal_distal_scaling(
    anomalous_points: Sequence[Coords3],
    n_proximal: int,
    n_distal: int,
    centerline: PyCenterline,
    proximal_reference: Sequence[Coords3],
    distal_reference: Sequence[Coords3],
) -> Tuple[float, float]:
    """Optimal morphing scalings for the proximal/distal anomalous-segment
    ends.  Parity: centerline_based_diameter_optimization
    (scale_coronary.rs:90-131)."""
    anomalous = _as_array(anomalous_points)
    prox_ref = _as_array(proximal_reference)
    dist_ref = _as_array(distal_reference)
    cl_pos = centerline.positions()

    # the NN pass is row-independent, so the distal pick's distances are
    # computed over the FULL anomalous set and restricted to the remaining
    # rows after the pull — exact, and it lets both device launches (and
    # later both sweep launches) share one tunnel round-trip window
    # instead of serializing four round-trips
    prox_live = len(anomalous) and len(prox_ref) and n_proximal
    dist_live = len(anomalous) and len(dist_ref) and n_distal
    h_prox = _min_sqdist_start(anomalous, prox_ref) if prox_live else None
    h_dist = _min_sqdist_start(anomalous, dist_ref) if dist_live else None

    if prox_live:
        d2_prox, _ = _min_sqdist_finish(h_prox)
        prox_pts, keep = _region_pick_from_d2(anomalous, d2_prox, n_proximal)
        remaining_rows = ~keep
    else:
        prox_pts = np.zeros((0, 3))
        remaining_rows = np.ones(len(anomalous), dtype=bool)
    if dist_live and remaining_rows.any():
        d2_dist, _ = _min_sqdist_finish(h_dist)
        dist_pts, _ = _region_pick_from_d2(
            anomalous[remaining_rows], d2_dist[remaining_rows], n_distal
        )
    else:
        dist_pts = np.zeros((0, 3))

    s_prox = _sweep_start(prox_pts, prox_ref, cl_pos)
    s_dist = _sweep_start(dist_pts, dist_ref, cl_pos)
    return _sweep_finish(s_prox), _sweep_finish(s_dist)


def _region_pick_from_d2(arr: np.ndarray, d2: np.ndarray, n_points: int):
    """:func:`_find_region_points` selection from precomputed distances:
    n closest rows (distance, then index — the reference's stable order),
    plus the selected-row mask."""
    order = np.lexsort((np.arange(len(d2)), d2))
    take = min(n_points, len(arr))
    selected = order[:take]
    mask = np.zeros(len(arr), dtype=bool)
    mask[selected] = True
    return arr[selected], mask


def _find_region_points(anomalous: np.ndarray, reference: np.ndarray, n_points: int):
    """n closest anomalous points to the reference set (stable ordering).
    Parity: find_region_points (scale_coronary.rs:133-183)."""
    if len(anomalous) == 0 or len(reference) == 0 or n_points == 0:
        return np.zeros((0, 3)), anomalous
    d2, _ = min_sqdist(anomalous, reference)
    order = np.lexsort((np.arange(len(d2)), d2))  # distance, then index
    take = min(n_points, len(anomalous))
    selected = order[:take]
    mask = np.zeros(len(anomalous), dtype=bool)
    mask[selected] = True
    return anomalous[selected], anomalous[~mask]


def find_aortic_scaling(
    intramural_points: Sequence[Coords3],
    reference_points: Sequence[Coords3],
    centerline: PyCenterline,
) -> float:
    """Grid sweep of the aortic morphing.  Parity:
    centerline_based_aortic_diameter_optimization (scale_coronary.rs:65-88)."""
    return _sweep_finish(find_aortic_scaling_start(
        intramural_points, reference_points, centerline
    ))


def find_aortic_scaling_start(
    intramural_points: Sequence[Coords3],
    reference_points: Sequence[Coords3],
    centerline: PyCenterline,
):
    """Dispatch half of :func:`find_aortic_scaling` (resolve with
    :func:`find_aortic_scaling_finish`) — lets the scale stage overlap the
    aortic sweep with the proximal/distal passes."""
    return _sweep_start(
        _as_array(intramural_points), _as_array(reference_points), centerline.positions()
    )


def find_aortic_scaling_finish(state) -> float:
    return _sweep_finish(state)


def find_aortic_wall_scaling(
    centerline: PyCenterline,
    ref_pt_coronary: Coords3,
    aortic_pts: Sequence[Coords3],
) -> float:
    """Closed-form projection of (ref - closest aortic point) onto the
    cl->ref unit direction, clamped at 0.
    Parity: centerline_based_wall_diameter_optimization
    (scale_coronary.rs:8-63)."""
    cl_pos = centerline.positions()
    aortic = _as_array(aortic_pts)
    if len(cl_pos) == 0 or len(aortic) == 0:
        return 0.0
    ref = np.asarray(ref_pt_coronary, dtype=np.float64)
    closest_cl = cl_pos[int(np.argmin(((cl_pos - ref) ** 2).sum(-1)))]
    closest_aortic = aortic[int(np.argmin(((aortic - ref) ** 2).sum(-1)))]
    vector = ref - closest_cl
    norm = float(np.linalg.norm(vector))
    if norm == 0.0:
        return 0.0
    unit = vector / norm
    t = float(np.dot(ref - closest_aortic, unit))
    return max(t, 0.0)


# ---------------------------------------------------------------------------
# discretization
# ---------------------------------------------------------------------------

def _branch_data(centerline: PyCenterline, branch_id: int):
    idx = np.nonzero(centerline.branch_ids() == branch_id)[0]
    pos = centerline.positions()[idx]
    tangents = centerline.tangents()[idx]
    radii = centerline.radii()[idx]
    return pos, tangents, radii


def walk_centerline_slices(
    centerline: PyCenterline,
    points: Sequence[Coords3],
    branch_id: int,
    step_size: float,
) -> List[PyContour]:
    """Uniform arc-length anchors -> Voronoi point assignment -> plane
    projection.  Parity: projecting.rs:13-117 (Voronoi assignment is a single
    batched argmin over anchors)."""
    pos, tangents, radii = _branch_data(centerline, branch_id)
    if len(pos) == 0:
        return []

    seg = np.sqrt(((pos[1:] - pos[:-1]) ** 2).sum(-1))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = float(cum[-1])

    sample_positions = []
    s = 0.0
    while s <= total + 1e-9:
        sample_positions.append(s)
        s += step_size
    if sample_positions and sample_positions[-1] > total + 1e-6:
        sample_positions[-1] = total

    anchors_pos = []
    anchors_tan = []
    for k, target in enumerate(sample_positions):
        segi = int(np.searchsorted(cum, target, side="right")) - 1
        segi = max(segi, 0)
        if segi >= len(pos) - 1:
            anchors_pos.append(pos[-1])
            anchors_tan.append(tangents[-1])
            continue
        s0, s1 = cum[segi], cum[segi + 1]
        t = 0.0 if abs(s1 - s0) < 1e-12 else (target - s0) / (s1 - s0)
        anchors_pos.append(pos[segi] + t * (pos[segi + 1] - pos[segi]))
        tangent = tangents[segi] * (1.0 - t) + tangents[segi + 1] * t
        tn = float(np.linalg.norm(tangent))
        anchors_tan.append(tangent / tn if tn > 1e-12 else tangent)
    anchors_pos = np.array(anchors_pos)
    anchors_tan = np.array(anchors_tan)

    pts = _as_array(points)
    contours: List[PyContour] = []
    if len(pts):
        _, assignment = min_sqdist(pts, anchors_pos)
        rel = pts - anchors_pos[assignment]
        n = anchors_tan[assignment]
        proj = pts - n * (rel * n).sum(-1)[:, None]
    for k in range(len(anchors_pos)):
        if len(pts):
            sel = proj[assignment == k]
        else:
            sel = np.zeros((0, 3))
        contours.append(
            PyContour.from_arrays(
                k,
                k,
                sel,
                tuple(anchors_pos[k]),
                np.full(len(sel), k, dtype=np.int64),
                np.arange(len(sel), dtype=np.int64),
                None,
                None,
                None,
                "Lumen",
            )
        )
    return contours


def _local_basis(pts: np.ndarray, centroid: np.ndarray):
    """Parity: resampling.rs:188-212."""
    rel = pts - centroid
    norms = np.linalg.norm(rel, axis=1)
    candidates = np.nonzero(norms > 1e-10)[0]
    if len(candidates) == 0:
        return None
    axis_u = rel[candidates[0]] / norms[candidates[0]]
    cross = np.cross(axis_u, rel)
    cross_norms = np.linalg.norm(cross, axis=1)
    second = np.nonzero(cross_norms > 1e-10)[0]
    if len(second) == 0:
        return None
    normal = cross[second[0]] / cross_norms[second[0]]
    axis_v = np.cross(normal, axis_u)
    axis_v /= np.linalg.norm(axis_v)
    return axis_u, axis_v


def _has_full_angular_coverage(contour: PyContour) -> bool:
    """Parity: resampling.rs:38-65."""
    pts = contour.xyz_view()
    if len(pts) < 4 or contour.centroid is None:
        return False
    centroid = np.asarray(contour.centroid)
    basis = _local_basis(pts, centroid)
    if basis is None:
        return False
    axis_u, axis_v = basis
    rel = pts - centroid
    pu = rel @ axis_u
    pv = rel @ axis_v
    quadrants = {(bool(u), bool(v)) for u, v in zip(pu >= 0.0, pv >= 0.0)}
    return len(quadrants) == 4


def _resample_spline(contour: PyContour, n_points: int) -> Optional[PyContour]:
    """Closed Catmull-Rom refit to n evenly spaced points (vectorised).
    Parity: resampling.rs:68-185."""
    if n_points < 2 or contour.n_points < 3 or contour.centroid is None:
        return None
    pts = contour.xyz_view()
    centroid = np.asarray(contour.centroid)
    basis = _local_basis(pts, centroid)
    if basis is None:
        return None
    axis_u, axis_v = basis
    rel = pts - centroid
    angles = np.arctan2(rel @ axis_v, rel @ axis_u)
    ctrl = pts[np.argsort(angles, kind="stable")]

    SAMPLES_PER_SEG = 32
    m = len(ctrl)
    prev = np.roll(ctrl, 1, axis=0)
    curr = ctrl
    nxt = np.roll(ctrl, -1, axis=0)
    after = np.roll(ctrl, -2, axis=0)
    t = (np.arange(SAMPLES_PER_SEG) / SAMPLES_PER_SEG)[None, :, None]
    t2 = t * t
    t3 = t2 * t
    curve = 0.5 * (
        2.0 * curr[:, None, :]
        + (nxt - prev)[:, None, :] * t
        + (2.0 * prev - 5.0 * curr + 4.0 * nxt - after)[:, None, :] * t2
        + (-prev + 3.0 * curr - 3.0 * nxt + after)[:, None, :] * t3
    ).reshape(m * SAMPLES_PER_SEG, 3)
    curve = np.concatenate([curve, curve[:1]], axis=0)

    seglen = np.linalg.norm(curve[1:] - curve[:-1], axis=1)
    arc = np.concatenate([[0.0], np.cumsum(seglen)])
    total = float(arc[-1])
    if total < 1e-10:
        return None

    step = total / n_points
    targets = np.arange(n_points) * step
    # Rust partition_point(|s| s < target) = first idx with arc >= target
    seg = np.clip(np.searchsorted(arc, targets, side="left") - 1, 0, len(curve) - 2)
    s0 = arc[seg]
    s1 = arc[seg + 1]
    denom = s1 - s0
    frac = np.where(np.abs(denom) < 1e-12, 0.0, (targets - s0) / np.where(denom == 0, 1, denom))
    resampled = curve[seg] * (1.0 - frac)[:, None] + curve[seg + 1] * frac[:, None]

    return PyContour.from_arrays(
        contour.id,
        contour.original_frame,
        resampled,
        contour.centroid,
        np.full(n_points, contour.id, dtype=np.int64),
        np.arange(n_points, dtype=np.int64),
        None,
        None,
        None,
        contour.kind,
    )


def create_uniform_contours(contours: List[PyContour], n_points: int) -> List[PyContour]:
    """Parity: resampling.rs:11-35."""
    non_empty = [c for c in contours if c.n_points > 0]
    coverage = [_has_full_angular_coverage(c) for c in non_empty]
    start = next((i for i, ok in enumerate(coverage) if ok), 0)
    end = next((i + 1 for i in range(len(coverage) - 1, -1, -1) if coverage[i]), len(non_empty))
    out = []
    for c in non_empty[start:end]:
        resampled = _resample_spline(c, n_points)
        if resampled is not None:
            out.append(resampled)
    return out


def discretize_vessel(
    centerline: PyCenterline,
    points: Sequence[Coords3],
    branch_id: int = 0,
    step_size: float = 0.5,
    n_points: int = 20,
) -> List[PyContour]:
    """Walk + Voronoi + coverage filter + Catmull-Rom resample.
    Parity: discretize_vessel_rs (ccta_py.rs:669-686)."""
    slices = walk_centerline_slices(centerline, points, branch_id, step_size)
    return create_uniform_contours(slices, n_points)


def discretize_vessel_tree(
    ao_cl: PyCenterline,
    rca_cl: PyCenterline,
    lca_cl: PyCenterline,
    points_ao,
    points_rca_main,
    points_lca_main,
    side_branches_rca,
    side_branches_lca,
    branch_id_rca: int = 0,
    branch_id_lca: int = 0,
    step_size: float = 1.0,
    n_points: int = 100,
    calculate_ref_pts: bool = True,
):
    """Smooth the three centerlines (sigma = 2.5), discretize mains + side
    branches, compute reference triplets.
    Parity: vessel_tree.rs:18-99 + ccta_py.rs discretize_vessel_tree."""
    from ..models.centerline import smooth_centerline
    from ..models.vessel_tree import PyDiscretizedVesselTree

    ao = smooth_centerline(ao_cl, 2.5)
    rca = smooth_centerline(rca_cl, 2.5)
    lca = smooth_centerline(lca_cl, 2.5)

    tree = PyDiscretizedVesselTree(
        discretized_aorta=discretize_vessel(ao, points_ao, 0, step_size, n_points),
        discretized_rca_main=discretize_vessel(
            rca, points_rca_main, branch_id_rca, step_size, n_points
        ),
        discretized_lca_main=discretize_vessel(
            lca, points_lca_main, branch_id_lca, step_size, n_points
        ),
        spacing=step_size,
        rca_branches=[
            discretize_vessel(rca, pts, i + 1, step_size, n_points)
            for i, pts in enumerate(side_branches_rca)
        ],
        lca_branches=[
            discretize_vessel(lca, pts, i + 1, step_size, n_points)
            for i, pts in enumerate(side_branches_lca)
        ],
    )
    if calculate_ref_pts:
        tree = tree.calculate_ref_pts()
    return tree
