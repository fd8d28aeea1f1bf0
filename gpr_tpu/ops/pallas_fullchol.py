"""Whole-factorization left-looking Cholesky in ONE pallas dispatch.

This is the round-3 attack on the ~19 ms of XLA "machinery" (custom-call
dispatch, dynamic-update-slices, layout copies, fusion glue) that per-op
trace anatomy shows around the recursive blocked schedule's math ops
(BENCHMARKS.md round-2/3 sections).  Every previously measured rewrite
kept XLA as the orchestrator and lost; this kernel removes the
orchestrator: the ENTIRE factorization — panel updates, diagonal factor,
panel solve, output assembly — is one `pallas_call`, so there are no
dispatch boundaries, no DUS, no branch-boundary copies, and HBM traffic
is exactly the algorithmic minimum of a left-looking schedule.

It is the TPU-native replacement for the reference's LAPACK dpotrf path
(reference include/LAPACKUtils.h:59-73, invoked from the O(n^3) inversion
at lib/GaussianProcess.cpp:530-618).

Schedule (panel width p, grid step j = one block column of p columns):

  1. DMA the panel strip A[:, jp:(j+1)p] HBM->VMEM (32 MB at n=16k).
  2. Zero the strict-upper chunks (rows < jp) and stream them out — they
     overlap the update loop below.
  3. Left-looking update: P[c] -= L[c, k] @ L[j, k]^T for every factored
     panel k < j and row chunk c >= j, streaming the (p, p) L tiles from
     HBM with double-buffered async DMA.  The k-major order makes each
     segment's first tile (c == j) the row block R_k, whose bf16 hi/lo
     split is parked and reused across the segment.  Dots run the
     numerics core's f32-grade 'high' tier via the explicit bf16x3
     emulation (Mosaic only exposes DEFAULT and HIGHEST).
  4. Factor the (p, p) diagonal block in VMEM — blocked strip
     factorization (ops/pallas_panel._strip_factor) that also yields
     W = inv(L_jj) — and stream it out.
  5. Panel solve: L21 chunk = P[c] @ W^T as ONE bf16x3 GEMM per chunk
     (the MAGMA TRSM-via-TRTRI scheme; numerically safe because the
     diagonal blocks are Schur blocks of a jitter-guarded SPD matrix,
     cond(L_jj) <= sqrt(cond(A))), streamed out as computed.
  6. Drain the output DMAs (they must land before step j+1 reads
     column j back as update operands).

Grid steps execute sequentially on the TensorCore (dimension_semantics
'arbitrary'), so step j+1 sees every byte step j wrote.

HBM traffic: reads = the panel strips (n^2/2 once) + streamed L tiles
(~n^3/(6p) bytes — 5.7 GB at n=16k/p=512, ~7 ms at 819 GB/s, fully
overlapped with the ~22 ms of MXU work); writes = the factor once.

Failure semantics match `lax.linalg.cholesky`: a non-positive pivot
produces NaN which propagates through W and every later panel to the
last diagonal entry, so `linalg._diag_ok` detects it in O(1).

Input contract: potrf('L') — only the LOWER triangle of A is read
(diagonal blocks are mirrored in-kernel); the strict upper of the result
is exactly zero.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_panel import _strip_factor, _inv_upper

_HI = jax.lax.Precision.HIGHEST


def _default_diag_scheme() -> str:
    """Diagonal-factor scheme when the caller passes ``diag_scheme=None``.

    'stat2' is the round-5 measured winner (paired on-chip slope A/Bs at
    n=16k, gram mode, block=128/sw=32/c1g1): stat 30.95 / **stat2
    29.08** / stat2+sw64 29.8 — the stat scheme with pivot PAIRS fused
    into one rank-2 elimination (~5-6 dependent stages per two pivots vs
    8; see ``_strip_factor_static2``).  Round-4 ladder at the older
    config: strip 35.6 / rv 35.0 / head 35.5 / stat 33.4.  'strip' is
    the round-3 config; 'aug' (augmented heads) measured equal to strip
    after its Mosaic iota-slice abort was fixed — all stay as opt-ins.

    NOTE: the env var is resolved HERE, in the non-jitted entry wrappers,
    so it is honored per-call — but a jit cache keyed on the resolved
    scheme means flipping the var mid-process gives a fresh compile, not a
    silent no-op (ADVICE.md round 3)."""
    return os.environ.get("GPR_FUSED_DIAG", "stat2")


def _rem2(i):
    # literal 2 in the loop-index dtype (x64 mode would promote to int64)
    return jax.lax.rem(i, jnp.asarray(2, i.dtype))
_NT = (((1,), (1,)), ((), ()))  # contract last with last: X @ Y^T
_NN = (((1,), (0,)), ((), ()))  # plain X @ Y


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=a.dtype, precision=_HI
    )


def _mirror_lower(S, b):
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    low = jnp.where(rows >= cols, S, 0.0)
    strict = jnp.where(rows > cols, S, 0.0)
    return low + strict.T


def _aug_head_factor(T, sw):
    """Cholesky-Gauss elimination of the augmented tile ``T = [H | I]``
    ((sw, 2sw), H SPD): returns (U, R) with H = U^T U (upper) and
    R = inv(U^T) = inv(L) (lower).

    Scaling row r by rsqrt(pivot) then eliminating below makes the left
    half L^T and tracks M = L^{-1} in the right half (M H = L^T).  The
    serial dependency chain runs on the (sw, 2sw) tile only — the wide
    (sw, b) strip never enters it (cf. pallas_panel._strip_factor, whose
    per-row reductions span the full b lanes).

    Mosaic note: every intermediate stays (sw, 2sw)-shaped.  The original
    formulation extracted the pivot column/row as (sw, 1)/(1, 2sw) masked
    reductions, which ABORTS the chip inside Mosaic's relayout machinery
    (`Check failed: limits[i] <= dim(i) (2 vs. 1)`, BENCH_r03 postmortem;
    reproduced at n=1024 by benchmarks/chip_smoke.py fused_*_aug).  The
    broadcast column/row are instead produced by one-hot MATMULS:
    T @ R_r gives T[:, r] replicated across all 2sw lanes, P_r @ T gives
    row r replicated down all sw sublanes — full-tile ops end to end."""
    two = 2 * sw
    rows = jax.lax.broadcasted_iota(jnp.int32, (sw, two), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sw, two), 1)
    rows_sq = jax.lax.broadcasted_iota(jnp.int32, (two, two), 0)
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 1)
    for r in range(sw):
        # R_r (2sw, 2sw): row r all-ones => (T @ R_r)[i, k] = T[i, r]
        Rr = jnp.where(rows_sq == r, jnp.ones((), T.dtype), 0.0)
        cvec = _dot(T, Rr, _NN)  # (sw, 2sw), column r broadcast over lanes
        # P_r (sw, sw): column r all-ones => (P_r @ T)[i, k] = T[r, k]
        Pr = jnp.where(cols_p == r, jnp.ones((), T.dtype), 0.0)
        rvec = _dot(Pr, T, _NN)  # (sw, 2sw), row r broadcast over sublanes
        pivot = jnp.sum(jnp.where((rows == r) & (cols == r), T, 0.0))
        s = jax.lax.rsqrt(pivot)
        u1 = rvec * s
        T = jnp.where(
            rows == r, u1, jnp.where(rows > r, T - (cvec * s) * u1, T)
        )
    # (sw, sw) masks built as FRESH iotas — slicing the (sw, 2sw) iota
    # (`rows[:, :sw]`) is the construct that aborts Mosaic's relayout
    # (`Check failed: limits[i] <= dim(i) (2 vs. 1)`; micro-bisected
    # round 4: value slices are fine, iota slices are not)
    sq_r = jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 0)
    sq_c = jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 1)
    U = jnp.where(sq_r <= sq_c, T[:, :sw], 0.0)
    R = jnp.where(sq_r >= sq_c, T[:, sw:], 0.0)
    return U, R


def _triu_inv_rec(U, b):
    """inv(U) for upper-triangular (b, b) U by recursive doubling — ZERO
    serial pivot chain (the replaced ``pallas_panel._inv_upper`` sweep ran
    b serial back-substitution rows; at ~0.85 us per serial row that
    sweep was ~half the measured 13.9 ms diagonal-factor cost at n=16k).

    Level m: D holds the inverses of all m-blocks (block-diagonal).  For
    each 2m-block [[A, C], [0, B]], inv = [[A^-1, -A^-1 C B^-1], [0,
    B^-1]]; all sibling products at a level are computed AT ONCE by two
    full-tile masked GEMMs (D C D is nonzero exactly at the C positions).
    log2(b) levels x 2 HIGHEST dots — pure MXU work.

    Base case: 1-blocks, D0 = diag(1/U_ii)."""
    if b & (b - 1):
        # the even/odd sibling pairing at each doubling level is only
        # correct when every level tiles the matrix exactly; a
        # non-power-of-two b would silently produce a wrong inverse
        raise ValueError(f"_triu_inv_rec: block size {b} must be a power of two")
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = rows == cols
    D = jnp.where(eye, 1.0 / jnp.where(eye, U, 1.0), 0.0)
    m = 1
    while m < b:
        rb = rows // m
        cb = cols // m
        cmask = jnp.logical_and(rb % 2 == 0, cb == rb + 1)
        C = jnp.where(cmask, U, 0.0)
        P = _dot(_dot(D, C, _NN), D, _NN)
        D = D - jnp.where(cmask, P, 0.0)
        m *= 2
    return D


def _strip_factor_static(A, b, sw):
    """U = chol(A)^T for a (b, b) SPD tile VALUE — pallas_panel's strip
    scheme with the outer strip loop PYTHON-UNROLLED so every mask,
    one-hot gather, and lane select is a compile-time CONSTANT.  The
    fori_loop version re-derives each mask from the traced strip index
    every iteration (~6 dependent vector ops per serial pivot measured
    ~0.85 us at n=16k — the dominant cost of the fused kernel's diagonal
    factor); constants take mask generation off the serial chain."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    sub_s = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)
    e_rows = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)
    e_cols = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1)

    for jb in range(b // sw):
        j0 = jb * sw  # python int: every comparison below is vs a constant
        E = (e_rows == e_cols + j0).astype(A.dtype)  # (b, sw) one-hot
        strip = jax.lax.dot_general(
            E, A, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b)
        # Critical serial chain per pivot (4 dependent stages): masked
        # reduce -> reciprocal -> scaled outer product -> subtract.  The
        # scaled factor row u = row * rsqrt(pivot) feeds ONLY the deferred
        # row accumulator U_acc (nothing downstream depends on it), so the
        # rsqrt and the row placement sit OFF the chain; the elimination
        # uses raw row/column with 1/pivot.
        U_acc = jnp.zeros_like(strip)
        for r in range(sw):
            j = j0 + r
            row = strip[r : r + 1, :]  # static slice
            onej = (lane_s == j).astype(A.dtype)
            rowm = row * (lane_s >= j).astype(A.dtype)
            pivot = jnp.sum(row * onej)
            c = jnp.sum(strip * onej, axis=1, keepdims=True)  # (sw, 1) raw
            strip = strip - (
                (c * (sub_s > r).astype(A.dtype)) / pivot
            ) * rowm
            u = rowm * jax.lax.rsqrt(pivot)  # off-chain
            U_acc = U_acc + u * (sub_s == r).astype(A.dtype)
        strip = U_acc
        in_strip = jnp.logical_and(row_ids >= j0, row_ids < j0 + sw)
        strip_full = jax.lax.dot_general(
            E, strip, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        A = jnp.where(in_strip, strip_full, A)
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())),
            preferred_element_type=A.dtype, precision=_HI,
        )
        A = jnp.where(row_ids >= j0 + sw, A - upd, A)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.where(row_ids <= cols_b, A, 0.0)


def _strip_factor_static2(A, b, sw):
    """``_strip_factor_static`` with PIVOT PAIRS fused: one rank-2
    elimination per two pivots (classic block-2 Gaussian elimination).

    The stat scheme's serial chain is ~4 dependent vector stages per
    pivot (reduce -> reciprocal -> scale -> subtract); n pivots is
    inherent to Cholesky, but two pivots share one reduce stage and one
    combined rank-2 subtract:

      stage 1  c1 = S e_j, c2raw = S e_{j+1}      (parallel masked reduces)
      stage 2  inv1 = 1/p1                         (p1 = c1[r] static slice)
      stage 3  l = a*inv1;  p2 = p2raw - a^2*inv1;
               row2' = row2 - l*row1;  c2' = c2raw - l*c1
      stage 4  inv2 = 1/p2;  t1 = (c1*inv1)*row1m
      stage 5  S -= mask*(t1 + (c2'*inv2)*row2'm)

    ~5-6 dependent stages per TWO pivots vs 8 — measured on v5e (round
    5): the diagonal-factor residue drops from the stat scheme's 3.44 ms
    (n=16k, diag-ablation delta).  The rsqrt factor-row emissions stay
    off-chain exactly as in stat.  Requires even ``sw``."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    sub_s = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)
    e_rows = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)
    e_cols = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1)
    if sw % 2:
        raise ValueError(f"_strip_factor_static2: sw ({sw}) must be even")

    for jb in range(b // sw):
        j0 = jb * sw
        E = (e_rows == e_cols + j0).astype(A.dtype)  # (b, sw) one-hot
        strip = jax.lax.dot_general(
            E, A, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b)
        U_acc = jnp.zeros_like(strip)
        for r in range(0, sw, 2):
            j, j2 = j0 + r, j0 + r + 1
            one1 = (lane_s == j).astype(A.dtype)
            one2 = (lane_s == j2).astype(A.dtype)
            m1 = (lane_s >= j).astype(A.dtype)
            m2 = (lane_s >= j2).astype(A.dtype)
            below = (sub_s > r + 1).astype(A.dtype)
            # stage 1: both pivot columns in parallel masked reduces
            c1 = jnp.sum(strip * one1, axis=1, keepdims=True)  # (sw, 1)
            c2raw = jnp.sum(strip * one2, axis=1, keepdims=True)
            p1 = c1[r : r + 1, :]           # (1, 1) static slices
            a = c1[r + 1 : r + 2, :]        # A[j2, j] (symmetry)
            p2raw = c2raw[r + 1 : r + 2, :]
            row1 = strip[r : r + 1, :]
            row2 = strip[r + 1 : r + 2, :]
            # stage 2
            inv1 = 1.0 / p1
            # stage 3: eliminate pivot j from the (j+1) row/column/pivot
            l21 = a * inv1
            p2 = p2raw - a * a * inv1
            row2e = row2 - l21 * row1
            c2 = c2raw - l21 * c1
            # stages 4-5: combined rank-2 elimination of rows > r+1
            inv2 = 1.0 / p2
            t = (c1 * inv1) * (row1 * m1) + (c2 * inv2) * (row2e * m2)
            strip = strip - below * t
            # off-chain factor-row emissions
            u1 = (row1 * m1) * jax.lax.rsqrt(p1)
            u2 = (row2e * m2) * jax.lax.rsqrt(p2)
            U_acc = (
                U_acc
                + u1 * (sub_s == r).astype(A.dtype)
                + u2 * (sub_s == r + 1).astype(A.dtype)
            )
        strip = U_acc
        in_strip = jnp.logical_and(row_ids >= j0, row_ids < j0 + sw)
        strip_full = jax.lax.dot_general(
            E, strip, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        A = jnp.where(in_strip, strip_full, A)
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())),
            preferred_element_type=A.dtype, precision=_HI,
        )
        A = jnp.where(row_ids >= j0 + sw, A - upd, A)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.where(row_ids <= cols_b, A, 0.0)


def _strip_factor_static2p(A, b, sw):
    """``_strip_factor_static2`` with the pair COLUMN EXTRACTIONS
    software-pipelined: pair k extracts pair k+1's raw columns from the
    pre-update strip (off the serial chain, parallel with k's own
    stages) and corrects them with k's two rank-1 terms using SCALAR
    row entries — so pair k+1's chain starts at the reciprocal, not the
    reduce (~4 dependent stages per pair vs stat2's 5).  Extra VPU work:
    two column corrections + four masked scalar extracts per pair."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    sub_s = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)
    e_rows = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)
    e_cols = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1)
    if sw % 2:
        raise ValueError(f"_strip_factor_static2p: sw ({sw}) must be even")

    for jb in range(b // sw):
        j0 = jb * sw
        E = (e_rows == e_cols + j0).astype(A.dtype)
        strip = jax.lax.dot_general(
            E, A, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b)
        U_acc = jnp.zeros_like(strip)
        carried = None  # corrected (c1, c2raw) for the current pair
        for r in range(0, sw, 2):
            j, j2 = j0 + r, j0 + r + 1
            one1 = (lane_s == j).astype(A.dtype)
            one2 = (lane_s == j2).astype(A.dtype)
            m1 = (lane_s >= j).astype(A.dtype)
            m2 = (lane_s >= j2).astype(A.dtype)
            below = (sub_s > r + 1).astype(A.dtype)
            if carried is None:
                c1 = jnp.sum(strip * one1, axis=1, keepdims=True)
                c2raw = jnp.sum(strip * one2, axis=1, keepdims=True)
            else:
                c1, c2raw = carried
            p1 = c1[r : r + 1, :]
            a = c1[r + 1 : r + 2, :]
            p2raw = c2raw[r + 1 : r + 2, :]
            row1 = strip[r : r + 1, :]
            row2 = strip[r + 1 : r + 2, :]
            inv1 = 1.0 / p1
            l21 = a * inv1
            p2 = p2raw - a * a * inv1
            row2e = row2 - l21 * row1
            c2 = c2raw - l21 * c1
            inv2 = 1.0 / p2
            w1 = c1 * inv1
            w2 = c2 * inv2
            if r + 2 < sw:
                jn1, jn2 = j0 + r + 2, j0 + r + 3
                on1 = (lane_s == jn1).astype(A.dtype)
                on2 = (lane_s == jn2).astype(A.dtype)
                # raw next-pair columns from the PRE-update strip: these
                # reduces depend only on the previous pair's update, so
                # they overlap this pair's serial stages
                n1raw = jnp.sum(strip * on1, axis=1, keepdims=True)
                n2raw = jnp.sum(strip * on2, axis=1, keepdims=True)
                # this pair's rank-2 contribution to those columns via
                # SCALAR row entries (static (1,1) lane slices)
                r1a = row1[:, jn1 : jn1 + 1]
                r1b = row1[:, jn2 : jn2 + 1]
                r2a = row2e[:, jn1 : jn1 + 1]
                r2b = row2e[:, jn2 : jn2 + 1]
                nb_mask = (sub_s > r + 1).astype(A.dtype)
                carried = (
                    n1raw - nb_mask * (w1 * r1a + w2 * r2a),
                    n2raw - nb_mask * (w1 * r1b + w2 * r2b),
                )
            t = w1 * (row1 * m1) + w2 * (row2e * m2)
            strip = strip - below * t
            u1 = (row1 * m1) * jax.lax.rsqrt(p1)
            u2 = (row2e * m2) * jax.lax.rsqrt(p2)
            U_acc = (
                U_acc
                + u1 * (sub_s == r).astype(A.dtype)
                + u2 * (sub_s == r + 1).astype(A.dtype)
            )
        strip = U_acc
        in_strip = jnp.logical_and(row_ids >= j0, row_ids < j0 + sw)
        strip_full = jax.lax.dot_general(
            E, strip, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        A = jnp.where(in_strip, strip_full, A)
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())),
            preferred_element_type=A.dtype, precision=_HI,
        )
        A = jnp.where(row_ids >= j0 + sw, A - upd, A)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.where(row_ids <= cols_b, A, 0.0)


def _head_strip_factor(A, b, sw):
    """U = chol(A)^T via head-GEMM strips: only the (sw, sw) HEAD of each
    strip is eliminated serially — per-pivot lane reductions span sw=16
    lanes instead of b=256 (the strip scheme's reduces over b lanes are
    ~8 shuffle steps each and dominate the measured ~0.85 us/pivot) — and
    the wide strip is produced by ONE GEMM against the head's recursive-
    doubling inverse (zero extra serial work):

      S    = strip rows (one-hot GEMM gather)
      H    = S E (the sw x sw head)
      U16  = serial elimination of H on (sw, sw) tiles, static masks
      R    = inv(U16)            (``_triu_inv_rec``, log2(sw) dot levels)
      strip= R^T S  (= inv(L16) S)  masked to the factor's support
      A   -= strip^T strip below  (unchanged trailing update)
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    e_rows = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)
    e_cols = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, sw), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)
    strip_cols = jax.lax.broadcasted_iota(jnp.int32, (sw, b), 1)
    strip_rows = jax.lax.broadcasted_iota(jnp.int32, (sw, b), 0)

    for jb in range(b // sw):
        j0 = jb * sw
        E = (e_rows == e_cols + j0).astype(A.dtype)  # (b, sw) one-hot
        S = jax.lax.dot_general(
            E, A, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b)
        H = jax.lax.dot_general(
            S, E, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, sw), symmetric
        for r in range(sw):
            hrow = H[r : r + 1, :]  # (1, sw) static slice
            oner = (lane16 == r).astype(A.dtype)
            pivot = jnp.sum(hrow * oner)
            inv = jax.lax.rsqrt(pivot)
            u = (hrow * inv) * (lane16 >= r).astype(A.dtype)
            c = jnp.sum(H * oner, axis=1, keepdims=True) * inv  # (sw, 1)
            H = H - (c * (sub16 > r).astype(A.dtype)) * u
            keep = (sub16 != r).astype(A.dtype)
            H = H * keep + u * (1.0 - keep)
        # H now holds U16 (upper);  R = inv(U16) via pure-GEMM doubling
        R = _triu_inv_rec(H, sw)
        # factored strip rows: inv(L16) S = R^T S
        strip = jax.lax.dot_general(
            R, S, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b)
        # support mask: cols >= j0, head part upper-triangular
        keep = jnp.logical_and(
            strip_cols >= j0, strip_cols - j0 >= strip_rows
        )
        strip = jnp.where(keep, strip, 0.0)
        in_strip = jnp.logical_and(row_ids >= j0, row_ids < j0 + sw)
        strip_full = jax.lax.dot_general(
            E, strip, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        A = jnp.where(in_strip, strip_full, A)
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())),
            preferred_element_type=A.dtype, precision=_HI,
        )
        A = jnp.where(row_ids >= j0 + sw, A - upd, A)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.where(row_ids <= cols_b, A, 0.0)


def _strip_factor_wi(A, b, sw):
    """(U, V) of one (b, b) SPD tile VALUE: A = U^T U, V = inv(U).

    sw-strip schedule where each strip's serial elimination happens on the
    augmented (sw, 2sw) head only (``_aug_head_factor``); the wide strip,
    the trailing update, and the running inverse are GEMMs:

      S       = rows j0..j0+sw of the updated A            (gather GEMM)
      H       = S[:, j0:j0+sw]                             (gather GEMM)
      U16, R  = aug-factor of [H | I]
      U strip = R @ S   (columns >= j0; == inv(L16) [H B])
      A      -= strip^T strip  (rows below, as before)
      V rows  = [-R (G Vl), R]  with G = L[strip, :j0]     (2 GEMMs)

    Returns upper U and upper V with V = inv(U); inv(L) = V^T."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    strip_rows = jax.lax.broadcasted_iota(jnp.int32, (sw, b), 0)
    strip_cols = jax.lax.broadcasted_iota(jnp.int32, (sw, b), 1)
    eye16 = (
        jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 1)
    ).astype(A.dtype)

    def body(jb, state):
        A, Vl = state  # A: factored strips so far (rows < j0) + updated rest
        j0 = jb * sw
        # E (b, sw): one-hot columns selecting rows/cols j0..j0+sw
        E = (
            jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)
            == j0 + jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1)
        ).astype(A.dtype)
        S = jax.lax.dot_general(
            E, A, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b) strip rows
        H = jax.lax.dot_general(
            S, E, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, sw) head
        U16, R = _aug_head_factor(
            jnp.concatenate([H, eye16], axis=1), sw
        )
        strip = jax.lax.dot_general(
            R, S, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        del U16  # R @ S reproduces the head to HIGHEST-tier roundoff
        # zero outside the factor's support: columns < j0, and the
        # strict-lower of the head block (roundoff junk from R @ S)
        keep = jnp.logical_and(
            strip_cols >= j0, strip_cols - j0 >= strip_rows
        )
        strip = jnp.where(keep, strip, 0.0)
        # trailing update (rows below the strip)
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())),
            preferred_element_type=A.dtype, precision=_HI,
        )
        in_strip = jnp.logical_and(row_ids >= j0, row_ids < j0 + sw)
        strip_full = jax.lax.dot_general(
            E, strip, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        A = jnp.where(in_strip, strip_full, A)
        A = jnp.where(row_ids >= j0 + sw, A - upd, A)
        # running inverse rows: Vl[strip] = [-R (G Vl), 0] + R at cols j0..
        # G = L[strip, :j0] = U[:j0, strip]^T, gathered from factored A
        G = jax.lax.dot_general(
            E, A, (((0,), (1,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b): G[r, c] = A[c, j0+r] == U[c, j0+r]
        G = jnp.where(strip_cols < j0, G, 0.0)
        T1 = jax.lax.dot_general(
            G, Vl, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        vrows = -jax.lax.dot_general(
            R, T1, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        r_placed = jax.lax.dot_general(
            R, E, (((1,), (1,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b) R at columns j0..
        vrows = vrows + r_placed
        vrows_full = jax.lax.dot_general(
            E, vrows, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        Vl = jnp.where(in_strip, vrows_full, Vl)
        return A, Vl

    U, Vl = jax.lax.fori_loop(
        0, b // sw, body, (A, jnp.zeros((b, b), A.dtype))
    )
    U = jnp.where(row_ids <= col_ids, U, 0.0)
    return U, Vl.T  # V = inv(U) upper


def _factor_diag_wi(D, p, b, sw, scheme="aug"):
    """(L, W = inv(L)) of one (p, p) diagonal block VALUE.

    Blocked Crout over (b, b) sub-blocks: strip-factor + strip-inverse on
    the diagonal (``scheme='aug'``: the augmented-head scheme of
    ``_strip_factor_wi``; ``'strip'``: pallas_panel's wide-strip rank-sw
    scheme), GEMM corrections and inverse back-substitution everywhere
    else.  Input is lower-defined (strict upper may be garbage: diagonal
    sub-blocks are mirrored, upper sub-blocks never read).  All dots at
    HIGHEST — diagonal flops are negligible and anchor the factorization's
    error."""
    nb = p // b
    A = [
        [D[i * b : (i + 1) * b, j * b : (j + 1) * b] for j in range(nb)]
        for i in range(nb)
    ]
    L = [[None] * nb for _ in range(nb)]
    W = [[None] * nb for _ in range(nb)]
    for k in range(nb):
        S = A[k][k]
        for m in range(k):
            S = S - _dot(L[k][m], L[k][m], _NT)
        if scheme == "aug":
            U, V = _strip_factor_wi(_mirror_lower(S, b), b, sw)
        elif scheme == "rv":
            # strip factor (the measured-fast serial sweep) + recursive-
            # doubling inverse (pure MXU, no serial back-substitution)
            U = _strip_factor(_mirror_lower(S, b), b, sw)
            V = _triu_inv_rec(U, b)
        elif scheme == "stat":
            # static-unrolled strips (constant masks off the serial
            # chain) + recursive-doubling inverse
            U = _strip_factor_static(_mirror_lower(S, b), b, sw)
            V = _triu_inv_rec(U, b)
        elif scheme == "stat2":
            # stat with fused pivot PAIRS: one rank-2 elimination per two
            # pivots (~5-6 dependent stages per pair vs 8)
            U = _strip_factor_static2(_mirror_lower(S, b), b, sw)
            V = _triu_inv_rec(U, b)
        elif scheme == "stat2p":
            # stat2 with pipelined pair-column extraction (reduces off
            # the serial chain; ~4 stages per pair)
            U = _strip_factor_static2p(_mirror_lower(S, b), b, sw)
            V = _triu_inv_rec(U, b)
        elif scheme == "head":
            # serial elimination confined to (sw, sw) heads; wide strips
            # via GEMM vs the head inverse; V by recursive doubling
            U = _head_strip_factor(_mirror_lower(S, b), b, sw)
            V = _triu_inv_rec(U, b)
        else:
            U = _strip_factor(_mirror_lower(S, b), b, sw)
            V = _inv_upper(U, b, sw)
        L[k][k] = U.T
        W[k][k] = V.T
        for i in range(k + 1, nb):
            R = A[i][k]
            for m in range(k):
                R = R - _dot(L[i][m], L[k][m], _NT)
            L[i][k] = _dot(R, V, _NN)  # R @ inv(L_kk)^T == R @ U^{-1}
    for i in range(1, nb):  # W_ij = -W_ii * sum_{j<=m<i} L_im W_mj
        for j in range(i - 1, -1, -1):
            acc = _dot(L[i][j], W[j][j], _NN)
            for m in range(j + 1, i):
                acc = acc + _dot(L[i][m], W[m][j], _NN)
            W[i][j] = -_dot(W[i][i], acc, _NN)
    return L, W  # lower-block lists; upper blocks are None (exact zero)


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16).astype(x.dtype)
    return hi, x - hi


def _d16(x, y):
    """One bf16 MXU pass with f32 accumulation (operands are bf16 values
    or bf16-exact f32 values)."""
    return jax.lax.dot_general(
        x, y, _NT, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _gram_tile(xb, yb, y_hi, y_lo, yy, form, par, p):
    """One (p, p) kernel-function tile K(X_c, X_j) from feature blocks.

    Same math as ops/pallas_gram (the standalone fused Gram kernel): GEMM
    sqdist identity with the cross term at the f32-grade bf16x3 tier —
    except matern12, whose r->0 cusp amplifies sqdist noise (see
    pallas_gram), computed at HIGHEST."""
    sigma, scale, third = par[0, 0], par[0, 1], par[0, 2]
    xx = jnp.sum(xb * xb, axis=1, keepdims=True)  # (p, 1)
    if form == "matern12":
        cross = jax.lax.dot_general(
            xb, yb, _NT, preferred_element_type=jnp.float32, precision=_HI
        )
    else:
        x_hi = xb.astype(jnp.bfloat16).astype(jnp.float32)
        cross = _d16(x_hi, y_hi)
        cross += _d16(x_hi, y_lo)
        cross += _d16(xb - x_hi, y_hi)
    d2 = jnp.maximum(xx + yy.T - 2.0 * cross, 0.0)
    if form in ("gaussian",):
        val = (scale * scale) * jnp.exp(-0.5 * d2 / (sigma * sigma))
    elif form == "rq":
        val = (scale * scale) * (
            1.0 + 0.5 * d2 / (sigma * sigma * third)
        ) ** (-third)
    elif form in ("matern12", "matern32", "matern52"):
        r = jnp.sqrt(d2)
        if form == "matern12":
            val = (scale * scale) * jnp.exp(-r / sigma)
        elif form == "matern32":
            a = jnp.float32(3.0**0.5) * r / sigma
            val = (scale * scale) * (1.0 + a) * jnp.exp(-a)
        else:
            a = jnp.float32(5.0**0.5) * r / sigma
            val = (scale * scale) * (1.0 + a + a * a / 3.0) * jnp.exp(-a)
    else:
        raise ValueError(f"gram_cholesky_fused: unsupported form {form!r}")
    return val


def _fused_kernel(
    src_hbm, par_ref, o_hbm, s_hbm, *rest,
    n: int, p: int, b: int, sw: int, nc: int, h: int, g: int,
    form: str | None, ablate: str, scheme: str, with_w: bool,
    nt: int = 0,
):
    if with_w:
        (w_hbm, p_buf, t_buf, r_buf, hl_buf, z_buf, w_buf,
         sem_in, sem_t, sem_r, sem_z, sem_o, sem_hl, sem_w) = rest
    else:
        (p_buf, t_buf, r_buf, hl_buf, z_buf,
         sem_in, sem_t, sem_r, sem_z, sem_o, sem_hl) = rest
    j = pl.program_id(0)
    f32 = p_buf.dtype
    bf16 = jnp.bfloat16

    # ---- output descriptors ------------------------------------------------
    def out_cp(c, sem):  # f32 L chunk
        return pltpu.make_async_copy(
            p_buf.at[c],
            o_hbm.at[pl.ds(c * p, p), pl.ds(j * p, p)],
            sem,
        )

    def out_hl(c, sl):  # packed bf16 hi|lo chunk, staged in hl_buf[sl]
        return pltpu.make_async_copy(
            hl_buf.at[sl],
            s_hbm.at[j, pl.ds(c * p, p), :],
            sem_hl.at[sl],
        )

    # NOTE: the packed slab's strict-upper chunks (rows < j*p of slab j) are
    # never written: later steps only read slab k at rows >= j*p with j > k
    # (t_cp / r_start below), and the slab output is discarded by callers —
    # zero-filling them cost ~0.5 GB of HBM writes per factorization.

    def in_cp(c):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(c * p, p), pl.ds(j * p, p)],
            p_buf.at[c],
            sem_in,
        )

    # --- 1. panel strip in (only the rows this panel owns) -----------------
    if form is None:
        def istart(c, _):
            in_cp(c).start()
            return 0

        jax.lax.fori_loop(j, nc, istart, 0)
    else:
        # gram mode: the strip IS the kernel-function tile column, computed
        # from the VMEM-resident feature blocks — no Gram pass over HBM at
        # all (K + (sigma^2 + jitter) I materializes only inside VMEM)
        yb = src_hbm[j]  # (p, d) — src is the (nc, p, d) feature array
        yy = jnp.sum(yb * yb, axis=1, keepdims=True)
        y_hi = yb.astype(bf16).astype(f32)
        y_lo = yb - y_hi
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)

        def fill(c, _):
            gr = c * p + rows_i
            gc = j * p + cols_i
            if ablate == "gram":  # timing ablation: skip the tile math
                val = jnp.where(gr == gc, jnp.float32(1000.0), jnp.float32(0.01))
            elif nt < n:
                # arbitrary-n padding: rows/cols >= nt are PAD — the padded
                # Gram is exactly block-diagonal [[K, 0], [0, scale^2 I]],
                # so the leading (nt, nt) factor equals chol(K + diag*I)
                # bit-for-bit (left-looking never reads the trailing block)
                # and a padded-zero RHS solves to exact-zero tail entries.
                # scale^2 (not 1.0) keeps safe_gram_cholesky_fused's
                # analytic jitter scale valid for every row.
                val = _gram_tile(src_hbm[c], yb, y_hi, y_lo, yy, form, par_ref[:], p)
                sc = par_ref[0, 1]
                pad = jnp.logical_or(gr >= nt, gc >= nt)
                val = jnp.where(pad, 0.0, val)
                val = val + jnp.where(
                    gr == gc,
                    par_ref[0, 3] + jnp.where(gr >= nt, sc * sc, 0.0),
                    0.0,
                )
            else:
                val = _gram_tile(src_hbm[c], yb, y_hi, y_lo, yy, form, par_ref[:], p)
                val = val + jnp.where(gr == gc, par_ref[0, 3], 0.0)
            p_buf[c] = val
            return 0

        jax.lax.fori_loop(j, nc, fill, 0)

    # --- 2. strict-upper chunks: zeros out, overlap step 3.  The zeros
    # stream from ONE dedicated (p, p) buffer (j concurrent DMAs reading
    # the same source) — the round-4 per-chunk p_buf VPU fills cost
    # ~0.5 GB of vector writes per factorization for bytes that are
    # never read back
    z_buf[...] = jnp.zeros((p, p), f32)

    def out_zero(c):
        return pltpu.make_async_copy(
            z_buf,
            o_hbm.at[pl.ds(c * p, p), pl.ds(j * p, p)],
            sem_z,
        )

    def zbody(c, _):
        out_zero(c).start()
        return 0

    jax.lax.fori_loop(0, j, zbody, 0)

    if form is None:
        def iwait(c, _):
            in_cp(c).wait()
            return 0

        jax.lax.fori_loop(j, nc, iwait, 0)

    # --- 3. left-looking update --------------------------------------------
    # Columns are consumed in GROUPS of g panels; each group's row blocks
    # R_k (packed bf16 hi|lo, (p, 2p)) are loaded once into r_buf and the
    # (h*p)-row chunks stream through t_buf, double-buffered.  The packed
    # slab (s_hbm, one (n, 2p) slab per column panel written by step 4/5)
    # means NO per-read bf16 splitting and ONE contiguous DMA per tile;
    # grouping means ONE p_buf read-modify-write per g columns instead of
    # per column (the RMW was ~4 ms of serial VPU at n=16k when done per
    # (k, chunk) pair).
    #
    # nc == 1 (single panel): j is always 0, there are no factored panels
    # to consume — skip the machinery at TRACE time (its full-chunk DMA
    # descriptors would otherwise index h*p > n rows of s_hbm).
    span = nc - j
    nfull = span // h
    per_k = nfull + (span - h * nfull)  # full chunks + (p)-row tails
    ngroups = (j + g - 1) // g

    def glen_of(kg):
        return jnp.minimum(g, j - kg * g)

    def r_start(rslot, kg):
        def si(i, _):
            pltpu.make_async_copy(
                s_hbm.at[kg * g + i, pl.ds(j * p, p), :],
                r_buf.at[rslot, i],
                sem_r.at[rslot],
            ).start()
            return 0

        if g == 1:
            si(0, 0)
        else:
            jax.lax.fori_loop(0, glen_of(kg), si, 0)

    def r_wait(rslot, kg):
        def wi(i, _):
            pltpu.make_async_copy(
                s_hbm.at[kg * g + i, pl.ds(j * p, p), :],
                r_buf.at[rslot, i],
                sem_r.at[rslot],
            ).wait()
            return 0

        if g == 1:
            wi(0, 0)
        else:
            jax.lax.fori_loop(0, glen_of(kg), wi, 0)

    def t_cp(slot, i, kg, u):
        k = kg * g + i
        full = pltpu.make_async_copy(
            s_hbm.at[k, pl.ds(j * p + u * (h * p), h * p), :],
            t_buf.at[slot, i],
            sem_t.at[slot],
        )
        if h == 1:
            # chunk=1: no tail chunks exist — do not even BUILD the tail
            # descriptor (an unused AsyncCopyDescriptor logs a runtime
            # error)
            return full, None
        off = j * p + (nfull * h + (u - nfull)) * p
        tailc = pltpu.make_async_copy(
            s_hbm.at[k, pl.ds(off, p), :],
            t_buf.at[slot, i, pl.ds(0, p), :],
            sem_t.at[slot],
        )
        return full, tailc

    def t_start(slot, kg, u):
        def si(i, _):
            full, tailc = t_cp(slot, i, kg, u)
            if h == 1:
                # chunk=1 (the shipping default): every chunk is a full
                # chunk — emit the plain start, no predicated tail twin
                # (two dead pl.when regions per loop iteration otherwise)
                full.start()
                return 0

            @pl.when(u < nfull)
            def _():
                full.start()

            @pl.when(u >= nfull)
            def _():
                tailc.start()

            return 0

        if g == 1:
            si(0, 0)
        else:
            jax.lax.fori_loop(0, glen_of(kg), si, 0)

    def t_wait(slot, kg, u):
        def wi(i, _):
            full, tailc = t_cp(slot, i, kg, u)
            if h == 1:
                full.wait()
                return 0

            @pl.when(u < nfull)
            def _():
                full.wait()

            @pl.when(u >= nfull)
            def _():
                tailc.wait()

            return 0

        if g == 1:
            wi(0, 0)
        else:
            jax.lax.fori_loop(0, glen_of(kg), wi, 0)

    stream = ablate != "stream"  # timing ablation: no update-stream DMAs

    @pl.when(j > 0)
    def _():
        if stream:
            r_start(0, 0)
            t_start(0, 0, 0)

    def gbody(kg, _):
        rslot = _rem2(kg)
        if stream:
            r_wait(rslot, kg)

            @pl.when(kg + 1 < ngroups)
            def _():
                r_start(1 - rslot, kg + 1)

        def ubody(u, _):
            it = kg * per_k + u
            slot = _rem2(it)
            # prefetch the next (kg, u) pair, crossing the group boundary
            last_u = u + 1 == per_k
            kn = jnp.where(last_u, kg + 1, kg)
            un = jnp.where(last_u, 0, u + 1)

            if stream:
                @pl.when(kn < ngroups)
                def _():
                    t_start(1 - slot, kn, un)

                t_wait(slot, kg, u)
            gl = glen_of(kg)

            def dots(i, S):
                t = t_buf[slot, i]  # (h*p, 2p) bf16: [hi | lo]
                r = r_buf[rslot, i]  # (p, 2p) bf16
                thi, tlo = t[:, 0:p], t[:, p : 2 * p]
                rhi, rlo = r[:, 0:p], r[:, p : 2 * p]
                S += _d16(thi, rhi)
                S += _d16(thi, rlo)
                S += _d16(tlo, rhi)
                return S

            Z = jnp.zeros((h * p, p), f32)
            if ablate == "dots":
                S = Z
            elif g == 1:
                S = dots(0, Z)
            else:
                S = jax.lax.fori_loop(0, gl, dots, Z)

            if h == 1:
                # chunk=1: single full-chunk store, no predicated twin
                p_buf[j + u] -= S[0:p]
                return 0

            @pl.when(u < nfull)
            def _():
                c0 = j + u * h
                for q in range(h):
                    p_buf[c0 + q] -= S[q * p : (q + 1) * p]

            @pl.when(u >= nfull)
            def _():
                ct = j + nfull * h + (u - nfull)
                p_buf[ct] -= S[0:p]

            return 0

        jax.lax.fori_loop(0, per_k, ubody, 0)
        return 0

    jax.lax.fori_loop(0, ngroups, gbody, 0)

    # ---- packed hi|lo staging (double-buffered against in-flight DMAs) ----
    def stage_hl(c, val):
        sl = _rem2(c)

        @pl.when(c - 2 >= j)
        def _():
            out_hl(c - 2, sl).wait()

        hi = val.astype(bf16)
        lo = (val - hi.astype(f32)).astype(bf16)
        hl_buf[sl] = jnp.concatenate([hi, lo], axis=1)
        out_hl(c, sl).start()

    # --- 4. diagonal factor + inverse, in VMEM -----------------------------
    nb = p // b
    D = p_buf[j]
    if ablate == "diag":  # timing ablation: skip the factor (garbage result)
        Lb = [[D[0:b, 0:b] if i == m else jnp.zeros((b, b), f32) for m in range(nb)] for i in range(nb)]
        Wb = [[jnp.eye(b, dtype=f32) if i == m else jnp.zeros((b, b), f32) for m in range(nb)] for i in range(nb)]
    else:
        Lb, Wb = _factor_diag_wi(D, p, b, sw, scheme)
    # write the factored blocks straight into the panel slot (no (p, p)
    # concat assembly — it materializes two full tiles per panel)
    zb = jnp.zeros((b, b), f32)
    for i in range(nb):
        for m in range(nb):
            blk = Lb[i][m] if m <= i else zb
            p_buf[j, i * b : (i + 1) * b, m * b : (m + 1) * b] = blk
    out_cp(j, sem_o).start()
    stage_hl(j, p_buf[j])
    if with_w:
        # emit the panel-diagonal inverse W_j = inv(L_jj) (lower block
        # triangular): one extra (p, p) f32 DMA per panel (~32 MB total
        # at n=16k) lets the caller's alpha solve run as pure block-GEMM
        # substitution sweeps — no XLA triangular-solve machinery
        for i in range(nb):
            for m in range(nb):
                w_buf[i * b : (i + 1) * b, m * b : (m + 1) * b] = (
                    Wb[i][m] if m <= i else zb
                )
        pltpu.make_async_copy(w_buf, w_hbm.at[j], sem_w).start()
    wsplit = [
        [_bf16_split(Wb[i][m]) for m in range(i + 1)] for i in range(nb)
    ]

    # --- 5. panel solve as block GEMMs vs W, streamed out ------------------
    # Lc = Pc @ W^T blockwise: Lc[:, i] = sum_{m <= i} Pc[:, m] @ W_im^T —
    # the W blocks stay in block form, so the strict-upper zero blocks
    # cost no MXU passes
    def sbody(c, _):
        if ablate != "solve":  # timing ablation: skip the solve GEMMs
            Pc = p_buf[c]
            phi, plo = _bf16_split(Pc)
            cols = []
            for i in range(nb):
                acc = None
                for m in range(i + 1):
                    ph = phi[:, m * b : (m + 1) * b]
                    pe = plo[:, m * b : (m + 1) * b]
                    whi, wlo = wsplit[i][m]
                    t = _d16(ph, whi)
                    t += _d16(ph, wlo)
                    t += _d16(pe, whi)
                    acc = t if acc is None else acc + t
                cols.append(acc)
            p_buf[c] = jnp.concatenate(cols, axis=1)
        out_cp(c, sem_o).start()
        stage_hl(c, p_buf[c])
        return 0

    jax.lax.fori_loop(j + 1, nc, sbody, 0)

    # --- 6. drain (step j+1 reads column j back as update operands) --------
    def zwait(c, _):
        out_zero(c).wait()
        return 0

    jax.lax.fori_loop(0, j, zwait, 0)

    def owait(c, _):
        out_cp(c, sem_o).wait()
        return 0

    jax.lax.fori_loop(j, nc, owait, 0)

    def hlwait(c, _):
        out_hl(c, _rem2(c)).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(j, nc - 2), nc, hlwait, 0)

    if with_w:
        pltpu.make_async_copy(w_buf, w_hbm.at[j], sem_w).wait()


def _call_fused(
    src, par, n, dtype, *, panel, block, sw, chunk, group, form, interpret,
    ablate, scheme=None, with_w=False, n_true=0,
):
    nc = n // panel
    # single/few-panel matrices: the update stream's full-chunk DMA
    # descriptors span chunk*panel rows and are traced even when the
    # chunk loop never executes — clamp so they stay in bounds
    chunk = min(chunk, nc)
    if scheme is None:
        scheme = _default_diag_scheme()
    kernel = functools.partial(
        _fused_kernel, n=n, p=panel, b=block, sw=sw, nc=nc, h=chunk,
        g=group, form=form, ablate=ablate, scheme=scheme, with_w=with_w,
        nt=n_true or n,
    )
    itemsize = jnp.dtype(dtype).itemsize
    p, h, g = panel, chunk, group
    vmem = (
        n * p * itemsize                    # p_buf
        + 2 * g * (h * p) * 2 * p * 2       # t_buf (bf16, hi|lo packed)
        + 2 * g * p * 2 * p * 2             # r_buf
        + 2 * p * 2 * p * 2                 # hl_buf
        + p * p * itemsize                  # z_buf
        + 14 * p * p * itemsize             # diag-factor value blocks
        + (src.size * itemsize if form is not None else 0)  # features
    ) + (24 << 20)
    src_spec = pl.BlockSpec(memory_space=pl.ANY if form is None else pltpu.VMEM)
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, n), dtype),                 # L (f32)
        jax.ShapeDtypeStruct((nc, n, 2 * p), jnp.bfloat16),  # hi|lo slabs
    ]
    scratch = [
        pltpu.VMEM((nc, p, p), dtype),                   # p_buf
        pltpu.VMEM((2, g, h * p, 2 * p), jnp.bfloat16),  # t_buf
        pltpu.VMEM((2, g, p, 2 * p), jnp.bfloat16),      # r_buf
        pltpu.VMEM((2, p, 2 * p), jnp.bfloat16),         # hl_buf
        pltpu.VMEM((p, p), dtype),                       # z_buf (zeros)
    ]
    sems = [
        pltpu.SemaphoreType.DMA(()),                     # sem_in
        pltpu.SemaphoreType.DMA((2,)),                   # sem_t
        pltpu.SemaphoreType.DMA((2,)),                   # sem_r
        pltpu.SemaphoreType.DMA(()),                     # sem_z
        pltpu.SemaphoreType.DMA(()),                     # sem_o
        pltpu.SemaphoreType.DMA((2,)),                   # sem_hl
    ]
    if with_w:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((nc, p, p), dtype))  # W panels
        scratch.append(pltpu.VMEM((p, p), dtype))                  # w_buf
        sems.append(pltpu.SemaphoreType.DMA(()))                   # sem_w
        vmem += p * p * itemsize
    out = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[src_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch + sems,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(int(vmem), 100 * (1 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * n * n,  # n^3/3 at 3 bf16 passes
            bytes_accessed=(n * n * n // (3 * panel) + 3 * n * n) * itemsize,
            transcendentals=n * n if form is not None else 0,
        ),
        interpret=interpret,
    )(src, par)
    if with_w:
        return out[0], out[2]
    return out[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "panel", "block", "sw", "chunk", "group", "interpret", "ablate",
        "diag_scheme",
    ),
)
def _cholesky_fused_jit(
    A: jax.Array,
    *,
    panel: int = 512,
    block: int = 128,
    sw: int = 32,
    chunk: int = 1,
    group: int = 1,
    interpret: bool = False,
    ablate: str = "",
    diag_scheme: str = "strip",
) -> jax.Array:
    n = A.shape[0]
    if A.ndim != 2 or A.shape != (n, n) or n % panel or panel % block:
        raise ValueError(
            f"cholesky_fused: shape {A.shape} must be (n, n) with "
            f"n % {panel} == 0 and panel % {block} == 0"
        )
    par = jnp.zeros((1, 8), jnp.float32)  # unused in matrix mode
    return _call_fused(
        A, par, n, A.dtype, panel=panel, block=block, sw=sw, chunk=chunk,
        group=group, form=None, interpret=interpret, ablate=ablate,
        scheme=diag_scheme,
    )


def cholesky_fused(
    A: jax.Array,
    *,
    panel: int = 512,
    block: int = 128,
    sw: int = 32,
    chunk: int = 1,
    group: int = 1,
    interpret: bool = False,
    ablate: str = "",
    diag_scheme: str | None = None,
) -> jax.Array:
    """Lower Cholesky factor of SPD ``A`` — the whole factorization as a
    single pallas dispatch (see module docstring).

    ``A``: (n, n) f32 with n a multiple of ``panel``; only the lower
    triangle is read.  Returns L with exact-zero strict upper.

    ``diag_scheme=None`` resolves GPR_FUSED_DIAG here (outside jit), so
    the env var is honored per-call."""
    if diag_scheme is None:
        diag_scheme = _default_diag_scheme()
    return _cholesky_fused_jit(
        A, panel=panel, block=block, sw=sw, chunk=chunk, group=group,
        interpret=interpret, ablate=ablate, diag_scheme=diag_scheme,
    )


_GRAM_FORMS = ("gaussian", "rq", "matern12", "matern32", "matern52")


@functools.partial(
    jax.jit,
    static_argnames=(
        "form", "panel", "block", "sw", "chunk", "group", "interpret",
        "ablate", "diag_scheme", "return_winv",
    ),
)
def _gram_cholesky_fused_jit(
    X: jax.Array,
    sigma,
    scale,
    third,
    diag,
    *,
    form: str = "gaussian",
    panel: int = 512,
    block: int = 128,
    sw: int = 32,
    chunk: int = 1,
    group: int = 1,
    interpret: bool = False,
    ablate: str = "",
    diag_scheme: str = "strip",
    return_winv: bool = False,
) -> jax.Array:
    """chol(K(X, X) + diag*I) in ONE pallas dispatch — the Gram matrix is
    never materialized in HBM: each panel strip is computed in VMEM from
    the feature blocks (GEMM sqdist identity, the same tile math as
    ops/pallas_gram) and factored in place.

    Replaces the fit hot path's separate Gram pass + diagonal add +
    factorization (reference lib/GaussianProcess.cpp:384-402 Gram build,
    :374-381 noise add, :530-618 inversion) with a single kernel.

    ``X``: (n, d) f32; d is zero-padded to a lane multiple (padding leaves
    pairwise distances unchanged).  When n is NOT a multiple of ``panel``,
    X is row-padded to the next multiple and the pad rows are masked
    in-kernel to an exact identity block ([[K, 0], [0, scale^2 I]] + diag)
    — the RETURNED factor is then (n_pad, n_pad); callers slice
    ``L[:n, :n]`` (a leading principal Cholesky factor is exact) and pad
    their RHS with zeros for the panel solve.  NOT differentiable
    (training via ``fit`` is not differentiated; MLL paths keep the
    two-pass gram -> safe_cholesky route)."""
    if form not in _GRAM_FORMS:
        raise ValueError(f"gram_cholesky_fused: unsupported form {form!r}")
    n, d = X.shape
    n_true = 0
    if n % panel:
        n_pad = -(-n // panel) * panel
        X = jnp.concatenate([X, jnp.zeros((n_pad - n, d), X.dtype)], axis=0)
        n_true, n = n, n_pad
    dpad = max(128, -(-d // 128) * 128)
    if dpad != d:
        X = jnp.concatenate([X, jnp.zeros((n, dpad - d), X.dtype)], axis=1)
    X3 = X.reshape(n // panel, panel, dpad)
    par = jnp.zeros((1, 8), jnp.float32)
    par = par.at[0, 0].set(jnp.asarray(sigma, jnp.float32))
    par = par.at[0, 1].set(jnp.asarray(scale, jnp.float32))
    par = par.at[0, 2].set(jnp.asarray(third, jnp.float32))
    par = par.at[0, 3].set(jnp.asarray(diag, jnp.float32))
    return _call_fused(
        X3, par, n, X.dtype, panel=panel, block=block, sw=sw, chunk=chunk,
        group=group, form=form, interpret=interpret, ablate=ablate,
        scheme=diag_scheme, with_w=return_winv, n_true=n_true,
    )


def gram_cholesky_fused(
    X: jax.Array,
    sigma,
    scale,
    third,
    diag,
    *,
    form: str = "gaussian",
    panel: int = 512,
    block: int = 128,
    sw: int = 32,
    chunk: int = 1,
    group: int = 1,
    interpret: bool = False,
    ablate: str = "",
    diag_scheme: str | None = None,
    return_winv: bool = False,
) -> jax.Array:
    """Public wrapper of the fused Gram+Cholesky kernel; see
    ``_gram_cholesky_fused_jit``.  ``diag_scheme=None`` resolves
    GPR_FUSED_DIAG here (outside jit), so the env var is honored
    per-call."""
    if diag_scheme is None:
        diag_scheme = _default_diag_scheme()
    return _gram_cholesky_fused_jit(
        X, sigma, scale, third, diag, form=form, panel=panel, block=block,
        sw=sw, chunk=chunk, group=group, interpret=interpret, ablate=ablate,
        diag_scheme=diag_scheme, return_winv=return_winv,
    )


def safe_gram_cholesky_fused(
    X: jax.Array,
    sigma,
    scale,
    third,
    noise,
    *,
    form: str = "gaussian",
    initial_jitter: float = 0.0,
    max_tries: int = 6,
    panel: int = 512,
    block: int = 128,
    sw: int = 32,
    interpret: bool = False,
    return_winv: bool = False,
):
    """(L, jitter_used) — or (L, W, jitter_used) with ``return_winv``,
    where W (nc, p, p) holds the panel-diagonal inverses inv(L_jj) for
    :func:`cho_solve_panels` — with jitter escalation, entirely on the fused
    gram+factorization kernel — the analogue of ``linalg.safe_cholesky``
    for the one-dispatch fit path.  The retry loop re-runs the SAME
    compiled kernel with the escalated diagonal (a failed pivot poisons
    the last diagonal entry with NaN, detected in O(1)).

    The jitter scale is analytic: every supported form is stationary with
    k(x, x) = scale^2, so the Gram diagonal is scale^2 + noise exactly —
    no diagonal gather needed (cf. linalg._safe_cholesky_impl's head-slice
    heuristic)."""
    f32 = jnp.float32
    noise = jnp.asarray(noise, f32)
    eps = jnp.finfo(f32).eps

    def attempt(j):
        out = gram_cholesky_fused(
            X, sigma, scale, third, noise + j, form=form, panel=panel,
            block=block, sw=sw, interpret=interpret,
            return_winv=return_winv,
        )
        return out if return_winv else (out, jnp.zeros((), f32))

    L0, W0 = attempt(jnp.zeros((), f32))
    ok0 = jnp.isfinite(L0[-1, -1])
    scale32 = jnp.asarray(scale, f32)
    base = jnp.where(
        jnp.asarray(initial_jitter, f32) > 0,
        jnp.asarray(initial_jitter, f32),
        eps * jnp.maximum(scale32 * scale32 + noise, 1.0),
    )

    def cond(state):
        ok, tries, _, _, _ = state
        return jnp.logical_and(jnp.logical_not(ok), tries < max_tries)

    def body(state):
        ok, tries, jit_, L, W = state
        jnew = jnp.where(tries == 0, base, jit_ * 10.0)
        Lnew, Wnew = attempt(jnew)
        return jnp.isfinite(Lnew[-1, -1]), tries + 1, jnew, Lnew, Wnew

    ok, _, jit_, L, W = jax.lax.while_loop(
        cond, body,
        (ok0, jnp.asarray(0, jnp.int32), jnp.zeros((), f32), L0, W0),
    )
    if return_winv:
        return L, W, jit_
    return L, jit_


def cho_solve_panels(L: jax.Array, W: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B using the fused kernel's emitted panel-diagonal
    inverses ``W`` (nc, p, p): two block-substitution sweeps of plain
    GEMMs — no triangular-solve custom calls, no diagonal-inverse
    machinery (the blocked solve's InvertDiagBlocks custom calls and
    recursion glue cost ~2 ms inside fit at n=16k, round-4 anatomy).

    Forward (j ascending):  y_j = W_j (B_j − L[j, :j] y_{<j})
    Backward (j descending): x_j = W_j^T (y_j − L[>j, j]^T x_{>j})

    Static python loops over the nc panels; every slice is static.
    Numerics: TRSM-via-TRTRI per panel block (same scheme, and the same
    jitter-guarded-SPD conditioning argument, as the kernel's in-dispatch
    panel solve).  The explicit inverse-multiply trades the backward-stable
    triangular solve for GEMM throughput; the error grows with cond(L_jj)
    <= sqrt(cond(K)).  ``GPR_FIT_SCHEDULE=twopass`` is the documented
    stability fallback (separate gram -> safe_cholesky -> blocked
    triangular solves); benchmarks/chip_smoke.py carries a standing
    ill-conditioned probe (``fit_illcond``) that asserts the residual of
    this path on a cond ~1e6 system."""
    from ..utils.config import matmul_precision

    prec = matmul_precision()
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    n = L.shape[0]
    nc, p, _ = W.shape
    mm = functools.partial(
        jnp.matmul, precision=prec, preferred_element_type=B.dtype
    )
    ys = []
    for j in range(nc):
        rhs = B[j * p : (j + 1) * p]
        if j:
            ycat = jnp.concatenate(ys, axis=0)
            rhs = rhs - mm(L[j * p : (j + 1) * p, : j * p], ycat)
        ys.append(mm(W[j], rhs))
    xs = [None] * nc
    for j in reversed(range(nc)):
        rhs = ys[j]
        if j + 1 < nc:
            xcat = jnp.concatenate(xs[j + 1 :], axis=0)
            rhs = rhs - mm(L[(j + 1) * p :, j * p : (j + 1) * p].T, xcat)
        xs[j] = mm(W[j].T, rhs)
    X = jnp.concatenate(xs, axis=0)
    return X[:, 0] if squeeze else X


def fused_usable(A) -> bool:
    """The fused factorizer applies to f32 panel-aligned single matrices
    on a real TPU (CPU tests run it via interpret=True explicitly)."""
    return (
        A.ndim == 2
        and A.dtype == jnp.float32
        and A.shape[0] == A.shape[1]
        and A.shape[0] % 512 == 0
        and A.shape[0] >= 1024
        and jax.default_backend() == "tpu"
    )
