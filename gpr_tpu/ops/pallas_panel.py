"""Fused Pallas panel factorizer (EXPERIMENTAL — measured; not dispatched).

Factors one (n, b) Cholesky column panel in a SINGLE pallas program:

  grid step 0  (diagonal tile):
    * strip-factor the (b, b) diagonal block to U = L_dd^T (rank-8 MXU
      updates, `pallas_chol.cholesky_pallas_v2`'s scheme);
    * build inv(U) in-kernel by bottom-up 8-row strips — each strip is an
      (8, b) GEMM correction plus an unrolled 8x8 triangular inversion —
      and park it in a VMEM scratch that persists across grid steps;
  grid steps t >= 1 (below-diagonal tiles):
    * L21 tile = A21 tile @ inv(U) — ONE full MXU matmul per tile.

This collapses the panel's triangular-solve dependency chain into a single
sequential tile plus pure GEMMs.  TPU pallas grids execute sequentially on
the core, so the scratch produced at step 0 is visible to all later steps.

MEASURED (v5e): the fused panel op is 2x the XLA chol+solve pair (32 us vs
63 us at n=8192, f32-exact).  But the right-looking factorization built on
it (:func:`cholesky_panels`) STILL loses to the recursive ops/blocked.py
(18.4 ms vs 6.7 ms at n=8192): with 256-wide panels the trailing-update
GEMMs have contraction dim 256, which the MXU executes far below peak at
the f32-grade precision tiers, while the recursion's trailing GEMMs have
large contraction dims.  Conclusion recorded in BENCHMARKS.md: the panel
kernel is a validated building block, but beating the recursive schedule
requires wide-panel trailing updates (accumulate several panels before
updating) — a left-looking/communication-avoiding variant for round 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _strip_factor(A, b, sw):
    """U = chol(A)^T for a (b, b) tile held as a VALUE; returns U.
    Same scheme as pallas_chol._chol_strip_kernel but value-carried (the
    tile stays in registers/VMEM values; no ref round-trips)."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_strip = jax.lax.broadcasted_iota(jnp.int32, (sw, b), 1)
    row_strip = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)
    strip_sel = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)

    def body(jb, A):
        j0 = jb * sw
        # gather the strip rows via a one-hot matmul (dynamic value slicing
        # is unsupported): S = E^T A with E (b, sw) one-hot columns
        E = (strip_sel == (j0 + jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1))).astype(A.dtype)
        strip = jax.lax.dot_general(
            E, A, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (sw, b)
        for r in range(sw):
            j = j0 + r
            row = strip[r : r + 1, :]
            pivot = jnp.sum(jnp.where(col_strip[:1] == j, row, 0.0))
            inv = 1.0 / jnp.sqrt(pivot)
            u = jnp.where(col_strip[:1] >= j, row * inv, 0.0)
            c = (
                jnp.sum(jnp.where(col_strip == j, strip, 0.0), axis=1, keepdims=True)
                * inv
            )
            strip = jnp.where(row_strip == r, u, strip)
            strip = jnp.where(row_strip > r, strip - c * u, strip)
        # write the strip back: A = A + E (strip - E^T A); cheaper as mask
        in_strip = jnp.logical_and(row_ids >= j0, row_ids < j0 + sw)
        strip_full = jax.lax.dot_general(
            E, strip, (((1,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )  # (b, b) rows outside strip are zero
        A = jnp.where(in_strip, strip_full, A)
        # rank-sw trailing update below the strip
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=_HI,
        )
        A = jnp.where(row_ids >= j0 + sw, A - upd, A)
        return A

    U = jax.lax.fori_loop(0, b // sw, body, A)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.where(row_ids <= col_ids, U, 0.0)


def _inv_upper(U, b, sw):
    """V = U^{-1} for upper-triangular U (b, b), by bottom-up 8-row strips:
    V[rows] = inv8(D) (I[rows] - U[rows, :] V) with V filled below."""
    eye = jnp.eye(b, dtype=U.dtype)
    sel_rows = jax.lax.broadcasted_iota(jnp.int32, (b, sw), 0)

    def body(step, V):
        sb = b // sw - 1 - step
        r0 = sb * sw
        E = (sel_rows == (r0 + jax.lax.broadcasted_iota(jnp.int32, (b, sw), 1))).astype(U.dtype)
        U_rows = jax.lax.dot_general(
            E, U, (((0,), (0,)), ((), ())), preferred_element_type=U.dtype,
            precision=_HI,
        )  # (sw, b)
        I_rows = jax.lax.dot_general(
            E, eye, (((0,), (0,)), ((), ())), preferred_element_type=U.dtype,
            precision=_HI,
        )
        R = I_rows - jax.lax.dot_general(
            U_rows, V, (((1,), (0,)), ((), ())), preferred_element_type=U.dtype,
            precision=_HI,
        )  # (sw, b); V rows at/above r0 are still zero, so this subtracts
        # only the strictly-below contributions
        # D = U[rows, cols r0:r0+sw] via one-hot column gather
        D = jax.lax.dot_general(
            U_rows, E, (((1,), (0,)), ((), ())), preferred_element_type=U.dtype,
            precision=_HI,
        )  # (sw, sw) upper
        # unrolled 8x8 upper-triangular inversion applied to R:
        # X = D^{-1} R  by back substitution over static rows
        rows = [None] * sw
        for i in reversed(range(sw)):
            acc = R[i : i + 1, :]
            for j in range(i + 1, sw):
                acc = acc - D[i, j] * rows[j]
            rows[i] = acc / D[i, i]
        X = jnp.concatenate(rows, axis=0)  # (sw, b)
        # scatter X into V at rows r0.. via the one-hot E
        X_full = jax.lax.dot_general(
            E, X, (((1,), (0,)), ((), ())), preferred_element_type=U.dtype,
            precision=_HI,
        )
        in_rows = jnp.logical_and(
            jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) >= r0,
            jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) < r0 + sw,
        )
        return jnp.where(in_rows, X_full, V)

    return jax.lax.fori_loop(0, b // sw, body, jnp.zeros_like(U))


def _panel_kernel(p_ref, o_ref, invu_ref, *, b: int, sw: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        A = p_ref[:]
        U = _strip_factor(A, b, sw)
        invu_ref[:] = _inv_upper(U, b, sw)
        o_ref[:] = U.T  # L_dd lower

    @pl.when(t > 0)
    def _():
        # L21 tile = A21 tile @ U^{-1}
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], invu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=p_ref.dtype, precision=_HI,
        )


@functools.partial(jax.jit, static_argnames=("sw", "tile", "interpret"))
def panel_factor(
    P: jax.Array, *, sw: int = 8, tile: int = 256, interpret: bool = False
) -> jax.Array:
    """Factor an (n, b) Cholesky column panel; returns [L_dd; L21].

    P's top (b, b) block is the (Schur-updated) diagonal block, rows below
    are A21.  b = P.shape[1] must equal ``tile`` and divide n."""
    n, b = P.shape
    if b != tile or n % tile != 0:
        raise ValueError(
            f"panel_factor: panel shape {P.shape} must be (k*{tile}, {tile})"
        )
    return pl.pallas_call(
        functools.partial(_panel_kernel, b=b, sw=sw),
        out_shape=jax.ShapeDtypeStruct((n, b), P.dtype),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, b), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tile, b), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((b, b), P.dtype)],
        interpret=interpret,
    )(P)


def cholesky_panels(A: jax.Array, *, tile: int = 256, interpret: bool = False) -> jax.Array:
    """Right-looking Cholesky built on :func:`panel_factor`.

    The plain right-looking schedule lost to the recursive variant because
    each panel cost ~an XLA chol + triangular solve plus dispatch
    (BENCHMARKS.md); with the whole panel fused into one 32 us pallas call
    the loop is panels + trailing GEMMs only."""
    n = A.shape[0]
    if n % tile != 0:
        raise ValueError(f"cholesky_panels: n ({n}) must be a multiple of {tile}")
    nb = n // tile
    S = A
    blocks = []
    for k in range(nb):
        Lp = panel_factor(S[:, :tile], tile=tile, interpret=interpret)
        blocks.append(Lp)
        if S.shape[0] > tile:
            L21 = Lp[tile:]
            S = S[tile:, tile:] - jax.lax.dot_general(
                L21, L21, (((1,), (1,)), ((), ())),
                preferred_element_type=A.dtype, precision=_HI,
            )
    cols = []
    for k, Lp in enumerate(blocks):
        cols.append(
            jnp.concatenate([jnp.zeros((k * tile, tile), A.dtype), Lp], axis=0)
        )
    return jnp.concatenate(cols, axis=1)


def cholesky_left_panels(
    A: jax.Array, *, tile: int = 256, interpret: bool = False
) -> jax.Array:
    """LEFT-looking factorization on fused panels: panel k is corrected by
    ONE wide-k GEMM against all previously factored columns, then factored
    by :func:`panel_factor`.  Unlike the right-looking variant the update
    GEMMs have contraction dim k*tile (wide — MXU-efficient at the
    f32-grade precision tiers); L accumulates in a preallocated buffer via
    static-offset ``.at.set``.

    MEASURED (v5e, n=8192, high tier): 13.7 ms (tile 256) / 20.2 ms (512)
    vs 9.1 ms recursive — better than right-looking (18.4 ms) but still
    behind: the strided L[j0:, :j0] reads and the strict panel chain cost
    more than the wide-k GEMMs save.  Fifth measured schedule; the
    recursive ops/blocked.py remains the dispatch default."""
    n = A.shape[0]
    if n % tile != 0:
        raise ValueError(f"cholesky_left_panels: n ({n}) must be a multiple of {tile}")
    nb = n // tile
    L = jnp.zeros_like(A)
    for k in range(nb):
        j0 = k * tile
        P = A[j0:, j0 : j0 + tile]  # (n - j0, tile)
        if k > 0:
            left = L[j0:, :j0]  # (n - j0, j0)
            row_blk = L[j0 : j0 + tile, :j0]  # (tile, j0)
            P = P - jax.lax.dot_general(
                left, row_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=A.dtype, precision=_HI,
            )
        Lp = panel_factor(P, tile=tile, interpret=interpret)
        L = L.at[j0:, j0 : j0 + tile].set(Lp)
    return L
