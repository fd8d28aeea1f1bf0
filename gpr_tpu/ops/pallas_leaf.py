"""Pallas whole-leaf Cholesky: factor an entire recursion leaf in VMEM.

The recursive blocked Cholesky (ops/blocked.py — the TPU re-design of the
reference's LAPACK dpotrf path, reference include/LAPACKUtils.h:59-73)
bottoms out in ``lax.linalg.cholesky`` leaves.  On TPU XLA lowers those to
its own blocked loop of narrow panel factorizations, triangular-solve
custom-calls and dynamic-update-slices — per-op trace anatomy at n=16k
shows ~2/3 of the 1024-leaf cost is this machinery, not math
(BENCHMARKS.md round-2 section).

This kernel factors the WHOLE leaf in one pallas program: a static python
loop over 256-wide diagonal blocks, each step

  * strip-factors the (b, b) diagonal block to U = L_kk^T (rank-8 MXU
    updates — `pallas_panel._strip_factor`'s scheme),
  * builds inv(U) in-kernel (bottom-up 8-row strips,
    `pallas_panel._inv_upper`),
  * forms the below-rows L_ik = A_ik @ inv(U) as ONE MXU matmul,
  * applies the rank-b trailing update to the remaining square.

Everything lives in a single VMEM-resident (N, N) tile (N <= 1024: 4 MB of
the ~16 MB VMEM), so there is no HBM traffic between steps, no
custom-call dispatch, and no DUS — the entire leaf is one op to XLA.

Input contract matches ``lax.linalg.cholesky(symmetrize_input=False)``:
only the LOWER triangle of ``A`` is read (the strict upper may be
undefined, as it is for tiles produced by ops/pallas_syrk.py); the result
has an exactly-zero strict upper triangle.  All in-kernel contractions run
at ``Precision.HIGHEST`` (f32-exact) — leaves anchor the factorization's
error, and their flops are negligible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_panel import _strip_factor, _inv_upper

_HI = jax.lax.Precision.HIGHEST


def _leaf_kernel(a_ref, o_ref, *, n: int, b: int, sw: int):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    # mirror the lower triangle across the diagonal so every later read is
    # defined: A_sym = tril(A) + tril(A, -1)^T  (upper input may be garbage)
    A = a_ref[:]
    low = jnp.where(row_ids >= col_ids, A, 0.0)
    strict = jnp.where(row_ids > col_ids, A, 0.0)
    o_ref[:] = low + strict.T

    nb = n // b
    for k in range(nb):  # static: every slice below is compile-time fixed
        j0 = k * b
        D = o_ref[j0 : j0 + b, j0 : j0 + b]
        U = _strip_factor(D, b, sw)  # chol(D)^T, upper
        V = _inv_upper(U, b, sw)  # U^{-1}, upper
        o_ref[j0 : j0 + b, j0 : j0 + b] = U.T
        m = n - j0 - b
        if m > 0:
            R = o_ref[j0 + b :, j0 : j0 + b]  # (m, b)
            Lik = jax.lax.dot_general(
                R, V, (((1,), (0,)), ((), ())),
                preferred_element_type=R.dtype, precision=_HI,
            )
            o_ref[j0 + b :, j0 : j0 + b] = Lik
            T = o_ref[j0 + b :, j0 + b :]  # (m, m)
            upd = jax.lax.dot_general(
                Lik, Lik, (((1,), (1,)), ((), ())),
                preferred_element_type=R.dtype, precision=_HI,
            )
            o_ref[j0 + b :, j0 + b :] = T - upd

    # exact-zero strict upper triangle (potrf('L') contract)
    o_ref[:] = jnp.where(row_ids >= col_ids, o_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("block", "sw", "interpret"))
def leaf_cholesky(
    A: jax.Array, *, block: int = 256, sw: int = 8, interpret: bool = False
) -> jax.Array:
    """Lower Cholesky factor of one SPD leaf tile, entirely in VMEM.

    ``A``: (n, n) with n a multiple of ``block`` and n <= 1024 (VMEM).
    Only the lower triangle is read; the strict upper of the result is
    exactly zero."""
    n = A.shape[0]
    if A.shape != (n, n) or n % block or n > 1024:
        raise ValueError(
            f"leaf_cholesky: shape {A.shape} must be (n, n), n % {block} == 0,"
            " n <= 1024"
        )
    return pl.pallas_call(
        functools.partial(_leaf_kernel, n=n, b=block, sw=sw),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)


def leaf_usable(n: int, dtype) -> bool:
    """The pallas leaf applies to f32 MXU-aligned tiles on a real TPU."""
    return (
        dtype == jnp.float32
        and n % 256 == 0
        and n <= 1024
        and jax.default_backend() == "tpu"
    )


def _leaf_wi_kernel(a_ref, o_ref, w_ref, *, n: int, b: int, sw: int):
    """Factor the leaf AND emit W = inv(L) from the same program.

    The factorization already builds each diagonal block's inverse
    V_k = inv(U_k) to form the below-rows as GEMMs, so the full leaf
    inverse costs only the off-diagonal block back-substitution
    (nb*(nb-1)/2 small GEMMs) on top — far cheaper than a separate
    :func:`tri_inv_leaf` pass (194 us measured vs ~30 us of math).

    ``a_ref`` is the aliased view of ``o_ref`` (input_output_aliases), so
    the input sits in ``o_ref`` at entry and the factorization is fully
    in place.  All masking/mirroring is done per (b, b) block —
    full-tile iota masks at n=1024 blew the 16 MB scoped-VMEM limit."""
    del a_ref
    nb = n // b
    row_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    zero = jnp.zeros((b, b), o_ref.dtype)

    # mirror ONLY the diagonal blocks (the strip factorization reads the
    # full (b, b) diagonal tile; the input's strict upper may be garbage).
    # Off-diagonal upper blocks are never read: the trailing update below
    # is lower-only, and the final masking overwrites them with zeros.
    for i in range(nb):
        d = o_ref[i * b : (i + 1) * b, i * b : (i + 1) * b]
        low = jnp.where(row_b >= col_b, d, 0.0)
        strict = jnp.where(row_b > col_b, d, 0.0)
        o_ref[i * b : (i + 1) * b, i * b : (i + 1) * b] = low + strict.T

    def blk(ref, i, j):
        return ref[i * b : (i + 1) * b, j * b : (j + 1) * b]

    vs = []
    for k in range(nb):
        D = blk(o_ref, k, k)
        U = _strip_factor(D, b, sw)
        V = _inv_upper(U, b, sw)
        vs.append(V.T)  # inv(L_kk)
        o_ref[k * b : (k + 1) * b, k * b : (k + 1) * b] = U.T
        w_ref[k * b : (k + 1) * b, k * b : (k + 1) * b] = V.T
        # column solve + LOWER-ONLY trailing update, all at (b, b)
        # granularity: full-height temporaries (e.g. the (768, 768)
        # Schur update at k=0) blew the 16 MB scoped-VMEM stack, and
        # the blockwise form also skips the strict-upper update flops
        for i in range(k + 1, nb):
            o_ref[i * b : (i + 1) * b, k * b : (k + 1) * b] = (
                jax.lax.dot_general(
                    blk(o_ref, i, k), V, (((1,), (0,)), ((), ())),
                    preferred_element_type=o_ref.dtype, precision=_HI,
                )
            )
        for i in range(k + 1, nb):
            Li = blk(o_ref, i, k)
            for j in range(k + 1, i + 1):
                upd = jax.lax.dot_general(
                    Li, blk(o_ref, j, k), (((1,), (1,)), ((), ())),
                    preferred_element_type=o_ref.dtype, precision=_HI,
                )
                o_ref[i * b : (i + 1) * b, j * b : (j + 1) * b] = (
                    blk(o_ref, i, j) - upd
                )

    for i in range(1, nb):  # W_ij = -inv(L_ii) sum_k L_ik W_kj
        for j in range(i - 1, -1, -1):
            acc = zero
            for k in range(j, i):
                Lik = o_ref[i * b : (i + 1) * b, k * b : (k + 1) * b]
                Wkj = w_ref[k * b : (k + 1) * b, j * b : (j + 1) * b]
                acc = acc + jax.lax.dot_general(
                    Lik, Wkj, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc.dtype, precision=_HI,
                )
            w_ref[i * b : (i + 1) * b, j * b : (j + 1) * b] = -jax.lax.dot_general(
                vs[i], acc, (((1,), (0,)), ((), ())),
                preferred_element_type=acc.dtype, precision=_HI,
            )

    # exact-zero strict uppers, blockwise
    for i in range(nb):
        d = o_ref[i * b : (i + 1) * b, i * b : (i + 1) * b]
        o_ref[i * b : (i + 1) * b, i * b : (i + 1) * b] = jnp.where(
            row_b >= col_b, d, 0.0
        )
        for j in range(i + 1, nb):
            o_ref[i * b : (i + 1) * b, j * b : (j + 1) * b] = zero
            w_ref[i * b : (i + 1) * b, j * b : (j + 1) * b] = zero


@functools.partial(jax.jit, static_argnames=("block", "sw", "interpret"))
def leaf_cholesky_wi(
    A: jax.Array, *, block: int = 256, sw: int = 8, interpret: bool = False
):
    """(L, W = L^{-1}) of one SPD leaf tile from a single VMEM program.

    Replaces both the XLA leaf ``cholesky`` (whose TPU lowering is a
    machinery-heavy blocked loop) and the separate leaf inverse, so the
    blocked recursion's leaf step is exactly ONE op.  Lower-only input
    contract; both outputs have exact-zero strict uppers."""
    n = A.shape[0]
    if A.shape != (n, n) or n % block or n > 1024:
        raise ValueError(
            f"leaf_cholesky_wi: shape {A.shape} must be (n, n), "
            f"n % {block} == 0, n <= 1024"
        )
    return pl.pallas_call(
        functools.partial(_leaf_wi_kernel, n=n, b=block, sw=sw),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), A.dtype),
            jax.ShapeDtypeStruct((n, n), A.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        # the factorization happens in place in the L output buffer
        input_output_aliases={0: 0},
        interpret=interpret,
    )(A)


def _tri_inv_kernel(l_ref, w_ref, *, n: int, b: int, sw: int):
    """W = L^{-1} for lower-triangular L (n, n), blocked back-substitution:
    diagonal blocks via the strip inverse, off-diagonal (i > j) by
    W_ij = -inv(L_ii) @ sum_{j <= k < i} L_ik W_kj (static block loops)."""
    nb = n // b
    vs = []
    row_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    zero = jnp.zeros((b, b), l_ref.dtype)
    for k in range(nb):  # diagonal blocks: V_k = inv(L_kk)
        j0 = k * b
        D = l_ref[j0 : j0 + b, j0 : j0 + b]
        # the input's strict upper may be undefined and _inv_upper assumes
        # exact zeros outside its triangle (0*NaN = NaN) — mask first
        D = jnp.where(row_b >= col_b, D, 0.0)
        # _inv_upper expects UPPER input; inv(L_kk) = inv(D^T)^T
        V = _inv_upper(D.T, b, sw).T
        vs.append(V)
        w_ref[j0 : j0 + b, j0 : j0 + b] = V
    for i in range(1, nb):
        for j in range(i - 1, -1, -1):
            acc = zero
            for k in range(j, i):
                Lik = l_ref[i * b : (i + 1) * b, k * b : (k + 1) * b]
                Wkj = w_ref[k * b : (k + 1) * b, j * b : (j + 1) * b]
                acc = acc + jax.lax.dot_general(
                    Lik, Wkj, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc.dtype, precision=_HI,
                )
            w_ref[i * b : (i + 1) * b, j * b : (j + 1) * b] = -jax.lax.dot_general(
                vs[i], acc, (((1,), (0,)), ((), ())),
                preferred_element_type=acc.dtype, precision=_HI,
            )
    for i in range(nb):  # exact-zero strict upper
        for j in range(i + 1, nb):
            w_ref[i * b : (i + 1) * b, j * b : (j + 1) * b] = zero


@functools.partial(jax.jit, static_argnames=("block", "sw", "interpret"))
def tri_inv_leaf(
    L: jax.Array, *, block: int = 256, sw: int = 8, interpret: bool = False
) -> jax.Array:
    """W = L^{-1} for one lower-triangular leaf tile, entirely in VMEM.

    Enables the MAGMA-style TRSM-as-GEMM path: with W precomputed once per
    factorization leaf, every leaf triangular solve in the blocked
    recursion becomes ``B @ W^T`` — one full-rate MXU matmul instead of an
    XLA triangular-solve custom-call chain.  Only the lower triangle of
    ``L`` is read."""
    n = L.shape[0]
    if L.shape != (n, n) or n % block or n > 1024:
        raise ValueError(
            f"tri_inv_leaf: shape {L.shape} must be (n, n), n % {block} == 0,"
            " n <= 1024"
        )
    return pl.pallas_call(
        functools.partial(_tri_inv_kernel, n=n, b=block, sw=sw),
        out_shape=jax.ShapeDtypeStruct((n, n), L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(L)
