"""Pallas single-tile Cholesky micro-kernel (EXPERIMENTAL — not dispatched).

The recursive blocked factorization (ops/blocked.py) reduces a large
Cholesky to MXU GEMMs plus a *sequential chain* of small leaf
factorizations.  This kernel runs one leaf entirely in VMEM: a
``fori_loop`` of rank-1 row-oriented updates (compute U = L^T so the hot
vector is a contiguous lane row), one program, no HBM traffic between
steps.

Measured (v5e): ~218us per 256-leaf vs ~150us for XLA's cholesky — the
per-iteration full-tile read/modify/write dominates; a micro-panelled
variant (rank-128 MXU updates) would be needed to win.  Kept as a correct,
tested building block; ``ops/blocked.py`` keeps XLA leaves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(a_ref, o_ref, *, n: int):
    """U = chol(A)^T (upper) via n rank-1 updates, in-place in the output
    tile.  Rows are read/written through the ref with ``pl.ds`` (dynamic
    row index); the rank-1 update is an MXU outer product of the (1, n)
    pivot row with itself."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    col_row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    o_ref[:] = a_ref[:]

    def body(j, _):
        row = o_ref[pl.ds(j, 1), :]  # (1, n)
        pivot = jnp.sum(jnp.where(col_row == j, row, 0.0))
        u = jnp.where(col_row >= j, row * jax.lax.rsqrt(pivot), 0.0)
        o_ref[pl.ds(j, 1), :] = u
        # outer(u, u) on the MXU: contract the singleton leading dim
        upd = jax.lax.dot_general(
            u, u, (((0,), (0,)), ((), ())), preferred_element_type=u.dtype
        )  # (n, n)
        A = o_ref[:]
        o_ref[:] = jnp.where(row_ids > j, A - upd, A)
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    # zero the strictly-lower triangle (stale update residue)
    o_ref[:] = jnp.where(row_ids <= col_ids, o_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_pallas(A: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Lower Cholesky factor of a single small SPD tile (n <= ~512)."""
    n = A.shape[0]
    U = pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)
    return U.T


def leaf_cholesky(A: jax.Array) -> jax.Array:
    """Backend-dispatching leaf factorization for ops/blocked.py."""
    if jax.default_backend() == "tpu" and A.shape[0] <= 512:
        return cholesky_pallas(A)
    return jnp.linalg.cholesky(A)
