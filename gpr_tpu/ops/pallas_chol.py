"""Pallas single-tile Cholesky micro-kernel (EXPERIMENTAL — not dispatched).

The recursive blocked factorization (ops/blocked.py) reduces a large
Cholesky to MXU GEMMs plus a *sequential chain* of small leaf
factorizations.  This kernel runs one leaf entirely in VMEM: a
``fori_loop`` of rank-1 row-oriented updates (compute U = L^T so the hot
vector is a contiguous lane row), one program, no HBM traffic between
steps.

Measured (v5e, slope-timed): v1 ~218us per 256-leaf; the strip-panelled v2
(sw=8) ~7us vs ~13us for XLA's cholesky.  NOTE the profile that motivated
this turned out wrong — XLA's 256-leaf is 13us, so leaf factorizations are
NOT the blocked-Cholesky critical path; the triangular solves, recursion
concat copies, and op-dispatch overhead are (see BENCHMARKS.md).  v2 is
kept as the faster leaf and a building block for a future fused
panel-factorization kernel.
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


# ---------------------------------------------------------------------------
# v2: strip-panelled factorization — rank-8 MXU trailing updates
# ---------------------------------------------------------------------------

def _chol_strip_kernel(a_ref, o_ref, *, n: int, sw: int = 8):
    """U = chol(A)^T via n//sw strip iterations.

    Each iteration factorizes an (sw, n) row strip with sw statically
    unrolled rank-1 steps confined to the strip (register-resident), then
    applies ONE rank-sw MXU update to the trailing rows — collapsing the
    per-column loop overhead that dominates the v1 kernel by sw x."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    col_strip = jax.lax.broadcasted_iota(jnp.int32, (sw, n), 1)
    row_strip = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)

    o_ref[:] = a_ref[:]

    def body(jb, _):
        j0 = jb * sw
        strip = o_ref[pl.ds(j0, sw), :]  # (sw, n)
        for r in range(sw):  # static unroll
            j = j0 + r
            row = strip[r : r + 1, :]  # (1, n) static slice
            pivot = jnp.sum(jnp.where(col_strip[:1] == j, row, 0.0))
            inv = 1.0 / jnp.sqrt(pivot)
            u = jnp.where(col_strip[:1] >= j, row * inv, 0.0)
            # L[i, j] coefficients of the remaining strip rows: the Schur
            # value at column j scaled by 1/L[j, j]
            c = (
                jnp.sum(
                    jnp.where(col_strip == j, strip, 0.0), axis=1, keepdims=True
                )
                * inv
            )  # (sw, 1)
            strip = jnp.where(row_strip == r, u, strip)
            strip = jnp.where(row_strip > r, strip - c * u, strip)
        o_ref[pl.ds(j0, sw), :] = strip
        # rank-sw trailing update on rows >= j0+sw (MXU outer product)
        upd = jax.lax.dot_general(
            strip, strip, (((0,), (0,)), ((), ())),
            preferred_element_type=strip.dtype,
            precision=jax.lax.Precision.HIGHEST,  # f32 MXU passes (v5e
            # defaults to a bf16-ish path: 1e-4 rel err without this)
        )  # (n, n)
        A = o_ref[:]
        o_ref[:] = jnp.where(row_ids >= j0 + sw, A - upd, A)
        return 0

    jax.lax.fori_loop(0, n // sw, body, 0)
    o_ref[:] = jnp.where(row_ids <= col_ids, o_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("sw", "interpret"))
def cholesky_pallas_v2(
    A: jax.Array, *, sw: int = 8, interpret: bool = False
) -> jax.Array:
    """Strip-panelled single-tile Cholesky (requires sw | n)."""
    n = A.shape[0]
    if n % sw != 0:
        raise ValueError(f"cholesky_pallas_v2: strip width {sw} must divide n={n}")
    U = pl.pallas_call(
        functools.partial(_chol_strip_kernel, n=n, sw=sw),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)
    return U.T
