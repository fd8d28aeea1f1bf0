"""Pallas streaming triangular solves for NARROW right-hand sides.

``cho_solve`` with a skinny rhs (the regression-vector solve of
``gp.exact.fit`` — reference lib/GaussianProcess.cpp:641-672, q = output
dims) is pure latency on TPU: the flops are trivial (2 n^2 q) but both the
stock XLA triangular-solve custom call and the recursive blocked solver
execute ~100 small sequential ops (leaf custom-calls, narrow GEMMs,
concats), measured 8.4-10.9 ms at n=16k q=8 on v5e — about as long as the
whole O(n^3/3) factorization's trailing updates.

This module replaces the pair of solves with THREE device ops total:

1. one batched triangular inverse of the (nb) diagonal blocks of L
   (independent => a single batched op; cond(L_ii) <= cond(L)^(1/2) so the
   explicit inverse is numerically safe, same argument as
   ops/blocked.py's leaf_inverse),
2. one pallas program for the forward substitution,
3. one for the backward substitution.

Each substitution program walks the lower-triangle (bs, bs) tiles of L via
a 1D grid with scalar-prefetched tile coordinates (same trick as
ops/pallas_gram.py's tril mode), keeping the ENTIRE rhs resident in VMEM
in transposed (q, n) layout — q rides the sublanes, so a 16k x 8 rhs is
only 512 KB.  Every grid step is one (q, bs) x (bs, bs) MXU dot into a
VMEM accumulator; diagonal steps apply the precomputed block inverse as
another dot.  No triangular-solve custom calls, no dynamic-update-slice,
no per-op dispatch — the whole pass is one op to XLA and its HBM traffic
is exactly one read of tril(L).

Forward:   y_i = W_ii (b_i - sum_{j<i} L_ij y_j)        (row-major order)
Backward:  x_i = W_ii^T (y_i - sum_{j>i} L_ji^T x_j)    (reverse order)

in transposed form (q on the left, pure dots, zero physical transposes):

  y_i^T = (b_i^T - sum y_j^T L_ij^T) W_ii^T
  x_i^T = (y_i^T - sum x_j^T L_ji)   W_ii
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _subst_kernel(
    ri_ref, ci_ref, first_ref, l_ref, w_ref, b_ref, o_ref, y_ref, acc_ref,
    *, forward: bool, q: int, bs: int
):
    """One lower-triangle tile (i, j) of the substitution sweep.

    ``y_ref`` (nb, q, bs) VMEM scratch holds every solved block (persists
    across grid steps); ``acc_ref`` (q, bs) accumulates the current row's
    off-diagonal contributions.  ``first_ref[t]`` marks the first tile of
    each row group (accumulator reset)."""
    t = pl.program_id(0)
    i = ri_ref[t]
    j = ci_ref[t]

    @pl.when(first_ref[t] == 1)
    def _reset():
        acc_ref[:] = jnp.zeros((q, bs), acc_ref.dtype)

    @pl.when(i != j)
    def _offdiag():
        # forward streams L_ij (j < i): acc += y_j^T @ L_ij^T
        # backward streams L_ji (j > i): acc += x_j^T @ L_ji
        yj = y_ref[j]  # (q, bs)
        dims = (((1,), (1,)), ((), ())) if forward else (((1,), (0,)), ((), ()))
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            yj, l_ref[:], dims, preferred_element_type=acc_ref.dtype,
            precision=_HI,
        )

    @pl.when(i == j)
    def _diag():
        rhs = b_ref[0] - acc_ref[:]  # (q, bs)
        # forward applies W^T, backward applies W (transposed-form algebra)
        dims = (((1,), (1,)), ((), ())) if forward else (((1,), (0,)), ((), ()))
        yi = jax.lax.dot_general(
            rhs, w_ref[0], dims, preferred_element_type=rhs.dtype,
            precision=_HI,
        )
        y_ref[i] = yi
        o_ref[0] = yi


def _tile_order(nb: int, forward: bool):
    """(ri, ci, first) for the substitution sweep's 1D grid.

    Forward: rows ascending, off-diagonal tiles then the diagonal.
    Backward: rows descending, streaming column tiles (j > i) then diag."""
    ri, ci, first = [], [], []
    if forward:
        rows = range(nb)
    else:
        rows = range(nb - 1, -1, -1)
    for i in rows:
        js = list(range(i)) if forward else list(range(nb - 1, i, -1))
        js.append(i)
        for pos, j in enumerate(js):
            ri.append(i)
            ci.append(j)
            first.append(1 if pos == 0 else 0)
    return (
        np.asarray(ri, np.int32),
        np.asarray(ci, np.int32),
        np.asarray(first, np.int32),
    )


def _subst_pass(L, W, Bt, *, forward: bool, bs: int, interpret: bool):
    """One full substitution sweep.  ``Bt``: (nb, q, bs) transposed rhs;
    returns the solution in the same layout."""
    n = L.shape[0]
    nb = n // bs
    q = Bt.shape[1]
    ri, ci, first = _tile_order(nb, forward)
    ntiles = int(ri.shape[0])

    # the streamed L tile: forward reads (i, j); backward reads (j, i)
    if forward:
        l_map = lambda t, ri, ci, fi: (ri[t], ci[t])
    else:
        l_map = lambda t, ri, ci, fi: (ci[t], ri[t])

    return pl.pallas_call(
        functools.partial(_subst_kernel, forward=forward, q=q, bs=bs),
        out_shape=jax.ShapeDtypeStruct((nb, q, bs), Bt.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((bs, bs), l_map),
                pl.BlockSpec((1, bs, bs), lambda t, ri, ci, fi: (ri[t], 0, 0)),
                pl.BlockSpec((1, q, bs), lambda t, ri, ci, fi: (ri[t], 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, q, bs), lambda t, ri, ci, fi: (ri[t], 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((nb, q, bs), Bt.dtype),
                pltpu.VMEM((q, bs), Bt.dtype),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * q * bs * bs,
            bytes_accessed=int(ntiles * bs * bs * 4 + 3 * n * q * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(ri), jnp.asarray(ci), jnp.asarray(first), L, W, Bt)


def _diag_block_inverses(L, bs: int):
    """W[i] = inv(L_ii) for the (bs, bs) diagonal blocks — ONE batched
    triangular-solve custom call (the blocks are independent)."""
    n = L.shape[0]
    nb = n // bs
    D = jnp.stack([L[i * bs : (i + 1) * bs, i * bs : (i + 1) * bs] for i in range(nb)])
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=L.dtype), (nb, bs, bs))
    return jax.lax.linalg.triangular_solve(
        D, eye, left_side=True, lower=True
    )


def _diag_inv_kernel(l_ref, o_ref, *, b: int, sw: int):
    """Invert one (b, b) lower-triangular diagonal tile entirely in VMEM
    via the bottom-up strip scheme of ops/pallas_panel._inv_upper (the
    validated panel-factorizer inverse): W = inv(L_ii) = inv_upper(L_ii^T)^T.
    The strict upper of the streamed tile is masked (defensive — the
    factorizers emit exact zeros there, but the contract is lower-only)."""
    from .pallas_panel import _inv_upper

    tile = l_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    low = jnp.where(rows >= cols, tile, 0.0)
    o_ref[0] = _inv_upper(low.T, b, sw).T


def _diag_block_inverses_pallas(
    L, bs: int, *, sw: int = 8, interpret: bool = False
):
    """Pallas replacement for :func:`_diag_block_inverses`: each diagonal
    tile is inverted in VMEM (no XLA triangular-solve custom call, whose
    batched TPU lowering runs a sequential blocked substitution per block).
    Tiles up to 512 invert directly; bs=1024 combines pairs of 512-tile
    inverses with the block-triangular identity
    ``inv([[A,0],[C,D]]) = [[inv(A),0],[-inv(D) C inv(A), inv(D)]]``
    (two batched MXU GEMMs — no extra custom calls)."""
    n = L.shape[0]
    if bs <= 512:
        nb = n // bs
        return pl.pallas_call(
            functools.partial(_diag_inv_kernel, b=bs, sw=sw),
            out_shape=jax.ShapeDtypeStruct((nb, bs, bs), L.dtype),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((bs, bs), lambda i: (i, i), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, bs, bs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(L)
    if bs != 1024:
        raise ValueError(f"_diag_block_inverses_pallas: unsupported bs={bs}")
    h = 512
    W = _diag_block_inverses_pallas(L, h, sw=sw, interpret=interpret)
    nb = n // bs
    W1, W2 = W[0::2], W[1::2]  # (nb, h, h) each
    C = jnp.stack(
        [L[i * bs + h : (i + 1) * bs, i * bs : i * bs + h] for i in range(nb)]
    )
    off = -jnp.einsum(
        "bij,bjk,bkl->bil", W2, C, W1, precision=jax.lax.Precision.HIGHEST
    )
    top = jnp.concatenate([W1, jnp.zeros_like(W1)], axis=2)
    bot = jnp.concatenate([off, W2], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _diag_inv_mode() -> str:
    """'xla' (batched triangular-solve custom call, the measured round-1
    path) or 'pallas' (in-VMEM strip inverses).  GPR_SOLVE_DIAGINV
    overrides for on-chip A/B."""
    import os

    return os.environ.get("GPR_SOLVE_DIAGINV", "xla")


def solve_narrow_usable(
    n: int, q: int, dtype, bs: int = 512, allow_interpret: bool = False
) -> bool:
    """The streaming kernel applies to f32, bs-aligned n, skinny rhs, on a
    real TPU backend (``allow_interpret`` admits the interpret-mode path so
    the CPU test suite can exercise the dispatch)."""
    return (
        dtype == jnp.float32
        and n % bs == 0
        and n // bs >= 2
        and q <= 128
        and (allow_interpret or jax.default_backend() == "tpu")
    )


def cho_solve_narrow(
    L: jax.Array,
    B: jax.Array,
    *,
    bs: int = 512,
    interpret: bool = False,
    diag_inv: str | None = None,
) -> jax.Array:
    """Solve (L L^T) X = B for skinny B via the streaming substitution
    kernels.  ``L``: (n, n) lower-triangular with n % bs == 0; ``B``:
    (n, q) with small q.  Reads only the lower triangle of L.
    ``diag_inv``: 'xla' or 'pallas' block-inverse path (None reads
    GPR_SOLVE_DIAGINV when this function is called/traced — an enclosing
    jitted program still bakes the value read at ITS trace time, like any
    env-resolved dispatch flag).

    Differentiable: ``pallas_call`` has no autodiff rule, so the function
    carries a ``custom_vjp`` — the pullback is one more narrow solve
    ``W = (L L^T)^{-1} X̄`` plus two O(n² q) GEMMs,
    ``L̄ = -tril(W (X^T L) + X (W^T L))``, ``B̄ = W`` — keeping the narrow
    schedule safe under ``jax.grad`` (MLL gradients, HMC log-posteriors)."""
    if diag_inv is None:
        diag_inv = _diag_inv_mode()
    if B.ndim == 1:
        return _cho_solve_narrow_diff(
            L, B[:, None], bs, interpret, diag_inv
        )[:, 0]
    return _cho_solve_narrow_diff(L, B, bs, interpret, diag_inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cho_solve_narrow_diff(L, B, bs, interpret, diag_inv):
    return _cho_solve_narrow_impl(
        L, B, bs=bs, interpret=interpret, diag_inv=diag_inv
    )


def _cho_solve_narrow_fwd(L, B, bs, interpret, diag_inv):
    X = _cho_solve_narrow_impl(
        L, B, bs=bs, interpret=interpret, diag_inv=diag_inv
    )
    return X, (L, X)


def _cho_solve_narrow_bwd(bs, interpret, diag_inv, res, X_bar):
    from ..utils.config import matmul_precision

    L, X = res
    prec = matmul_precision()
    W = _cho_solve_narrow_impl(
        L, X_bar, bs=bs, interpret=interpret, diag_inv=diag_inv
    )
    # X = (L L^T)^{-1} B: A_bar = -W X^T, L_bar = (A_bar + A_bar^T) L,
    # contracted in O(n^2 q) as W (X^T L) + X (W^T L); only tril(L) is
    # read so the cotangent lives in the lower triangle
    M1 = jnp.matmul(X.T, L, precision=prec)  # (q, n)
    M2 = jnp.matmul(W.T, L, precision=prec)  # (q, n)
    L_bar = -jnp.tril(
        jnp.matmul(W, M1, precision=prec) + jnp.matmul(X, M2, precision=prec)
    )
    return L_bar, W


_cho_solve_narrow_diff.defvjp(_cho_solve_narrow_fwd, _cho_solve_narrow_bwd)


@functools.partial(jax.jit, static_argnames=("bs", "interpret", "diag_inv"))
def _cho_solve_narrow_impl(
    L: jax.Array,
    B: jax.Array,
    *,
    bs: int,
    interpret: bool,
    diag_inv: str,
) -> jax.Array:
    n = L.shape[0]
    if B.ndim == 1:
        return _cho_solve_narrow_impl(
            L, B[:, None], bs=bs, interpret=interpret, diag_inv=diag_inv
        )[:, 0]
    q = B.shape[1]
    nb = n // bs
    if n % bs or L.shape != (n, n) or B.shape[0] != n:
        raise ValueError(f"cho_solve_narrow: bad shapes {L.shape} {B.shape}")

    if diag_inv == "pallas":
        W = _diag_block_inverses_pallas(L, bs, interpret=interpret)
    else:
        W = _diag_block_inverses(L, bs)
    # transposed block layout: (n, q) -> (q, n) -> (nb, q, bs)
    Bt = jnp.transpose(B).reshape(q, nb, bs).transpose(1, 0, 2)
    Yt = _subst_pass(L, W, Bt, forward=True, bs=bs, interpret=interpret)
    Xt = _subst_pass(L, W, Yt, forward=False, bs=bs, interpret=interpret)
    return jnp.transpose(Xt.transpose(1, 0, 2).reshape(q, n))
