"""Pallas batched Cholesky for GP fleets (many small SPD matrices).

The fleet regime (SURVEY.md §7: B independent small GPs trained as one
batched program, the TPU replacement for the reference's one-process-per-
model loop around lib/GaussianProcess.cpp:641-672) is latency-bound under
XLA: the batched ``potrf`` custom call at (B, 512, 512) measures 13.5 ms
on v5e and a vmapped blocked recursion 8.6 ms — both a tiny fraction of
the MXU (the math is only ~5.7 GFLOP at B=128).

This module restructures the batch factorization so that

* the O(n^3/3) panel/trailing flops are BATCHED MXU GEMMs (one
  ``dot_general`` per panel step over all B matrices at once), and
* the sequential diagonal-block factorization runs as ONE pallas program
  per panel step for the whole batch: a Cholesky–Crout sweep expressed as
  ``lax.fori_loop`` over columns with full-tile masked rank-1 updates —
  every step is (B, b, b)-shaped VPU work with no data-dependent shapes,
  no custom calls, and no per-matrix dispatch.  The same sweep emits the
  block inverse W = L^{-1} (forward substitution, also masked full-tile),
  so the panel solve below the diagonal is a plain batched GEMM
  ``A_pk @ W^T`` (MAGMA's TRSM-via-TRTRI scheme) instead of a batched
  triangular-solve custom call.

Numerical contract: reads only the lower triangle of each matrix
(``potrf('L')``, same as ops/blocked.py); the emitted factors have
exact-zero strict uppers.  The explicit diagonal-block inverses are safe
for the same reason as ops/blocked.py's leaf_inverse: diagonal Schur
blocks of jitter-guarded SPD matrices have condition bounded by
sqrt(cond(A)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import matmul_precision

_HI = jax.lax.Precision.HIGHEST


def _crout_sweep(S0, g: int, b: int, with_w: bool = True):
    """(L, W = L^{-1}) for ``g`` SPD (b, b) tiles held as one (g, b, b)
    value — THE fleet Cholesky–Crout sweep (single implementation; the
    fused kernel wraps it with g=1).

    Column ``j``'s scaled pivot column comes from a dynamic lane slice;
    the trailing update and the inverse's forward-substitution step are
    full-tile masked rank-1 ops, so every loop iteration has identical
    static shapes (fori_loop-friendly) and the whole sweep vectorizes
    across the batch dimension ``g``.  ``with_w=False`` drops the in-sweep
    inverse (W returned as None): ~half the per-column full-tile passes —
    pair it with XLA's batched triangular-solve-vs-I, which produces W in
    one pass (86 us vs the sweep's per-column costs, round-3 trace)."""
    rows = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

    # mirror the lower triangle (upper input may be undefined) so the
    # masked algebra below sees exact zeros where it expects them
    low = jnp.where(rows >= cols, S0, 0.0)
    S0 = low + jnp.where(rows > cols, S0, 0.0).transpose(0, 2, 1)

    L0 = jnp.zeros_like(S0)
    W0 = jnp.zeros_like(S0) if with_w else jnp.zeros((), S0.dtype)

    def step(j, carry):
        S, L, W = carry
        # Mosaic TC has no dynamic_slice on traced values — extract the
        # pivot column / L row via masked full-tile reductions instead
        # (same cost class as the rank-1 update below).
        colmask = cols == j  # (1,1,b)
        colr = jnp.sum(jnp.where(colmask, S, 0.0), axis=2, keepdims=True)  # (g,b,1)
        # NOTE: piv must reach (g,1,1) through two reduce levels either
        # way, so deriving it from colr costs no extra chain depth — and
        # a fused axis=(1,2) masked reduce is another Mosaic compile
        # abort (SIGABRT, round-4 measured), like iota slices.
        piv = jnp.sum(jnp.where(rows == j, colr, 0.0), axis=1, keepdims=True)
        rd = lax.rsqrt(jnp.maximum(piv, 0.0))
        below = rows >= j  # includes the pivot row
        if not with_w:
            # S's serial chain kept to 4 dependent stages: reduce ->
            # reduce -> reciprocal -> scaled outer subtract.  The rsqrt
            # and the L column write hang OFF the chain (nothing in the
            # next iteration's S reads them).  1/max(piv, 0) preserves
            # the failure contract: a non-positive pivot gives inf ->
            # NaN in both S and L.
            inv = 1.0 / jnp.maximum(piv, 0.0)
            colu_raw = jnp.where(rows > j, colr, 0.0)
            S = S - (colu_raw * inv) * colu_raw.transpose(0, 2, 1)
            L = jnp.where(colmask, jnp.where(below, colr * rd, 0.0), L)
            return S, L, W
        colj = jnp.where(below, colr * rd, 0.0)
        # write column j of L (lane select keeps shapes static)
        L = jnp.where(colmask, colj, L)
        # trailing rank-1 update: strictly-below entries only, so rows/cols
        # <= j are untouched and the next pivot reads updated data
        colu = jnp.where(rows > j, colj, 0.0)
        S = S - colu * colu.transpose(0, 2, 1)
        # inverse, forward substitution: row j of W is
        #   W[j, :j] = -(L[j, :j] @ W[:j, :j]) / L[j, j]
        #   W[j, j]  = 1 / L[j, j]
        # L's row j currently holds exactly its final values for cols <= j
        # (later columns are zero), and W holds rows < j — one masked
        # matvec per step, full-tile static.
        lrow = jnp.sum(jnp.where(rows == j, L, 0.0), axis=1, keepdims=True)  # (g,1,b)
        lrow = jnp.where(cols < j, lrow, 0.0)
        # matvec as broadcast-multiply + row reduction: VPU work, and it
        # sidesteps batched dot_general lowering inside the kernel
        acc = jnp.sum(lrow.transpose(0, 2, 1) * W, axis=1, keepdims=True)
        wrow = -acc * rd + jnp.where(cols == j, rd, 0.0)
        W = jnp.where(rows == j, wrow, W)
        return S, L, W

    def step2(j, carry):
        """Fused pivot PAIR (j, j+1) — the round-5 stat2 trick applied to
        the fleet sweep: both columns extracted in one parallel-reduce
        stage, ONE combined rank-2 trailing update, and the two W
        substitution rows built from parallel matvecs plus a single
        cross term (W[j+1] needs W[j] only through L[j+1, j] * wrow1).
        ~5-6 dependent vector stages per TWO columns vs 8."""
        S, L, W = carry
        j2 = j + 1
        cm1 = cols == j
        cm2 = cols == j2
        # stage 1: both pivot columns of S (parallel masked reduces)
        c1 = jnp.sum(jnp.where(cm1, S, 0.0), axis=2, keepdims=True)  # (g,b,1)
        c2r = jnp.sum(jnp.where(cm2, S, 0.0), axis=2, keepdims=True)
        # stage 2: scalar heads (parallel row reduces)
        p1 = jnp.sum(jnp.where(rows == j, c1, 0.0), axis=1, keepdims=True)
        a = jnp.sum(jnp.where(rows == j2, c1, 0.0), axis=1, keepdims=True)
        p2r = jnp.sum(jnp.where(rows == j2, c2r, 0.0), axis=1, keepdims=True)
        # stage 3
        inv1 = 1.0 / jnp.maximum(p1, 0.0)
        rd1 = lax.rsqrt(jnp.maximum(p1, 0.0))  # off the S chain
        # stage 4: eliminate pivot j from column/pivot j+1
        l21 = a * inv1
        c2 = c2r - l21 * c1
        p2 = p2r - a * a * inv1
        # stage 5
        inv2 = 1.0 / jnp.maximum(p2, 0.0)
        rd2 = lax.rsqrt(jnp.maximum(p2, 0.0))
        # stage 6: combined rank-2 trailing update (strictly below each pivot)
        u1 = jnp.where(rows > j, c1, 0.0)
        u2 = jnp.where(rows > j2, c2, 0.0)
        S = S - (u1 * inv1) * u1.transpose(0, 2, 1) - (
            u2 * inv2
        ) * u2.transpose(0, 2, 1)
        # L columns (off-chain emissions)
        colL1 = jnp.where(rows >= j, c1, 0.0) * rd1
        colL2 = jnp.where(rows >= j2, c2, 0.0) * rd2
        L = jnp.where(cm1, colL1, jnp.where(cm2, colL2, L))
        if not with_w:
            return S, L, W
        # W rows j / j+1: parallel matvecs vs W rows < j, one cross term.
        # L rows (cols < j) come from PRIOR pairs, so both extracts and
        # both acc reductions run in parallel.
        lrow1 = jnp.sum(jnp.where(rows == j, L, 0.0), axis=1, keepdims=True)
        lrow1 = jnp.where(cols < j, lrow1, 0.0)
        lrow2 = jnp.sum(jnp.where(rows == j2, L, 0.0), axis=1, keepdims=True)
        lrow2 = jnp.where(cols < j, lrow2, 0.0)
        acc1 = jnp.sum(lrow1.transpose(0, 2, 1) * W, axis=1, keepdims=True)
        acc2a = jnp.sum(lrow2.transpose(0, 2, 1) * W, axis=1, keepdims=True)
        wrow1 = -acc1 * rd1 + jnp.where(cm1, rd1, 0.0)
        # L[j2, j] = a * rd1 (the pair's own subdiagonal factor entry)
        acc2 = acc2a + (a * rd1) * wrow1
        wrow2 = -acc2 * rd2 + jnp.where(cm2, rd2, 0.0)
        W = jnp.where(rows == j, wrow1, jnp.where(rows == j2, wrow2, W))
        return S, L, W

    # python-unrolled column loop: ``b`` is static, so every column's
    # masks/selects become compile-time CONSTANTS instead of per-iteration
    # iota comparisons against a traced index (the same static-unroll that
    # cut the fused headline kernel's diag chain ~7%, round-4; here the 8
    # crout calls are 62% of the fleet batch — fleet trace anatomy).
    # Round 5: pivot PAIRS fused (step2) — the headline kernel's stat2
    # scheme applied to the fleet sweep.
    # Guard: unrolling 256+ masked steps into one Mosaic kernel turns a
    # large GPR_FLEET_PANEL A/B config into a multi-minute compile — keep
    # the fori_loop above the measured-win sizes.
    if b <= 128:
        carry = (S0, L0, W0)
        j = 0
        while j + 1 < b:
            carry = step2(j, carry)
            j += 2
        if j < b:  # odd b: single-column tail
            carry = step(j, carry)
        _, L, W = carry
    else:
        _, L, W = lax.fori_loop(0, b, step, (S0, L0, W0))
    return L, (W if with_w else None)


def _crout_wi_kernel(a_ref, l_ref, w_ref, *, g: int, b: int):
    L, W = _crout_sweep(a_ref[:], g, b)
    l_ref[:] = L
    w_ref[:] = W


def _crout_l_kernel(a_ref, l_ref, *, g: int, b: int):
    L, _ = _crout_sweep(a_ref[:], g, b, with_w=False)
    l_ref[:] = L


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def crout_chol(A: jax.Array, *, g: int = 0, interpret: bool = False):
    """L = chol for a batch of SPD tiles ``A``: (B, b, b) — the W-free
    sweep (~half the per-column full-tile passes of :func:`crout_chol_wi`);
    pair with XLA's batched triangular-solve-vs-I for the inverse."""
    B, b, b2 = A.shape
    if b != b2:
        raise ValueError(f"crout_chol: square tiles required, got {A.shape}")
    if g <= 0:
        # round-3 g sweep (b=64, per 8-step call): g16 423 us / g32 538 /
        # g64 471 — g16 also wins in-fit (25.6k vs 24.0k fits/s at g32,
        # 21.5k at g8, round-4); target ~256 KB resident
        g = max(1, min(B, (256 * 1024) // (b * b * 4)))
        while B % g:
            g -= 1
    if B % g:
        raise ValueError(f"crout_chol: g={g} must divide B={B}")
    kernel = functools.partial(_crout_l_kernel, g=g, b=b)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, b, b), A.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, b, b), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, b, b), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            # the sweep's masked-reduction temps push the compiler's scoped
            # stack past the 16 MB default at some (g, b); budget explicitly
            # (the round-4 static unroll of the column loop adds ~0.4 MB of
            # stack at g=32/b=64 — measured 20.34M vs the old 20.00M cap)
            vmem_limit_bytes=min(
                12 * g * b * b * A.dtype.itemsize + (20 << 20), 100 << 20
            )
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(B * b * b * b),
            bytes_accessed=int(2 * B * b * b * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(A)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def crout_chol_wi(
    A: jax.Array, *, g: int = 0, interpret: bool = False
):
    """(L, W = L^{-1}) for a batch of SPD tiles ``A``: (B, b, b).

    ``g`` tiles are processed per pallas grid step (default: whole batch
    when it fits VMEM).  Only the lower triangles are read."""
    B, b, b2 = A.shape
    if b != b2:
        raise ValueError(f"crout_chol_wi: square tiles required, got {A.shape}")
    if g <= 0:
        # 3 resident (g, b, b) f32 carries + in/out blocks + loop temps
        # (the masked-reduction column/row extracts add full-tile temps);
        # ~1 MB per carry keeps the measured scoped peak under the 16 MB
        # VMEM limit (2 MB measured 17.27M scoped at b=128 on v5e)
        g = max(1, min(B, (1024 * 1024) // (b * b * 4)))
        while B % g:
            g -= 1
    if B % g:
        raise ValueError(f"crout_chol_wi: g={g} must divide B={B}")
    kernel = functools.partial(_crout_wi_kernel, g=g, b=b)
    return pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            # measured scoped-stack peaks on v5e: 17.27M at (g=2, b=128),
            # 25.75M at (g=3, b=128) — the static-unrolled column sweep's
            # stack grows superlinearly in g at large b, so budget with
            # ~2.7M per (g, b^2) tile plus 18M headroom (the round-4
            # additive 16M cap ABORTED compiles at odd small fleets, e.g.
            # the (3, 128, 128) bwd-path solve)
            vmem_limit_bytes=min(
                42 * g * b * b * A.dtype.itemsize + (18 << 20), 100 << 20
            )
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, b, b), A.dtype),
            jax.ShapeDtypeStruct((B, b, b), A.dtype),
        ),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, b, b), lambda i: (i, 0, 0))],
        out_specs=(
            pl.BlockSpec((g, b, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, b, b), lambda i: (i, 0, 0)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * b * b * b),
            bytes_accessed=int(3 * B * b * b * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(A)


def batched_usable(n: int, dtype, panel: int = 128) -> bool:
    """The batched panel factorizer applies to f32 fleets with
    panel-aligned n on a real TPU (interpret mode is for tests)."""
    return (
        dtype == jnp.float32
        and n % panel == 0
        and n >= panel
        and jax.default_backend() == "tpu"
    )


def _diag_impl() -> str:
    """Diagonal-block factor+inverse implementation for the fleet sweep:
    'crout' (the pallas masked rank-1 sweep) or 'xla' (batched potrf +
    batched triangular-solve-vs-I custom calls).  Trace anatomy (round 3,
    BENCHMARKS.md) showed the crout sweep IS the fleet fit: 4 calls of
    3.46 ms each = 13.8 of the 16.4 ms batch — the masked full-tile
    formulation costs ~10 full-tile VPU passes per column.  XLA's batched
    128-block custom calls do the same work in one pass each.
    GPR_FLEET_DIAG overrides for A/B."""
    import os

    return os.environ.get("GPR_FLEET_DIAG", _FLEET_DIAG_DEFAULT)


_FLEET_DIAG_DEFAULT = "crout_xlaw"  # round-3 on-chip A/B (exp_fleet_r3.py),
# B=128 n=512 ms/batch: crout p128 14.9 / xla p128 14.0 / xla p64 9.8 /
# crout_xlaw p64 7.5 (17118 fits/s) — XLA's batched potrf loops column-by-
# column (~12 us/col, 0.88 ms per 64-block step); the W-free pallas sweep
# factors the diag blocks in ~1/4 of that and the batched trisolve-vs-I
# custom call produces W in one ~86 us pass


def _crout_blocked_L(D: jax.Array, bs: int, interpret: bool):
    """L = chol(D) for (B, p, p) SPD blocks via TWO-LEVEL blocking: the
    crout sweep runs only on (B, bs, bs) SUB-blocks (its per-column cost
    grows with tile width — the round-4 fleet panel sweep showed p=32
    sweeps beating p=64 while p=128 trailing GEMMs beat p=32's), and the
    inter-sub-block corrections/solves are batched MXU GEMMs against the
    sub-block inverses (one XLA batched trisolve-vs-I per step)."""
    from ..utils.config import matmul_precision

    prec = matmul_precision()
    p = D.shape[-1]
    nb = p // bs
    if nb <= 1:
        return crout_chol(D, interpret=interpret)
    mm = functools.partial(
        jnp.matmul, precision=prec, preferred_element_type=D.dtype
    )
    blk = lambda i, m: D[:, i * bs:(i + 1) * bs, m * bs:(m + 1) * bs]
    L = [[None] * nb for _ in range(nb)]
    eye = jnp.broadcast_to(
        jnp.eye(bs, dtype=D.dtype), (D.shape[0], bs, bs)
    )
    for k in range(nb):
        S = blk(k, k)
        for m in range(k):
            S = S - mm(L[k][m], L[k][m].transpose(0, 2, 1))
        Lkk = crout_chol(S, interpret=interpret)
        Wkk = jax.lax.linalg.triangular_solve(
            Lkk, eye, left_side=True, lower=True
        )
        L[k][k] = Lkk
        WT = Wkk.transpose(0, 2, 1)
        for i in range(k + 1, nb):
            R = blk(i, k)
            for m in range(k):
                R = R - mm(L[i][m], L[k][m].transpose(0, 2, 1))
            L[i][k] = mm(R, WT)
    z = jnp.zeros_like(eye)
    return jnp.concatenate(
        [
            jnp.concatenate(
                [L[i][m] if m <= i else z for m in range(nb)], axis=2
            )
            for i in range(nb)
        ],
        axis=1,
    )


def diag_factor_inverse(D: jax.Array, *, interpret: bool = False):
    """(L, W=L^{-1}) for a batch of SPD diagonal blocks (B, b, b),
    dispatching per :func:`_diag_impl`."""
    impl = _diag_impl()
    if impl == "crout":
        return crout_chol_wi(D, interpret=interpret)
    if impl == "crout_xlaw":
        # W-free pallas sweep for L + one XLA batched trisolve for W
        L = crout_chol(D, interpret=interpret)
    elif impl.startswith("crout2"):
        # two-level: crout sweeps on 32-sub-blocks + GEMM corrections
        bs = int(impl[6:] or 32)
        L = _crout_blocked_L(D, bs, interpret)
    else:
        L = jax.lax.linalg.cholesky(D, symmetrize_input=False)
    eye = jnp.broadcast_to(
        jnp.eye(D.shape[-1], dtype=D.dtype), D.shape
    )
    W = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return L, W


def cholesky_batched(
    A: jax.Array, *, panel: int = 128, interpret: bool = False,
    return_winv: bool = False,
):
    """Lower Cholesky factors of a fleet ``A``: (B, n, n), via a
    right-looking panel sweep whose diagonal blocks factor in ONE pallas
    program per step (``crout_chol_wi``) and whose panel solves/trailing
    updates are batched MXU GEMMs.  Reads only lower triangles; strict
    uppers of the result are exactly zero.

    With ``return_winv`` also returns the diagonal-block inverses
    ``W``: (B, nb, panel, panel) — the sweep emits them for free, and
    ``cho_solve_batched`` can reuse them instead of re-deriving."""
    B, n, n2 = A.shape
    if n != n2 or n % panel:
        raise ValueError(f"cholesky_batched: bad shape {A.shape} panel={panel}")
    nb = n // panel
    prec = matmul_precision()

    S = A
    # per panel step k: cols[k] holds the (B, n - k*panel, panel) factor
    # column (diagonal block + below-panel rows)
    cols = []
    winvs = []
    for k in range(nb):
        D = S[:, :panel, :panel]
        Lkk, Wkk = diag_factor_inverse(D, interpret=interpret)
        winvs.append(Wkk)
        if n - (k + 1) * panel > 0:
            Apk = S[:, panel:, :panel]  # (B, m, panel)
            # P = A_pk @ L_kk^{-T}: batched GEMM against the in-sweep inverse
            P = jax.lax.dot_general(
                Apk, Wkk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=A.dtype, precision=prec,
            )
            # trailing Schur update (batched MXU GEMM)
            S = S[:, panel:, panel:] - jax.lax.dot_general(
                P, P, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=A.dtype, precision=prec,
            )
            cols.append(jnp.concatenate([Lkk, P], axis=1))
        else:
            cols.append(Lkk)
    out_cols = []
    for k, C in enumerate(cols):
        pad = jnp.zeros((B, k * panel, panel), A.dtype)
        out_cols.append(jnp.concatenate([pad, C], axis=1))
    Lout = jnp.concatenate(out_cols, axis=2)
    if return_winv:
        return Lout, jnp.stack(winvs, axis=1)
    return Lout


def cho_solve_batched(
    L: jax.Array, Bmat: jax.Array, *, panel: int = 128,
    interpret: bool = False, winv: jax.Array | None = None,
) -> jax.Array:
    """Solve (L L^T) X = B for a fleet, using the block substitution with
    diagonal-block inverses (batched GEMMs only, no triangular-solve
    custom calls).  ``L``: (B, n, n); ``Bmat``: (B, n, q); ``winv``
    (optional): the (B, nb, p, p) diagonal-block inverses from
    ``cholesky_batched(..., return_winv=True)``."""
    Bsz, n, _ = L.shape
    if n % panel:
        raise ValueError(f"cho_solve_batched: n={n} not a multiple of panel={panel}")
    nb = n // panel
    prec = matmul_precision()
    if winv is not None:
        W = winv
    else:
        D = jnp.stack(
            [L[:, i * panel : (i + 1) * panel, i * panel : (i + 1) * panel]
             for i in range(nb)], axis=1,
        )  # (B, nb, p, p)
        if _diag_impl() == "xla":
            Dr = D.reshape(Bsz * nb, panel, panel)
            eye = jnp.broadcast_to(
                jnp.eye(panel, dtype=L.dtype), Dr.shape
            )
            W = jax.lax.linalg.triangular_solve(
                Dr, eye, left_side=True, lower=True
            ).reshape(Bsz, nb, panel, panel)
        else:
            # chol(D D^T) == D for lower-triangular D with positive
            # diagonal, so one batched GEMM + the fused factor+inverse
            # sweep yields W = inv(D) for every diagonal block without a
            # triangular-solve custom call
            _, W = crout_chol_wi(
                jax.lax.dot_general(
                    D, D, (((3,), (3,)), ((0, 1), (0, 1))),
                    preferred_element_type=L.dtype, precision=_HI,
                ).reshape(Bsz * nb, panel, panel),
                interpret=interpret,
            )
            W = W.reshape(Bsz, nb, panel, panel)

    def blk(M, i):
        return M[:, i * panel : (i + 1) * panel]

    def wdot(Wi, V):  # (B,p,p) x (B,p,q)
        return jax.lax.dot_general(
            Wi, V, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=V.dtype, precision=prec,
        )

    def ldot(Lij, V):  # (B,p,p) x (B,p,q)
        return jax.lax.dot_general(
            Lij, V, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=V.dtype, precision=prec,
        )

    # forward: y_i = W_ii (b_i - sum_{j<i} L_ij y_j)
    ys = []
    for i in range(nb):
        rhs = blk(Bmat, i)
        for j in range(i):
            Lij = L[:, i * panel : (i + 1) * panel, j * panel : (j + 1) * panel]
            rhs = rhs - ldot(Lij, ys[j])
        ys.append(wdot(W[:, i], rhs))
    # backward: x_i = W_ii^T (y_i - sum_{j>i} L_ji^T x_j)
    xs = [None] * nb
    for i in range(nb - 1, -1, -1):
        rhs = ys[i]
        for j in range(i + 1, nb):
            Lji = L[:, j * panel : (j + 1) * panel, i * panel : (i + 1) * panel]
            rhs = rhs - jax.lax.dot_general(
                Lji, xs[j], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=rhs.dtype, precision=prec,
            )
        xs[i] = jax.lax.dot_general(
            W[:, i], rhs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=rhs.dtype, precision=prec,
        )
    return jnp.concatenate(xs, axis=1)


# ---------------------------------------------------------------------------
# fused whole-fleet kernel: factor + solve per matrix entirely in VMEM
# ---------------------------------------------------------------------------

def _crout_sweep_2d(S0, p, dtype):
    """(L, W=L^{-1}) of one SPD (p, p) tile: the shared fleet sweep with a
    unit batch axis."""
    del dtype
    L, W = _crout_sweep(S0[None], 1, p)
    return L[0], W[0]


def _fleet_kernel(a_ref, y_ref, l_ref, x_ref, *, n: int, p: int, q: int):
    """One grid step = one fleet member: blocked Crout factorization with
    in-VMEM Schur updates, then block forward/backward substitution with
    the in-sweep diagonal inverses.  The whole n x n state lives as traced
    values; the only HBM traffic is one read of (A, Y) and one write of
    (L, X) per matrix."""
    dtype = a_ref.dtype
    # Mosaic supports only the DEFAULT and HIGHEST dot precisions
    # (pallas_syrk.py:44-49); the 'high' tier string would be rejected or
    # silently degraded.  The fleet regime is latency-bound, so HIGHEST
    # (bf16x6, exact f32) costs nothing measurable here.
    prec = _HI
    nb = n // p
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    A = a_ref[0]
    # symmetrize from the lower triangle once; Schur updates preserve it
    A = jnp.where(rows >= cols, A, 0.0) + jnp.where(rows > cols, A, 0.0).T

    S = A
    Ps = []  # Ps[k]: (n - (k+1) p, p) below-diagonal panel of column k
    Ws = []  # Ws[k]: (p, p) inverse of diagonal block k
    Ls = []
    for k in range(nb):
        D = S[:p, :p]
        Lkk, Wkk = _crout_sweep_2d(D, p, dtype)
        Ls.append(Lkk)
        Ws.append(Wkk)
        m = n - (k + 1) * p
        if m > 0:
            P = jax.lax.dot_general(
                S[p:, :p], Wkk, (((1,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec,
            )
            Ps.append(P)
            S = S[p:, p:] - jax.lax.dot_general(
                P, P, (((1,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec,
            )
        else:
            Ps.append(None)

    # assemble L in one write: build full columns then concatenate
    colblocks = []
    for k in range(nb):
        body = Ls[k] if Ps[k] is None else jnp.concatenate([Ls[k], Ps[k]], 0)
        if k > 0:  # Mosaic rejects zero-sized vectors: no (0, p) pads
            body = jnp.concatenate([jnp.zeros((k * p, p), dtype), body], 0)
        colblocks.append(body)
    l_ref[0] = jnp.concatenate(colblocks, axis=1)

    def lblk(i, j):  # L[i, j] block for i > j, from column j's panel
        return Ps[j][(i - j - 1) * p : (i - j) * p]

    Y = y_ref[0]
    ys = []
    for i in range(nb):
        rhs = Y[i * p : (i + 1) * p]
        for j in range(i):
            rhs = rhs - jax.lax.dot_general(
                lblk(i, j), ys[j], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=prec,
            )
        ys.append(jax.lax.dot_general(
            Ws[i], rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=prec,
        ))
    xs = [None] * nb
    for i in range(nb - 1, -1, -1):
        rhs = ys[i]
        for j in range(i + 1, nb):
            rhs = rhs - jax.lax.dot_general(
                lblk(j, i), xs[j], (((0,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=prec,
            )
        xs[i] = jax.lax.dot_general(
            Ws[i], rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=prec,
        )
    x_ref[0] = jnp.concatenate(xs, axis=0)


# whole-matrix state must fit VMEM: ~4 resident (n, n) f32 values.
# GPR_FLEET_FUSED_MAX_N overrides; DEFAULT 0 = fused path off.  Measured
# on v5e (B=128): fused loses to the panel-stepped sweep at every size
# (n=256: 7.3k vs 18.5k fits/s; n=512: 3.6k vs 8.2k) — one grid step per
# matrix serializes the whole factorization on one core, while the
# stepped path batches the MXU GEMMs across the fleet.
_FLEET_FUSED_MAX_N = int(__import__("os").environ.get(
    "GPR_FLEET_FUSED_MAX_N", 0
))


@functools.partial(jax.jit, static_argnames=("panel", "interpret"))
def factor_solve_fused(
    A: jax.Array, Y: jax.Array, *, panel: int = 128, interpret: bool = False
):
    """(L, alpha) for a fleet in ONE pallas dispatch.

    ``A``: (B, n, n) SPD (lower triangles read), ``Y``: (B, n, q).
    Each grid step factors one matrix entirely in VMEM (blocked Crout,
    MXU panel/trailing GEMMs) and runs the block substitution — no
    inter-panel HBM round-trips, no per-stage dispatches."""
    B, n, n2 = A.shape
    q = Y.shape[-1]
    if n != n2 or n % panel or Y.ndim != 3 or Y.shape[:2] != (B, n):
        raise ValueError(f"factor_solve_fused: bad shapes {A.shape} {Y.shape}")
    kernel = functools.partial(_fleet_kernel, n=n, p=panel, q=q)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, n, n), A.dtype),
            jax.ShapeDtypeStruct((B, n, q), A.dtype),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, q), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, q), lambda i: (i, 0, 0)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(B * (n**3 / 3 + 2 * n * n * q)),
            bytes_accessed=int(2 * B * n * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, Y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def factor_solve_batched_diff(K, Y, panel: int = 128, interpret: bool = False):
    """(L, alpha) for a fleet — the pallas panel-stepped factor + block
    substitution, wrapped in ONE ``custom_vjp`` so gradient paths
    (``mll_batched`` under ``jax.grad``, fleet hyperparameter fitting)
    can use the fast kernels: pallas calls have no native autodiff rule,
    and the round-3 default therefore pinned differentiated fleets to
    XLA's slow batched potrf.

    Pullback (first order, standard results; cf. ``linalg._chol_pullback``
    and ``pallas_solve._cho_solve_narrow_bwd``): with alpha = K^{-1} Y,

      Kbar = chol_pullback(L, Lbar)
             - sym(W alpha^T),  W = K^{-1} alphabar   (solve-path term)
      Ybar = W

    All bwd ops are batched GEMMs + one more fleet solve — the backward
    pass runs the SAME fast kernels as the forward."""
    L, Winv = cholesky_batched(
        K, panel=panel, interpret=interpret, return_winv=True
    )
    alpha = cho_solve_batched(
        L, Y, panel=panel, interpret=interpret, winv=Winv
    )
    return L, alpha


def _fsb_fwd(K, Y, panel, interpret):
    L, Winv = cholesky_batched(
        K, panel=panel, interpret=interpret, return_winv=True
    )
    alpha = cho_solve_batched(
        L, Y, panel=panel, interpret=interpret, winv=Winv
    )
    return (L, alpha), (L, Winv, alpha)


def _fsb_bwd(panel, interpret, res, cts):
    from .linalg import _chol_pullback

    L, Winv, alpha = res
    Lbar, abar = cts
    prec = matmul_precision()
    # solve-path: W = K^{-1} abar via the same fleet solve
    W = cho_solve_batched(
        L, abar, panel=panel, interpret=interpret, winv=Winv
    )
    Ka = jnp.matmul(
        W, alpha.transpose(0, 2, 1), precision=prec,
        preferred_element_type=L.dtype,
    )
    Kbar = -0.5 * (Ka + Ka.transpose(0, 2, 1))
    Kbar = Kbar + _chol_pullback(L, Lbar)
    return Kbar, W


factor_solve_batched_diff.defvjp(_fsb_fwd, _fsb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def factor_solve_fused_diff(K, Y, panel: int = 128, interpret: bool = False):
    """``factor_solve_fused`` with the same custom_vjp pullback as
    ``factor_solve_batched_diff`` — so the opt-in fused fleet path
    (``GPR_FLEET_FUSED_MAX_N``) stays differentiable: without this,
    ``jax.grad(mll_batched)`` on the fused branch would hit the raw
    pallas kernel (no autodiff rule) and error.  The backward pass reuses
    the panel-stepped fleet solve (diagonal-block inverses re-derived from
    L; the fused kernel does not emit them)."""
    return factor_solve_fused(K, Y, panel=panel, interpret=interpret)


def _fsf_fwd(K, Y, panel, interpret):
    L, alpha = factor_solve_fused(K, Y, panel=panel, interpret=interpret)
    return (L, alpha), (L, alpha)


def _fsf_bwd(panel, interpret, res, cts):
    L, alpha = res
    return _fsb_bwd(panel, interpret, (L, None, alpha), cts)


factor_solve_fused_diff.defvjp(_fsf_fwd, _fsf_bwd)
