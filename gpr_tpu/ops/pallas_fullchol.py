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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_panel import _strip_factor, _inv_upper

_HI = jax.lax.Precision.HIGHEST
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


def _factor_diag_wi(D, p, b, sw):
    """(L, W = inv(L)) of one (p, p) diagonal block VALUE.

    Blocked Crout over (b, b) sub-blocks: strip-factor + strip-inverse on
    the diagonal (pallas_panel's rank-sw scheme), GEMM corrections and
    inverse back-substitution everywhere else.  Input is lower-defined
    (strict upper may be garbage: diagonal sub-blocks are mirrored, upper
    sub-blocks never read).  All dots at HIGHEST — diagonal flops are
    negligible and anchor the factorization's error."""
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
    z = jnp.zeros((b, b), D.dtype)
    Lf = jnp.concatenate(
        [
            jnp.concatenate(
                [L[i][j] if j <= i else z for j in range(nb)], axis=1
            )
            for i in range(nb)
        ],
        axis=0,
    )
    Wf = jnp.concatenate(
        [
            jnp.concatenate(
                [W[i][j] if j <= i else z for j in range(nb)], axis=1
            )
            for i in range(nb)
        ],
        axis=0,
    )
    return Lf, Wf


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16).astype(x.dtype)
    return hi, x - hi


def _d16(x, y):
    """One bf16 MXU pass (operands are bf16-exact f32 values)."""
    return jax.lax.dot_general(
        x, y, _NT, preferred_element_type=x.dtype,
        precision=jax.lax.Precision.DEFAULT,
    )


def _fused_kernel(
    a_hbm, o_hbm, p_buf, t_buf, rhi, rlo,
    sem_in, sem_t, sem_z, sem_o,
    *, n: int, p: int, b: int, sw: int, nc: int, h: int, ablate: str,
):
    j = pl.program_id(0)

    def out_cp(c, sem):
        return pltpu.make_async_copy(
            p_buf.at[c],
            o_hbm.at[pl.ds(c * p, p), pl.ds(j * p, p)],
            sem,
        )

    # --- 1. panel strip in (only the rows this panel owns) -----------------
    def in_cp(c):
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(c * p, p), pl.ds(j * p, p)],
            p_buf.at[c],
            sem_in,
        )

    def istart(c, _):
        in_cp(c).start()
        return 0

    jax.lax.fori_loop(j, nc, istart, 0)

    # --- 2. strict-upper chunks: zero and stream out (overlaps step 3) ----
    def zbody(c, _):
        p_buf[c] = jnp.zeros((p, p), p_buf.dtype)
        out_cp(c, sem_z).start()
        return 0

    jax.lax.fori_loop(0, j, zbody, 0)

    def iwait(c, _):
        in_cp(c).wait()
        return 0

    jax.lax.fori_loop(j, nc, iwait, 0)

    # --- 3. left-looking update, double-buffered tile stream --------------
    # Chunks are (2p, p) tiles aligned to the panel start (row j*p), with a
    # (p, p) tail when the remaining span is odd — the double-height tile
    # halves the loop-iteration count and gives the MXU a (2p, p, p)
    # contraction per step.  k-major order: each segment's first chunk
    # (u == 0) contains the row block R_k = L[j*p:(j+1)*p, k*p:...] in its
    # top half, whose bf16 split is parked for the whole segment.
    span = nc - j
    nfull = span // h  # (h*p)-row chunks per segment
    ntail = span - h * nfull  # 0..h-1 trailing (p)-row chunks
    per_k = nfull + ntail
    total = j * per_k

    def full_cp(slot, k, u):
        return pltpu.make_async_copy(
            o_hbm.at[pl.ds(j * p + u * (h * p), h * p), pl.ds(k * p, p)],
            t_buf.at[slot],
            sem_t.at[slot],
        )

    def tail_cp(slot, k, u):
        # tail chunks cover p rows each, after the nfull full chunks
        off = j * p + (nfull * h + (u - nfull)) * p
        return pltpu.make_async_copy(
            o_hbm.at[pl.ds(off, p), pl.ds(k * p, p)],
            t_buf.at[slot, pl.ds(0, p), :],
            sem_t.at[slot],
        )

    def start_dma(slot, k, u):
        @pl.when(u < nfull)
        def _():
            full_cp(slot, k, u).start()

        @pl.when(u >= nfull)
        def _():
            tail_cp(slot, k, u).start()

    def wait_dma(slot, k, u):
        @pl.when(u < nfull)
        def _():
            full_cp(slot, k, u).wait()

        @pl.when(u >= nfull)
        def _():
            tail_cp(slot, k, u).wait()

    @pl.when(total > 0)
    def _():
        start_dma(0, 0, 0)

    def ubody(it, ku):
        k, u = ku
        slot = jax.lax.rem(it, 2)
        wrap = u + 1 == per_k
        kn = jnp.where(wrap, k + 1, k)
        un = jnp.where(wrap, 0, u + 1)

        @pl.when(it + 1 < total)
        def _():
            start_dma(1 - slot, kn, un)

        wait_dma(slot, k, u)

        @pl.when(u < nfull)
        def _():
            t = t_buf[slot]  # (h*p, p)
            thi, tlo = _bf16_split(t)

            @pl.when(u == 0)
            def _():
                rhi[:] = thi[0:p]
                rlo[:] = tlo[0:p]

            if ablate == "dots":  # timing ablation: no MXU work
                acc = thi + tlo
            else:
                acc = _d16(thi, rhi[:])
                acc += _d16(thi, rlo[:])
                acc += _d16(tlo, rhi[:])
            if ablate != "rmw":  # timing ablation: no p_buf subtract
                c0 = j + u * h
                for q in range(h):
                    p_buf[c0 + q] -= acc[q * p : (q + 1) * p]
            else:
                rhi[0:1, 0:1] = acc[0:1, 0:1]

        @pl.when(u >= nfull)
        def _():
            t = t_buf[slot, 0:p, :]  # (p, p) tail
            thi, tlo = _bf16_split(t)

            @pl.when(u == 0)
            def _():
                # span < h: the first tail chunk IS the row block R_k
                rhi[:] = thi
                rlo[:] = tlo

            if ablate == "dots":
                acc = thi + tlo
            else:
                acc = _d16(thi, rhi[:])
                acc += _d16(thi, rlo[:])
                acc += _d16(tlo, rhi[:])
            ct = j + nfull * h + (u - nfull)
            if ablate != "rmw":
                p_buf[ct] -= acc
            else:
                rlo[0:1, 0:1] = acc[0:1, 0:1]

        return (kn, un)

    jax.lax.fori_loop(
        0, total, ubody, (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    )

    # --- 4. diagonal factor + inverse, in VMEM -----------------------------
    D = p_buf[j]
    if ablate == "diag":  # timing ablation: skip the factor (garbage result)
        Ld, W = D, jnp.eye(p, dtype=D.dtype)
    else:
        Ld, W = _factor_diag_wi(D, p, b, sw)
    p_buf[j] = Ld
    out_cp(j, sem_o).start()
    whi, wlo = _bf16_split(W)

    # --- 5. panel solve as GEMMs vs W, streamed out ------------------------
    def sbody(c, _):
        if ablate != "solve":  # timing ablation: skip the solve GEMMs
            Pc = p_buf[c]
            phi, plo = _bf16_split(Pc)
            Lc = _d16(phi, whi) + (_d16(phi, wlo) + _d16(plo, whi))
            p_buf[c] = Lc
        out_cp(c, sem_o).start()
        return 0

    jax.lax.fori_loop(j + 1, nc, sbody, 0)

    # --- 6. drain output DMAs (step j+1 reads column j) --------------------
    def zwait(c, _):
        out_cp(c, sem_z).wait()
        return 0

    jax.lax.fori_loop(0, j, zwait, 0)

    def owait(c, _):
        out_cp(c, sem_o).wait()
        return 0

    jax.lax.fori_loop(j, nc, owait, 0)


@functools.partial(
    jax.jit, static_argnames=("panel", "block", "sw", "chunk", "interpret", "ablate")
)
def cholesky_fused(
    A: jax.Array,
    *,
    panel: int = 512,
    block: int = 256,
    sw: int = 16,
    chunk: int = 2,
    interpret: bool = False,
    ablate: str = "",
) -> jax.Array:
    """Lower Cholesky factor of SPD ``A`` — the whole factorization as a
    single pallas dispatch (see module docstring).

    ``A``: (n, n) f32 with n a multiple of ``panel``; only the lower
    triangle is read.  Returns L with exact-zero strict upper."""
    n = A.shape[0]
    if A.ndim != 2 or A.shape != (n, n) or n % panel or panel % block:
        raise ValueError(
            f"cholesky_fused: shape {A.shape} must be (n, n) with "
            f"n % {panel} == 0 and panel % {block} == 0"
        )
    nc = n // panel
    kernel = functools.partial(
        _fused_kernel, n=n, p=panel, b=block, sw=sw, nc=nc, h=chunk,
        ablate=ablate,
    )
    itemsize = jnp.dtype(A.dtype).itemsize
    # p_buf (doubled for compiler headroom) + tile slots + R hi/lo, plus a
    # 24 MB base for the Mosaic stack (the diagonal factor's value-carried
    # blocks live on it)
    vmem = (2 * n * panel + (2 * chunk + 4) * panel * panel) * itemsize + (24 << 20)
    return pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((n // panel, panel, panel), A.dtype),  # p_buf
            pltpu.VMEM((2, chunk * panel, panel), A.dtype),  # t_buf
            pltpu.VMEM((panel, panel), A.dtype),     # rhi
            pltpu.VMEM((panel, panel), A.dtype),     # rlo
            pltpu.SemaphoreType.DMA(()),             # sem_in
            pltpu.SemaphoreType.DMA((2,)),           # sem_t
            pltpu.SemaphoreType.DMA(()),             # sem_z
            pltpu.SemaphoreType.DMA(()),             # sem_o
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(int(vmem), 100 * (1 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * n * n,  # n^3/3 at 3 bf16 passes
            bytes_accessed=(n * n * n // (6 * panel) + n * n) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A)


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
