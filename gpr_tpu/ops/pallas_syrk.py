"""Pallas lower-triangle SYRK update: ``S = A22 - L21 @ L21^T``, lower only.

The blocked Cholesky's trailing update (ops/blocked.py — the TPU
re-design of the reference's LAPACK dpotrf path, reference
include/LAPACKUtils.h:59-73) consumes only the LOWER triangle of the
Schur complement: every read in the recursion (A11, the dense A21 block,
A22, and the leaves via ``symmetrize_input=False``) lies on or below the
diagonal.  XLA has no rank-k-update primitive, so expressing the update
as ``A22 - L21 @ L21.T`` executes the full square GEMM — 2x the flops
LAPACK's ``syrk`` pays.  At n=16384 the trailing updates are ~2/3 of all
Cholesky flops, so the full-GEMM formulation executes ~n^3/2 flops where
the textbook factorization needs n^3/3.

This kernel enumerates only the lower-triangle output tiles (i >= j) in a
1-D grid (tile coordinates scalar-prefetched), with the contraction as the
innermost grid dimension accumulating into a VMEM scratch tile.  Upper
tiles are never computed, never DMA'd, and their contents in the output
buffer are UNDEFINED — callers must honor the lower-only contract.

Tiles are (bm x bk) MXU-aligned blocks; the dot runs at the numerics
core's f32-grade precision tier (utils/config.matmul_precision), passed
explicitly because pallas dots do not inherit the jax default-matmul
policy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import matmul_precision


_NT = (((1,), (1,)), ((), ()))  # (bm, bk) x (bm, bk) -> Ai @ Aj^T


def _dot_nt(a, b, precision, out_dtype):
    """a @ b.T at the requested precision TIER.  Mosaic supports only the
    DEFAULT (1 bf16 pass) and HIGHEST (bf16x6) dot precisions, so the
    numerics core's 'high' tier (bf16x3, f32-grade 1.3e-5 — what XLA emits
    for jnp.matmul(precision='high')) is emulated by an explicit hi/lo
    bf16 split: a ~ hi + lo with hi = bf16(a); three DEFAULT passes
    hi.hi + hi.lo + lo.hi reproduce the tier (the dropped lo.lo term is
    O(2^-16) relative)."""
    if precision == "high" and a.dtype == jnp.float32:
        a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
        a_lo = a - a_hi
        b_lo = b - b_hi

        def d(x, y):
            return jax.lax.dot_general(
                x, y, _NT, preferred_element_type=out_dtype,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))
    prec = (
        jax.lax.Precision.HIGHEST
        if precision in ("high", "highest")
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, _NT, preferred_element_type=out_dtype, precision=prec
    )


def _syrk_kernel(ti_ref, tj_ref, ai_ref, aj_ref, a22_ref, out_ref, acc_ref,
                 *, precision):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if precision == "high" and ai_ref.dtype == jnp.float32:
        # bf16x3 emulation with SEQUENTIAL accumulation into the scratch —
        # one dot intermediate live at a time keeps the Mosaic VMEM stack
        # small enough for 512-tiles (a fused 3-term sum OOMs at 28MB)
        a_hi = ai_ref[:].astype(jnp.bfloat16).astype(jnp.float32)
        b_hi = aj_ref[:].astype(jnp.bfloat16).astype(jnp.float32)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, _NT, preferred_element_type=acc_ref.dtype,
                precision=jax.lax.Precision.DEFAULT,
            )

        acc_ref[:] += d(a_hi, b_hi)
        acc_ref[:] += d(a_hi, aj_ref[:] - b_hi)
        acc_ref[:] += d(ai_ref[:] - a_hi, b_hi)
    else:
        acc_ref[:] += _dot_nt(ai_ref[:], aj_ref[:], precision, acc_ref.dtype)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = a22_ref[:] - acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("bm", "bk", "precision", "interpret")
)
def syrk_update(
    A22: jax.Array,
    L21: jax.Array,
    *,
    bm: int = 512,
    bk: int = 512,
    precision: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``A22 - L21 @ L21^T`` with ONLY the lower-triangle tiles computed.

    A22: (m, m), L21: (m, k); m % bm == 0 and k % bk == 0 (callers
    fall back to the full-GEMM path otherwise — see
    ``blocked.cholesky_blocked``).  The strict upper triangle of the
    result is UNDEFINED (diagonal tiles are computed in full, so entries
    within ``bm`` of the diagonal are valid).
    """
    m, k = L21.shape
    if A22.shape != (m, m) or m % bm or k % bk:
        raise ValueError(
            f"syrk_update needs A22 (m,m), m%bm==0, k%bk==0; got "
            f"A22={A22.shape}, L21={L21.shape}, bm={bm}, bk={bk}"
        )
    if precision is None:
        precision = matmul_precision()
    nt = m // bm
    # lower-triangle tile coordinates, diagonal-first within each "wave"
    # ordering is irrelevant to correctness; row-major keeps Ai resident
    coords = np.array(
        [(i, j) for i in range(nt) for j in range(i + 1)], dtype=np.int32
    )
    T = coords.shape[0]
    ti = jnp.asarray(coords[:, 0])
    tj = jnp.asarray(coords[:, 1])
    ks = k // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, ks),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda t, s, ti, tj: (ti[t], s)),
            pl.BlockSpec((bm, bk), lambda t, s, ti, tj: (tj[t], s)),
            pl.BlockSpec((bm, bm), lambda t, s, ti, tj: (ti[t], tj[t])),
        ],
        out_specs=pl.BlockSpec((bm, bm), lambda t, s, ti, tj: (ti[t], tj[t])),
        scratch_shapes=[pltpu.VMEM((bm, bm), A22.dtype)],
    )
    kernel = functools.partial(_syrk_kernel, precision=precision)
    flops_per_pass = {"default": 1, "high": 3, "highest": 6}.get(precision, 1)
    # explicit VMEM budget: the default 16 MB scoped budget is borderline
    # at 512-tiles (one axon toolchain snapshot rejected the identical
    # program at a 17.11M scoped stack — compiler-internal stack exceeds
    # the naive buffer estimate) and insufficient at 1024-tiles.  Double
    # the buffer estimate plus a 16 MB base covers both.
    itemsize = A22.dtype.itemsize
    vmem = 4 * (2 * bm * bk + 3 * bm * bm) * itemsize + (16 << 20)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, m), A22.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem), 100 * (1 << 20))
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * bm * bm * k * flops_per_pass,
            bytes_accessed=(2 * T * bm * k + 2 * T * bm * bm)
            * A22.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ti, tj, L21, L21, A22)
