"""In-place right-looking Cholesky: pallas ops chained on ONE donated buffer.

The recursive schedule (ops/blocked.py) reached the math-op floors at
n=16k — SYRK within ~16% of the GEMM rate, tri-solves near GEMM rate —
but pays ~11 ms of *machinery*: dynamic-update-slice assembly, concat
copies, branch materialization (BENCHMARKS.md, round-2 anatomy).  This
module removes the machinery instead of the math: every step is a pallas
call whose output buffer IS the input buffer (``input_output_aliases``),
so the factorization is a chain of in-place tile updates on a single
(n, n) HBM buffer with zero XLA-level data movement.

Schedule (wide-panel right-looking, the VERDICT round-2 suggestion):
for each 512-wide column block [two 256 panels]:
  1. ``panel_inplace``      — factor the (256, 256) diagonal tile in-VMEM
     (strip factorization + in-kernel inverse, the validated
     ops/pallas_panel.py scheme at 32 us/panel) and GEMM every row tile
     below against the parked inverse: the whole panel in ONE call;
  2. ``rank_update_inplace`` (narrow) — correct the NEXT 256 column strip
     against the just-solved panel (k=256);
  3. ``panel_inplace``      — factor the second 256 panel;
  4. ``rank_update_inplace`` (wide) — ONE k=512 SYRK trailing update of
     the remaining lower-triangle tiles (bm=512 blocks, the measured-fast
     pallas_syrk tiling), reading the 512-wide L column from the buffer
     itself.

All reads in steps 2-4 target tiles strictly left of the written tiles,
and each written tile is visited exactly once per call, so aliasing is
race-free under Mosaic's sequential grid.  Reference hot path being
replaced: /root/reference/include/LAPACKUtils.h:59-73 +
lib/GaussianProcess.cpp:530-618.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import matmul_precision
from .pallas_syrk import _syrk_kernel
from .pallas_panel import _strip_factor, _inv_upper

_HI = jax.lax.Precision.HIGHEST


@functools.partial(
    jax.jit, static_argnames=("T", "ks", "bm", "bk", "precision", "interpret")
)
def _rank_update_call(
    S: jax.Array,
    ti: jax.Array,
    tj: jax.Array,
    kc: jax.Array,
    *,
    T: int,
    ks: int,
    bm: int,
    bk: int,
    precision: str,
    interpret: bool,
):
    n = S.shape[0]
    base = functools.partial(_syrk_kernel, precision=precision)

    def kernel(ti_ref, tj_ref, kc_ref, *rest):
        # _syrk_kernel takes two leading scalar refs; kc is consumed by the
        # index maps only
        base(ti_ref, tj_ref, *rest)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T, ks),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda t, s, ti, tj, kc: (ti[t], kc[s])),
            pl.BlockSpec((bm, bk), lambda t, s, ti, tj, kc: (tj[t], kc[s])),
            pl.BlockSpec((bm, bm), lambda t, s, ti, tj, kc: (ti[t], tj[t])),
        ],
        out_specs=pl.BlockSpec(
            (bm, bm), lambda t, s, ti, tj, kc: (ti[t], tj[t])
        ),
        scratch_shapes=[pltpu.VMEM((bm, bm), S.dtype)],
    )
    flops_per_pass = {"default": 1, "high": 3, "highest": 6}.get(precision, 1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), S.dtype),
        # inputs: [ti, tj, kc, Ai-src, Aj-src, A22-src]; the A22 source is
        # aliased to the output, so the call rewrites S in place
        input_output_aliases={5: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * T * bm * bm * ks * bk * flops_per_pass,
            bytes_accessed=(2 * T * bm * bk * ks + 2 * T * bm * bm)
            * S.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ti, tj, kc, S, S, S)


def rank_update_inplace(
    S: jax.Array,
    rows: np.ndarray,
    cols: np.ndarray,
    kcols: np.ndarray,
    *,
    bm: int,
    bk: int,
    precision: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``S[i, j] -= S[i, kc] @ S[j, kc]^T`` over tile pairs, in place.

    ``rows``/``cols``: equal-length absolute (bm x bm) target-tile
    coordinate lists; ``kcols``: (bk-unit) contraction column tiles.
    Every (rows[t], cols[t]) pair must be unique, and no target tile may
    overlap the source tiles ``(*, kcols)`` — guaranteed by the
    factorization schedule (targets lie strictly right of the panel)."""
    if precision is None:
        precision = matmul_precision()
    ti = jnp.asarray(rows, jnp.int32)
    tj = jnp.asarray(cols, jnp.int32)
    kc = jnp.asarray(kcols, jnp.int32)
    return _rank_update_call(
        S, ti, tj, kc,
        T=len(rows), ks=len(kcols), bm=bm, bk=bk,
        precision=precision, interpret=interpret,
    )


def _panel_kernel_inplace(c0_ref, p_ref, o_ref, invu_ref, *, b: int, sw: int):
    del c0_ref  # consumed by the index maps
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        # mirror the lower triangle: the strip factorizer consumes the
        # upper representation, and the lower-only input contract means
        # the tile's strict upper may hold junk
        A = p_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
        low = jnp.where(rows >= cols, A, 0.0)
        A = low + jnp.where(rows > cols, A, 0.0).T
        U = _strip_factor(A, b, sw)
        invu_ref[:] = _inv_upper(U, b, sw)
        o_ref[:] = U.T

    @pl.when(t > 0)
    def _():
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], invu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=p_ref.dtype, precision=_HI,
        )


@functools.partial(jax.jit, static_argnames=("rt", "b", "sw", "interpret"))
def _panel_call(
    S: jax.Array, c0: jax.Array, *, rt: int, b: int, sw: int, interpret: bool
):
    n = S.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((b, b), lambda t, c0: (c0[0] + t, c0[0])),
        ],
        out_specs=pl.BlockSpec((b, b), lambda t, c0: (c0[0] + t, c0[0])),
        scratch_shapes=[pltpu.VMEM((b, b), S.dtype)],
    )
    return pl.pallas_call(
        functools.partial(_panel_kernel_inplace, b=b, sw=sw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), S.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(c0, S)


def panel_inplace(
    S: jax.Array, c0t: int, *, b: int = 256, sw: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Factor the column panel at tile column ``c0t`` in place: the
    diagonal (b, b) tile is strip-factored in VMEM (its inverse parked in
    scratch across grid steps), each row tile below becomes one MXU GEMM
    against the inverse."""
    n = S.shape[0]
    nt = n // b
    rt = nt - c0t
    return _panel_call(
        S, jnp.asarray([c0t], jnp.int32), rt=rt, b=b, sw=sw,
        interpret=interpret,
    )


def _tril_kernel(ti_ref, tj_ref, d_ref, s_ref, o_ref, *, bm: int):
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 1)
    # d_ref[t] == 1 for diagonal tiles (mask), 0 for strictly-upper (zero)
    o_ref[:] = jnp.where(
        jnp.logical_and(d_ref[t] == 1, rows >= cols), s_ref[:], 0.0
    )


@functools.partial(jax.jit, static_argnames=("T", "bm", "interpret"))
def _tril_call(S, ti, tj, dg, *, T, bm, interpret):
    n = S.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[pl.BlockSpec((bm, bm), lambda t, ti, tj, dg: (ti[t], tj[t]))],
        out_specs=pl.BlockSpec((bm, bm), lambda t, ti, tj, dg: (ti[t], tj[t])),
    )
    return pl.pallas_call(
        functools.partial(_tril_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), S.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(ti, tj, dg, S)


def zero_upper_inplace(
    S: jax.Array, *, bm: int = 512, interpret: bool = False
) -> jax.Array:
    """Zero the strict upper triangle in place (diagonal tiles masked,
    strictly-upper tiles overwritten without being read)."""
    n = S.shape[0]
    nt = n // bm
    coords = [(i, j, 1) for i in range(nt) for j in (i,)]
    coords += [(i, j, 0) for i in range(nt) for j in range(i + 1, nt)]
    arr = np.asarray(coords, np.int32)
    return _tril_call(
        S,
        jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2]),
        T=len(coords), bm=bm, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("w", "b", "precision", "interpret")
)
def cholesky_inplace(
    A: jax.Array,
    *,
    w: int = 512,
    b: int = 256,
    precision: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Lower Cholesky factor by the in-place wide-panel schedule.

    Reads only the lower triangle; returns a factor with exact-zero strict
    upper.  ``w``: trailing-update width (SYRK contraction, bm=w tiles);
    ``b``: panel width (diagonal factorization granularity).  Requires
    n % w == 0 and w % b == 0.

    The whole chain is one jitted program, so the in-place aliasing holds
    between every step; an eager call pays exactly one defensive copy of
    ``A`` (the caller-owned entry buffer) rather than one per step."""
    n = A.shape[0]
    if n % w or w % b or (w > 512 and w % 512):
        # w > 512 runs the trailing SYRK on 512-tiles, so w must align
        raise ValueError(
            f"cholesky_inplace: n={n}, w={w}, b={b} need n%w==0, w%b==0, "
            "and w a multiple of 512 when w > 512"
        )
    if precision is None:
        precision = matmul_precision()
    ntb = n // b  # panel-tile count
    ntw = n // w  # wide-tile count
    pw = w // b   # panels per wide column block

    S = A
    for kw in range(ntw):
        cb = kw * pw  # first panel tile column of this wide block
        for p in range(pw):
            c = cb + p
            if p > 0:
                # correct THIS 256-strip (rows c.., col c) against the
                # previous panels of the wide block (k = p*b)
                rows = np.arange(c, ntb, dtype=np.int32)
                cols = np.full_like(rows, c)
                kcols = np.arange(cb, c, dtype=np.int32)
                S = rank_update_inplace(
                    S, rows, cols, kcols, bm=b, bk=b,
                    precision=precision, interpret=interpret,
                )
            S = panel_inplace(S, c, b=b, interpret=interpret)
        if kw + 1 < ntw:
            # wide trailing SYRK on fixed 512-tiles (VMEM-sized), lower
            # tiles of S[(kw+1)w:, (kw+1)w:], contracting over this
            # block's w columns in w/512 steps
            st = min(w, 512)
            t0 = (kw + 1) * (w // st)
            nt_tr = n // st - t0
            coords = np.asarray(
                [(t0 + i, t0 + j) for i in range(nt_tr)
                 for j in range(i + 1)], np.int32,
            )
            kcols = np.arange(kw * (w // st), (kw + 1) * (w // st),
                              dtype=np.int32)
            S = rank_update_inplace(
                S, coords[:, 0], coords[:, 1], kcols,
                bm=st, bk=st, precision=precision, interpret=interpret,
            )
    return zero_upper_inplace(S, bm=min(w, 512), interpret=interpret)
