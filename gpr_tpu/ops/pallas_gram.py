"""Pallas fused Gram-matrix kernel for isotropic (RBF-family) kernels.

One pass over HBM: each (bm, bn) tile of K is produced by an MXU GEMM for
the cross term plus VPU epilogue (squared-distance assembly + exp) without
ever materializing the distance matrix — the TPU-native replacement for the
reference's OpenMP pairwise loop (reference lib/GaussianProcess.cpp:384-402)
and the fusion XLA cannot always prove safe across the ``max(d2, 0)`` clamp.

Supports the Gaussian kernel  k = scale^2 exp(-0.5 d2 / sigma^2)  and the
RationalQuadratic  k = scale^2 (1 + d2/(2 alpha sigma^2))^-alpha.

The contraction dimension is zero-padded to the 128-lane boundary (zeros do
not change distances).  Inputs may be bf16 (MXU fast path) — the cross-term
GEMM always accumulates in f32 and the epilogue runs in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_axis(a: jax.Array, axis: int, mult: int) -> jax.Array:
    size = a.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _tile_body(params, x, y, *, form: str, bm: int, bn: int, ti, tj,
               d: int = 0):
    """d2 = |x|^2 + |y|^2 - 2 x.y for one (bm, bn) tile, then the RBF form.

    ``params`` is a 4-sequence of scalars (sigma, scale, third, diag_add);
    ``diag_add`` is added where the global row == column (``K + diag*I``
    fused into the same HBM pass — the scatter-based ``add_diagonal`` costs
    ~11 ms at n=16k on v5e)."""
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    sigma = params[0]
    scale = params[1]
    if form == "periodic":
        # sum_d sin^2(b (x_d - y_d)) — per-feature differences, no GEMM
        # identity exists; the static feature loop stays VPU full-tile
        b = params[2]
        s2 = jnp.zeros((bm, bn), jnp.float32)
        for j in range(d or x.shape[1]):
            s = jnp.sin(b * (xf[:, j : j + 1] - yf[:, j : j + 1].T))
            s2 = s2 + s * s
        d2 = s2  # reuse the distance slot: exp(-0.5 d2 / sigma^2) below
    else:
        if x.dtype == jnp.float32 and form != "matern12":
            # cross term at the framework's f32-grade 'high' tier (bf16x3
            # hi/lo emulation, matching ops/pallas_syrk.py): HIGHEST
            # (bf16x6) paid ~2x MXU time for accuracy below the numerics
            # core's contract (BENCHMARKS.md precision-tier table).
            # matern12 keeps HIGHEST: its r = sqrt(d2) cusp amplifies a
            # d2 error e to sqrt(e) near the diagonal (dK/d(d2) ~ 1/r),
            # turning the tier's ~1e-5 into ~1e-2 kernel error; the
            # C^1/C^2 matern32/52 damp the same error quadratically
            x_hi = xf.astype(jnp.bfloat16).astype(jnp.float32)
            y_hi = yf.astype(jnp.bfloat16).astype(jnp.float32)

            def dnt(a_, b_):
                return jax.lax.dot_general(
                    a_, b_, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )

            xy = dnt(x_hi, y_hi)
            xy += dnt(x_hi, yf - y_hi)
            xy += dnt(xf - x_hi, y_hi)
        else:
            xy = jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        xx = jnp.sum(xf * xf, axis=1, keepdims=True)  # (bm, 1)
        yy = jnp.sum(yf * yf, axis=1, keepdims=True)  # (bn, 1)
        d2 = jnp.maximum(xx + yy.T - 2.0 * xy, 0.0)
    if form in ("gaussian", "periodic"):
        val = (scale * scale) * jnp.exp(-0.5 * d2 / (sigma * sigma))
    elif form == "rq":
        alpha = params[2]
        val = (scale * scale) * (
            1.0 + 0.5 * d2 / (sigma * sigma * alpha)
        ) ** (-alpha)
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
    elif form == "sqdist":  # raw squared distances
        val = d2
    else:
        raise ValueError(f"gram_pallas: unknown form {form!r}")
    rows = ti * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    cols = tj * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    return val + jnp.where(rows == cols, params[3], 0.0)


def _gram_tril_kernel(
    params_ref, ri_ref, ci_ref, x_ref, y_ref, o_ref, *, form: str, bm: int,
    bn: int, d: int = 0
):
    """Lower-triangle tile t -> (ri[t], ci[t]): upper tiles are never
    visited — half the flops AND half the HBM writes of the dense grid.
    The output's strict-upper tiles are UNDEFINED; valid only for consumers
    honoring the potrf('L') read contract (ops.blocked.cholesky_blocked)."""
    t = pl.program_id(0)
    p4 = tuple(params_ref[k] for k in range(4))
    o_ref[:] = _tile_body(
        p4, x_ref[:], y_ref[:], form=form, bm=bm, bn=bn, d=d,
        ti=ri_ref[t], tj=ci_ref[t],
    )


def _gram_kernel(params_ref, x_ref, y_ref, o_ref, *, form: str, bm: int,
                 bn: int, d: int = 0):
    p4 = tuple(params_ref[k] for k in range(4))
    o_ref[:] = _tile_body(
        p4, x_ref[:], y_ref[:], form=form, bm=bm, bn=bn, d=d,
        ti=pl.program_id(0), tj=pl.program_id(1),
    )


def _gram_batched_kernel(params_ref, x_ref, y_ref, o_ref, *, form: str,
                         bm: int, bn: int, d: int = 0):
    b = pl.program_id(0)
    p4 = tuple(params_ref[b, k] for k in range(4))
    o_ref[0] = _tile_body(
        p4, x_ref[0], y_ref[0], form=form, bm=bm, bn=bn, d=d,
        ti=pl.program_id(1), tj=pl.program_id(2),
    )


@functools.partial(
    jax.jit, static_argnames=("form", "bm", "interpret")
)
def gram_pallas_batched(
    X: jax.Array,
    sigma=1.0,
    scale=1.0,
    alpha=1.0,
    diag=0.0,
    *,
    form: str = "gaussian",
    bm: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fleet Gram: K[b] = k(X[b], X[b]) + diag[b]*I for a batch of small
    GPs, one fused pallas pass (symmetric case).

    X (B, n, d); sigma/scale/alpha/diag are scalars or (B,) vectors
    (batched hyperparameters).  The XLA vmapped-gram alternative costs ~3x
    at B=128 n=512 on v5e: the batched sqdist dot_general materializes its
    pieces in a batch-minor layout and XLA inserts two 256 MB relayout
    copies before the factorizer can consume K (round-3 trace,
    BENCHMARKS.md)."""
    B, n, d = X.shape
    bm = min(bm, max(128, n))
    Xp = _pad_axis(_pad_axis(X, 2, 128), 1, bm)
    _, np_, dp = Xp.shape

    params = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(p, jnp.float32), (B,))
            for p in (sigma, scale, alpha, diag)
        ],
        axis=1,
    )  # (B, 4)

    nt = np_ // bm
    out = pl.pallas_call(
        functools.partial(_gram_batched_kernel, form=form, bm=bm, bn=bm, d=d),
        out_shape=jax.ShapeDtypeStruct((B, np_, np_), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt, nt),
            in_specs=[
                pl.BlockSpec((1, bm, dp), lambda b, i, j, params: (b, i, 0)),
                pl.BlockSpec((1, bm, dp), lambda b, i, j, params: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bm, bm), lambda b, i, j, params: (b, i, j)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * (2 * np_ * np_ * dp + 6 * np_ * np_),
            bytes_accessed=int(
                2 * B * nt * np_ * dp * Xp.dtype.itemsize
                + B * np_ * np_ * 4
            ),
            transcendentals=B * np_ * np_,
        ),
        interpret=interpret,
    )(params, Xp, Xp)
    return out[:, :n, :n]


@functools.partial(
    jax.jit, static_argnames=("form", "bm", "bn", "interpret", "tril")
)
def gram_pallas(
    X: jax.Array,
    Y: jax.Array,
    sigma=1.0,
    scale=1.0,
    alpha=1.0,
    diag=0.0,
    *,
    form: str = "gaussian",
    bm: int = 256,
    bn: int = 256,
    interpret: bool = False,
    tril: bool = False,
) -> jax.Array:
    """K[i, j] = k(X[i], Y[j]) for the given RBF form, f32 output.

    X (n, d), Y (m, d); n, m are zero-padded up to the tile size and the
    result is cropped — zero-padded *rows* produce garbage entries only in
    the cropped region.  ``diag`` is added where i == j (K + diag*I in the
    same HBM pass — only meaningful for the symmetric X is Y case).  Use
    ``interpret=True`` on CPU.

    ``tril=True`` (symmetric case only, requires n == m): visit ONLY the
    lower-triangle tiles via a 1D grid with scalar-prefetched (row, col)
    tile indices — half the flops and half the HBM writes.  The output's
    strict-upper tiles are UNDEFINED; valid for potrf('L')-contract
    consumers (``ops.blocked.cholesky_blocked`` / ``safe_cholesky``)."""
    n, d = X.shape
    m = Y.shape[0]
    Xp = _pad_axis(_pad_axis(X, 1, 128), 0, bm)
    Yp = _pad_axis(_pad_axis(Y, 1, 128), 0, bn)
    np_, dp = Xp.shape
    mp = Yp.shape[0]

    params = jnp.stack(
        [
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(scale, jnp.float32),
            jnp.asarray(alpha, jnp.float32),
            jnp.asarray(diag, jnp.float32),
        ]
    )

    if tril:
        if n != m or bm != bn:
            raise ValueError("tril gram requires the symmetric square case")
        import numpy as onp

        nt = np_ // bm
        ri, ci = onp.tril_indices(nt)
        ri = jnp.asarray(ri, jnp.int32)
        ci = jnp.asarray(ci, jnp.int32)
        ntiles = int(ri.shape[0])
        out = pl.pallas_call(
            functools.partial(_gram_tril_kernel, form=form, bm=bm, bn=bn, d=d),
            out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((bm, dp), lambda t, params, ri, ci: (ri[t], 0)),
                    pl.BlockSpec((bn, dp), lambda t, params, ri, ci: (ci[t], 0)),
                ],
                out_specs=pl.BlockSpec(
                    (bm, bn), lambda t, params, ri, ci: (ri[t], ci[t])
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=ntiles * (2 * bm * bn * dp + 6 * bm * bn),
                bytes_accessed=int(
                    2 * ntiles * bm * dp * Xp.dtype.itemsize
                    + ntiles * bm * bn * 4
                ),
                transcendentals=ntiles * bm * bn,
            ),
            interpret=interpret,
        )(params, ri, ci, Xp, Yp)
        return out[:n, :m]

    out = pl.pallas_call(
        functools.partial(_gram_kernel, form=form, bm=bm, bn=bn, d=d),
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // bm, mp // bn),
            in_specs=[
                pl.BlockSpec((bm, dp), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((bn, dp), lambda i, j, *_: (j, 0)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, *_: (i, j)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp * dp + 6 * np_ * mp,
            bytes_accessed=int(
                Xp.size * Xp.dtype.itemsize
                + Yp.size * Yp.dtype.itemsize
                + np_ * mp * 4
            ),
            transcendentals=np_ * mp,
        ),
        interpret=interpret,
    )(params, Xp, Yp)
    return out[:n, :m]


def gaussian_gram(
    X, Y=None, sigma=1.0, scale=1.0, diag=0.0, *, dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Convenience wrapper: symmetric if Y is None; optional bf16 inputs for
    the MXU fast path (accumulation stays f32)."""
    X = jnp.asarray(X)
    Y = X if Y is None else jnp.asarray(Y)
    if dtype is not None:
        X = X.astype(dtype)
        Y = Y.astype(dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    return gram_pallas(
        X, Y, sigma, scale, diag=diag, form="gaussian", interpret=interpret
    )
