"""Batched many-GP mode: train/predict fleets of small GPs in one program.

The reference processes one GP at a time (a single ``GaussianProcess``
object per dataset); on TPU a *batch* of small/medium GPs is where the MXU
shines — batched Gram construction and batched Cholesky keep the systolic
array busy where a single small factorization is latency-bound (SURVEY.md
§7 "consider batched many-small-GP mode").  Use cases: per-window drift
fleets, per-patient models, hyperparameter grids, bootstrap ensembles.

All kernels' hyperparameters may be batched too: pass a kernel pytree whose
leaves carry a leading batch axis (e.g. ``Gaussian(sigmas_of_shape_B,
scales_of_shape_B)``) — everything is ``vmap`` under one ``jit``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..kernels import kernels as kermod
from ..ops import linalg


class BatchedGP(NamedTuple):
    """A fleet of B independent GPs with identical shapes."""

    kernel: Any  # kernel pytree; leaves may carry a leading B axis
    X: jax.Array  # (B, n, d)
    Y: jax.Array  # (B, n, q)
    sigma: jax.Array  # (B,) or scalar
    alpha: jax.Array  # (B, n, q)
    L: jax.Array  # (B, n, n)
    batched_kernel: bool = False


def _kernel_in_axes(kernel, batched: bool):
    # 0 maps every kernel leaf over the batch axis; None broadcasts the
    # whole kernel (an in_axes *tree* would re-construct the kernel class
    # with int leaves and trip parameter validation)
    return 0 if batched else None


def _factor_and_solve(K, Y, use_crout: bool | None):
    """Fleet factorization + regression solve: (B, n, n), (B, n, q) ->
    (L, alpha).  ``use_crout=None`` auto-dispatches to the pallas fleet
    factorizer on TPU (panel-stepped Crout sweep — measured fastest on
    v5e; the fused single-kernel path is opt-in via GPR_FLEET_FUSED_MAX_N,
    it loses by serializing each matrix on one core); False pins XLA's
    batched potrf."""
    from ..ops import pallas_batched

    n = K.shape[1]
    if use_crout is None:
        use_crout = pallas_batched.batched_usable(n, K.dtype)
    if use_crout:
        interp = jax.default_backend() != "tpu"
        if n <= pallas_batched._FLEET_FUSED_MAX_N:
            # whole matrix fits VMEM: factor + solve in ONE pallas dispatch.
            # panel trades VPU sweep cost (~n p^2 per matrix) against MXU
            # GEMM granularity; GPR_FLEET_PANEL for on-chip A/B.
            import os

            panel = int(os.environ.get("GPR_FLEET_PANEL", 128))
            if panel <= 0:
                panel = 128
            while n % panel and panel > 16:
                panel //= 2
            # _diff wrapper: identical primal kernel, plus the fleet
            # custom_vjp so GPR_FLEET_FUSED_MAX_N stays compatible with
            # gradient callers (jax.grad(mll_batched), fit_mle_batched)
            return pallas_batched.factor_solve_fused_diff(
                K, Y, panel, interp
            )
        import os

        # panel sweep with the round-4 static-unrolled crout (B=128,
        # fits/s): n=512 p16 20.4k / **p32 30.6k** / p64 25.6k / p128
        # 10.3k; n=256 p32 201.7k / p64 86.2k; n=1024 p32 4.9k /
        # **p64 6.6k** / p128 4.2k — smaller matrices want the finer
        # sweep granularity, larger ones the wider trailing GEMMs
        default_panel = 32 if n <= 512 else 64
        panel = int(os.environ.get("GPR_FLEET_PANEL", default_panel))
        while n % panel and panel > 16:
            panel //= 2
        # custom_vjp wrapper: same primal kernels, and gradient callers
        # (mll_batched under jax.grad) get the Cholesky/solve pullbacks
        # in batched GEMMs instead of falling back to XLA's batched potrf
        return pallas_batched.factor_solve_batched_diff(
            K, Y, panel, interp
        )
    L = jnp.linalg.cholesky(K)
    alpha = jax.vmap(lambda l, y: jax.scipy.linalg.cho_solve((l, True), y))(L, Y)
    return L, alpha


def fit_batched(
    kernel,
    X,
    Y,
    sigma,
    jitter: float = 0.0,
    batched_kernel: bool = False,
    use_crout: bool | None = None,
) -> BatchedGP:
    """Train B GPs at once.  X (B, n, d), Y (B, n, q), sigma scalar or (B,).

    One jitted program: vmapped Gram (a single big batched GEMM), then the
    fleet factorization.  On TPU with panel-aligned n the factorization
    dispatches to ``ops.pallas_batched.cholesky_batched`` (batched Crout
    diagonal sweeps + batched MXU panel GEMMs — XLA's batched ``potrf``
    custom call is latency-bound in this regime); ``use_crout`` forces the
    choice (None = auto)."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 2:
        Y = Y[..., None]
    B, n = X.shape[0], X.shape[1]
    sigma = jnp.broadcast_to(jnp.asarray(sigma, X.dtype), (B,))

    k_axes = _kernel_in_axes(kernel, batched_kernel)

    K = _fleet_gram(kernel, X, sigma**2 + jitter, k_axes)
    L, alpha = _factor_and_solve(K, Y, use_crout)
    return BatchedGP(
        kernel=kernel, X=X, Y=Y, sigma=sigma, alpha=alpha, L=L,
        batched_kernel=batched_kernel,
    )


def _fleet_gram(kernel, X, noise, k_axes):
    """K[b] + noise[b]*I for the fleet: the fused batched pallas kernel for
    the stationary families on f32 (one HBM pass; the XLA vmapped gram's
    batched sqdist dot materializes batch-minor pieces that cost two
    ~256 MB relayout copies at B=128 n=512 — round-3 trace), XLA vmap
    otherwise (White/Sum/Product, f64, CPU-without-interpret)."""
    import os

    use_pallas = (
        X.dtype == jnp.float32
        and os.environ.get("GPR_FLEET_GRAM", "pallas") == "pallas"
    )
    interp = jax.default_backend() != "tpu"
    if use_pallas and interp and os.environ.get("GPR_FLEET_GRAM") != "pallas":
        use_pallas = False
    if use_pallas:
        from ..ops import pallas_gram

        disp = None
        if isinstance(kernel, kermod.Gaussian):
            disp = ("gaussian", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.GaussianExp):
            disp = ("gaussian", jnp.exp(kernel.sigma), jnp.exp(kernel.scale), 1.0)
        elif isinstance(kernel, kermod.RationalQuadratic):
            disp = ("rq", kernel.sigma, kernel.scale, kernel.alpha)
        elif isinstance(kernel, kermod.Matern12):
            disp = ("matern12", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.Matern32):
            disp = ("matern32", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.Matern52):
            disp = ("matern52", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.Periodic):
            disp = ("periodic", kernel.sigma, kernel.scale, kernel.b)
        if disp is not None:
            form, sg, sc, third = disp
            return pallas_gram.gram_pallas_batched(
                X, sg, sc, third, diag=noise, form=form, interpret=interp
            ).astype(X.dtype)

    def gram_one(k, x, nz):
        return linalg.add_diagonal(kermod.gram(k, x), nz)

    return jax.vmap(gram_one, in_axes=(k_axes, 0, 0))(
        kernel, X, jnp.broadcast_to(jnp.asarray(noise, X.dtype), (X.shape[0],))
    )


def predict_batched(gp: BatchedGP, Xs) -> jax.Array:
    """Posterior means: Xs (B, m, d) -> (B, m, q)."""
    Xs = jnp.asarray(Xs)
    k_axes = _kernel_in_axes(gp.kernel, gp.batched_kernel)

    def one(k, xs, x, a):
        Ks = kermod.gram(k, xs, x)
        return Ks @ a

    return jax.vmap(one, in_axes=(k_axes, 0, 0, 0))(gp.kernel, Xs, gp.X, gp.alpha)


def variance_batched(gp: BatchedGP, Xs) -> jax.Array:
    """Diagonal posterior variance: Xs (B, m, d) -> (B, m)."""
    Xs = jnp.asarray(Xs)
    k_axes = _kernel_in_axes(gp.kernel, gp.batched_kernel)

    def one(k, xs, x, L):
        Ks = kermod.gram(k, xs, x)  # (m, n)
        kss = jax.vmap(lambda v: k(v, v))(xs)
        solved = jax.scipy.linalg.cho_solve((L, True), Ks.T)
        return kss - jnp.sum(Ks * solved.T, axis=-1)

    return jax.vmap(one, in_axes=(k_axes, 0, 0, 0))(gp.kernel, Xs, gp.X, gp.L)


def mll_batched(
    kernel, X, Y, sigma, batched_kernel: bool = False,
    use_crout: bool | None = None,
) -> jax.Array:
    """Per-GP scalar log marginal likelihoods (B,), matching
    ``likelihood.mll_scalar``'s convention per fleet member (datafit summed
    over output dims; complexity and constant counted ONCE) — e.g. for
    scoring a hyperparameter grid in one shot.

    ``use_crout=None`` auto-dispatches to the pallas fleet factorizer on
    TPU like ``fit_batched`` (round 4: ``factor_solve_batched_diff``
    carries a ``custom_vjp`` — Cholesky + solve pullbacks in batched
    GEMMs — so mll is differentiable on the fast path; the round-3
    restriction to XLA's batched potrf under ``jax.grad`` is gone)."""
    import math

    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 2:
        Y = Y[..., None]
    B, n = X.shape[0], X.shape[1]
    sigma = jnp.broadcast_to(jnp.asarray(sigma, X.dtype), (B,))
    k_axes = _kernel_in_axes(kernel, batched_kernel)

    def gram_one(k, x, s):
        return linalg.add_diagonal(kermod.gram(k, x), s**2)

    K = jax.vmap(gram_one, in_axes=(k_axes, 0, 0))(kernel, X, sigma)
    L, alpha = _factor_and_solve(K, Y, use_crout)
    df = -0.5 * jnp.sum(Y * alpha, axis=(1, 2))
    cp = -jnp.sum(jnp.log(jnp.diagonal(L, axis1=1, axis2=2)), axis=1)
    return df + cp - n / 2.0 * math.log(2 * math.pi)


def fit_batched_sharded(
    kernel,
    X,
    Y,
    sigma,
    mesh=None,
    axis: str = "fleet",
    jitter: float = 0.0,
    batched_kernel: bool = False,
    use_crout: bool | None = None,
) -> BatchedGP:
    """Fleet training with the BATCH axis sharded over a device mesh — the
    expert-parallel analogue for many independent GPs (each chip trains its
    shard of models; no collectives needed until results are read).

    ``shard_map`` rather than GSPMD auto-partitioning: each device runs the
    complete per-shard fit locally — including the pallas fleet factorizer,
    which a partitioner cannot split — with zero communication."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis,))
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 2:
        Y = Y[..., None]
    B = X.shape[0]
    n_dev = mesh.devices.size
    if B % n_dev != 0:
        raise ValueError(f"fleet size ({B}) must be divisible by mesh ({n_dev})")
    sigma = jnp.broadcast_to(jnp.asarray(sigma, X.dtype), (B,))

    sharding = NamedSharding(mesh, P(axis))
    X = jax.device_put(X, NamedSharding(mesh, P(axis, None, None)))
    Y = jax.device_put(Y, NamedSharding(mesh, P(axis, None, None)))
    sigma = jax.device_put(sigma, sharding)
    if batched_kernel:
        kernel = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(jnp.asarray(leaf), sharding), kernel
        )

    k_axes = _kernel_in_axes(kernel, batched_kernel)
    # a single spec acts as a prefix pytree for the whole kernel subtree
    # (a tree_map-built spec tree would re-construct the kernel class with
    # PartitionSpec leaves and trip parameter validation)
    kspec = P(axis) if batched_kernel else P()
    bspec = P(axis, None, None)

    def local_fit(k, x, y, s):
        K = _fleet_gram(k, x, s**2 + jitter, k_axes)
        return _factor_and_solve(K, y, use_crout)

    fit = jax.jit(
        jax.shard_map(
            local_fit,
            mesh=mesh,
            in_specs=(kspec, bspec, bspec, P(axis)),
            out_specs=(bspec, bspec),
            check_vma=False,
        )
    )
    L, alpha = fit(kernel, X, Y, sigma)
    return BatchedGP(
        kernel=kernel, X=X, Y=Y, sigma=sigma, alpha=alpha, L=L,
        batched_kernel=batched_kernel,
    )


def fit_mle_batched(
    kernel,
    X,
    Y,
    sigma,
    iterations: int = 200,
    learning_rate: float = 0.05,
    log_space: bool = True,
    unroll_chunk: int = 0,
    use_crout: bool | None = None,
    init=None,
):
    """Per-member MLE over a whole fleet in ONE optimizer loop: every GP
    optimizes its OWN hyperparameters simultaneously (the summed
    ``mll_batched`` objective has block-diagonal structure, so per-member
    gradients never mix), riding the differentiable fleet factorizer
    (``factor_solve_batched_diff``, 1.6x the stock-potrf grad path on
    v5e at B=128 n=512).

    The reference optimizes one model per process invocation
    (scripts/main.py loops ``gpLearn`` over studies; ``Optimize`` at
    lib/GaussianProcessInference.cpp works on a single GP) — this is the
    fleet-scale counterpart.

    ``kernel``: a scalar-leaf template (shared init for every member)
    unless ``init`` ((B, P) array, reference param ordering) is given.
    Returns ``(batched_kernel, OptResult)`` with OptResult.params (B, P).
    """
    from ..inference.optimize import OptResult, _run_optax
    from ..kernels import kernels as _kermod
    import optax

    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    B = X.shape[0]
    vec0 = _kermod.params_vector(kernel)
    P = vec0.shape[0]
    if init is None:
        v0 = jnp.broadcast_to(vec0[None, :], (B, P))
    else:
        v0 = jnp.asarray(init, vec0.dtype)
        if v0.shape != (B, P):
            raise ValueError(
                f"fit_mle_batched: init shape {v0.shape} != {(B, P)}"
            )

    def mk_kernel(vecs):
        return kernel.with_params([vecs[:, i] for i in range(P)])

    def objective(vecs):
        if log_space:
            vecs = jnp.exp(vecs)
        kb = mk_kernel(vecs)
        return jnp.sum(
            mll_batched(
                kb, X, Y, sigma, batched_kernel=True, use_crout=use_crout
            )
        )

    opt = optax.adam(learning_rate)
    x0 = jnp.log(v0) if log_space else v0
    res = _run_optax(objective, x0, opt, iterations, unroll_chunk)
    params = jnp.exp(res.params) if log_space else res.params
    res = OptResult(params=params, value=res.value, trace=res.trace)
    return mk_kernel(params), res
