"""Posterior-predictive GP: predictions marginalized over hyperparameter
draws.

The reason the rebuild samples hyperparameters (HMC/NUTS) instead of point-
estimating them (the reference's Gauss-Newton) is this module: the
predictive distribution

    p(y* | X, Y) = E_{theta ~ p(theta | X, Y)} [ N(mean_theta, var_theta) ]

is a mixture over posterior draws — mean = E[mean_s], variance =
E[var_s + mean_s^2] - mean^2.  Each draw's fit+predict runs as one vmapped
program over a (subsampled) batch of draws: the batched Gram + batched
Cholesky land on the MXU together (gp/batched.py machinery)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kernels import kernels as kermod
from ..ops import linalg


class PredictiveResult(NamedTuple):
    mean: jax.Array  # (m, q)
    variance: jax.Array  # (m,) marginal predictive variance (incl. noise)
    mean_per_draw: jax.Array  # (S, m, q)
    variance_per_draw: jax.Array  # (S, m)


def subsample_draws(samples: jax.Array, num: int) -> jax.Array:
    """Thin (chains, T, dim) posterior draws to ``num`` evenly spaced
    parameter vectors (num, dim), in NATURAL space."""
    z = jnp.asarray(samples).reshape(-1, samples.shape[-1])
    idx = jnp.linspace(0, z.shape[0] - 1, num).astype(jnp.int32)
    return jnp.exp(z[idx])


def predictive(
    kernel,
    theta_draws: jax.Array,
    X,
    Y,
    Xs,
    sigma,
    include_noise: bool = True,
) -> PredictiveResult:
    """Mixture predictive over hyperparameter draws.

    ``theta_draws`` (S, p) in natural space and reference ordering (e.g.
    from :func:`subsample_draws`); ``sigma`` is the observation-noise std
    (scalar, or (S,) if it was sampled too)."""
    X = jnp.asarray(X)
    if X.ndim == 1:
        X = X[:, None]
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    Xs = jnp.asarray(Xs)
    if Xs.ndim == 1:
        Xs = Xs[:, None]
    S = theta_draws.shape[0]
    sigmas = jnp.broadcast_to(jnp.asarray(sigma, X.dtype), (S,))

    def one(theta, s):
        k = kernel.with_params(list(theta))
        K = kermod.gram(k, X)
        K = linalg.add_diagonal(K, s**2)
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), Y)
        Ks = kermod.gram(k, Xs, X)
        mean = Ks @ alpha
        kss = jax.vmap(lambda v: k(v, v))(Xs)
        solved = jax.scipy.linalg.cho_solve((L, True), Ks.T)
        var = kss - jnp.sum(Ks * solved.T, axis=-1)
        if include_noise:
            var = var + s**2
        return mean, jnp.maximum(var, 0.0)

    means, variances = jax.vmap(one)(theta_draws, sigmas)  # (S, m, q), (S, m)

    mix_mean = jnp.mean(means, axis=0)  # (m, q)
    # total variance = E[var] + Var over draws of the (first-output) mean
    mean_sq = jnp.mean(jnp.sum(means**2, axis=-1) / means.shape[-1], axis=0)
    mix_sq = jnp.sum(mix_mean**2, axis=-1) / means.shape[-1]
    mix_var = jnp.mean(variances, axis=0) + jnp.maximum(mean_sq - mix_sq, 0.0)
    return PredictiveResult(
        mean=mix_mean,
        variance=mix_var,
        mean_per_draw=means,
        variance_per_draw=variances,
    )


def predictive_from_hmc(
    kernel, result, X, Y, Xs, sigma, num_draws: int = 32, include_noise: bool = True
) -> PredictiveResult:
    """Convenience: thin an :class:`hmc.HMCResult`/:class:`nuts.NUTSResult`
    and compute the mixture predictive."""
    theta = subsample_draws(result.samples, num_draws)
    return predictive(kernel, theta, X, Y, Xs, sigma, include_noise)
