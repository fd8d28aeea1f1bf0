"""Dense GP (log-)marginal likelihoods with gradients.

Functional re-design of the reference likelihood hierarchy
(reference include/Likelihood.h:95-354).  The reference hand-derives every
gradient via the stacked derivative-Gram matrix
(0.5 tr((alpha alpha^T - C) dK/dtheta_p), Likelihood.h:204-229); here the
same quantities fall out of ``jax.grad`` on a Cholesky-based scalar
objective.  The hand-derived forms are retained in tests as golden checks.

Conventions (matching the reference exactly):

* ``gaussian_log_likelihood`` returns a *vector*, one entry per output
  dimension:  value_i = -0.5 y_i^T C y_i - 0.5 log|K + s^2 I| - n/2 log 2pi
  (Likelihood.h:166-202).
* The gradient of the reference's ``GetParameterDerivatives``
  (Likelihood.h:204-229) corresponds to the scalar objective
  ``sum_i datafit_i + complexity`` (complexity counted ONCE, not per output
  dim) — reproduced by :func:`mll_scalar`.
* ``GetValueAndJacobian`` (Likelihood.h:287-344) differentiates each output
  dimension's full value — reproduced by :func:`mll_jacobian`.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..kernels import kernels as kermod
from ..ops import linalg


def _chol_K(kernel, X, sigma, jitter=0.0):
    K = kermod.gram(kernel, X)
    K = linalg.add_diagonal(K, jnp.asarray(sigma, K.dtype) ** 2)
    L, _ = linalg.safe_cholesky(K, initial_jitter=jitter)
    return L


def gaussian_log_likelihood(kernel, X, Y, sigma) -> jax.Array:
    """Per-output-dimension log marginal likelihood vector
    (reference GaussianLogLikelihood::operator(), Likelihood.h:166-202)."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.ndim == 1:
        X = X[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]
    n = X.shape[0]
    L = _chol_K(kernel, X, sigma)
    alpha = linalg.cho_solve(L, Y)
    df = -0.5 * jnp.sum(Y * alpha, axis=0)  # (q,)
    cp = -0.5 * linalg.logdet_from_chol(L)
    ct = -n / 2.0 * math.log(2 * math.pi)
    return df + cp + ct


def gaussian_likelihood(kernel, X, Y, sigma) -> jax.Array:
    """Non-log Gaussian likelihood (reference GaussianLikelihood,
    Likelihood.h:95-150): exp(datafit) / sqrt(det) / (2 pi)^(n/2)."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.ndim == 1:
        X = X[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]
    n = X.shape[0]
    L = _chol_K(kernel, X, sigma)
    alpha = linalg.cho_solve(L, Y)
    df = jnp.exp(-0.5 * jnp.sum(Y * alpha, axis=0))
    cp = jnp.exp(-0.5 * linalg.logdet_from_chol(L))
    ct = (2 * math.pi) ** (-n / 2.0)
    return df * cp * ct


def mll_scalar(kernel, X, Y, sigma) -> jax.Array:
    """Scalar objective whose gradient matches the reference's
    ``GetParameterDerivatives`` (Likelihood.h:204-229):
    sum_i datafit_i - 0.5 log|K| - n/2 log 2pi."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.ndim == 1:
        X = X[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]
    n = X.shape[0]
    L = _chol_K(kernel, X, sigma)
    alpha = linalg.cho_solve(L, Y)
    df = -0.5 * jnp.sum(Y * alpha)
    cp = -0.5 * linalg.logdet_from_chol(L)
    return df + cp - n / 2.0 * math.log(2 * math.pi)


def _wrap_params(kernel, X, Y, sigma, fn):
    vec0 = kermod.params_vector(kernel)

    def f(vec):
        return fn(kernel.with_params(list(vec)), X, Y, sigma)

    return f, vec0


def mll_value_and_grad(kernel, X, Y, sigma) -> Tuple[jax.Array, jax.Array]:
    """(value_vector, grad) — the reference's
    ``GetValueAndParameterDerivatives`` (Likelihood.h:231-285): the value is
    the per-dim vector, the gradient is that of :func:`mll_scalar`.

    ONE Gram + factorization serves both outputs (``has_aux`` threads the
    per-dim vector out of the same forward pass the gradient uses — the
    separate ``gaussian_log_likelihood`` call paid a second O(n^3)
    factorization per optimizer step)."""
    vec0 = kermod.params_vector(kernel)

    def g(vec):
        k = kernel.with_params(list(vec))
        Xa = jnp.asarray(X)
        Ya = jnp.asarray(Y)
        if Xa.ndim == 1:
            Xa = Xa[:, None]
        if Ya.ndim == 1:
            Ya = Ya[:, None]
        n = Xa.shape[0]
        L = _chol_K(k, Xa, sigma)
        alpha = linalg.cho_solve(L, Ya)
        df = -0.5 * jnp.sum(Ya * alpha, axis=0)  # (q,)
        cp = -0.5 * linalg.logdet_from_chol(L)
        ct = -n / 2.0 * math.log(2 * math.pi)
        per_dim = df + cp + ct
        scalar = jnp.sum(df) + cp + ct
        return scalar, per_dim

    grad, value = jax.grad(g, has_aux=True)(vec0)
    return value, grad


def mll_jacobian(kernel, X, Y, sigma) -> Tuple[jax.Array, jax.Array]:
    """(value_vector, jacobian (q, p)) — reference ``GetValueAndJacobian``
    (Likelihood.h:287-344): row i differentiates datafit_i + complexity."""

    def per_dim(vec):
        k = kernel.with_params(list(vec))
        return gaussian_log_likelihood(k, X, Y, sigma)

    vec0 = kermod.params_vector(kernel)
    value = per_dim(vec0)
    J = jax.jacrev(per_dim)(vec0)
    return value, J
