"""Sparse GP tests — semantics of reference tests/SparseInferenceTest.cpp:
Woodbury EfficientInversion vs dense inverse, EfficientDeterminant vs dense
determinant, core-matrix identities at jitter=0 vs >0, sparse likelihood
gradients, and dense-MLE -> sparse-predict handoff
(tests/MaximumLikelihoodTest2.cpp:120)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpr_tpu as gt
from gpr_tpu.gp import sparse as sp
from gpr_tpu.gp import likelihood as lk
from gpr_tpu.kernels import kernels as kermod


def _toy(rng, n=40, m=8, d=2, q=2):
    X = rng.standard_normal((n, d))
    Z = X[rng.choice(n, m, replace=False)] + 0.01 * rng.standard_normal((m, d))
    Y = np.stack(
        [np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n) for _ in range(q)], axis=1
    )
    return X, Z, Y


def test_woodbury_solve_matches_dense(rng):
    """Reference SparseLikelihood.h:132-138 EfficientInversion vs a dense
    inverse of C = s^2 I + Knm inv(Kmm) Kmn."""
    X, Z, Y = _toy(rng)
    k = gt.Gaussian(1.5, 1.0)
    sigma, jitter = 0.3, 1e-8
    Lmm, Knm, Linner, s2, logdet_C, n, m = sp._woodbury_pieces(k, Z, X, sigma, jitter)
    # dense C
    Kmm = np.asarray(gt.gram(k, jnp.asarray(Z))) + jitter * np.eye(Z.shape[0])
    Knm_d = np.asarray(gt.gram(k, jnp.asarray(X), jnp.asarray(Z)))
    C = sigma**2 * np.eye(X.shape[0]) + Knm_d @ np.linalg.solve(Kmm, Knm_d.T)
    got = np.asarray(sp.woodbury_solve(Knm, Linner, s2, jnp.asarray(Y)))
    ref = np.linalg.solve(C, Y)
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)
    # determinant lemma vs dense logdet (reference EfficientDeterminant,
    # SparseLikelihood.h:142-150)
    sign, ld = np.linalg.slogdet(C)
    assert sign > 0
    np.testing.assert_allclose(float(logdet_C), ld, rtol=1e-9)


def test_sparse_equals_dense_when_inducing_cover_all(rng):
    """With Z == X and jitter=0 the projected-process model reproduces the
    dense GP posterior (reference core-matrix identity at jitter=0,
    SparseInferenceTest semantics)."""
    # NOTE: the kernel length-scale is chosen so cond(K) ~ 1e3; with a
    # smoother kernel K itself is numerically singular (cond > 1e16) and the
    # identity only holds at the conditioning level — even explicit-inverse
    # arithmetic then disagrees with the dense posterior by ~1e-2.
    n, d = 14, 1
    X = np.sort(rng.uniform(0, 2 * math.pi, n))[:, None]
    Y = np.sin(X[:, 0])[:, None]
    k = gt.Gaussian(0.5, 1.0)
    sigma = 0.1
    dense = gt.fit(k, X, Y, sigma=sigma)
    sparse = sp.fit_sparse(k, X, X, Y, sigma=sigma, jitter=0.0)
    xt = np.linspace(0, 2 * math.pi, 17)[:, None]
    pd = np.asarray(dense.predict(jnp.asarray(xt)))
    ps = np.asarray(sparse.predict(jnp.asarray(xt)))
    np.testing.assert_allclose(ps, pd, rtol=1e-6, atol=1e-8)
    # posterior variance also agrees
    for t in (0.5, 2.0, 4.4):
        cd = float(dense.posterior_cov(jnp.asarray([t]), jnp.asarray([t])))
        cs = float(sparse.posterior_cov(jnp.asarray([t]), jnp.asarray([t])))
        assert abs(cd - cs) < 1e-8, (t, cd, cs)


def test_sparse_likelihood_matches_dense_equivalent(rng):
    """The sparse MLL with Z == X equals the dense MLL of the same model
    (C = s^2 I + K)."""
    n = 15
    X = np.sort(rng.uniform(0, 5, n))[:, None]
    Y = np.sin(X[:, 0])[:, None]
    k = gt.Gaussian(0.5, 0.8)  # length-scale chosen for well-conditioned K
    sigma = 0.4
    sparse_val = np.asarray(sp.sparse_log_likelihood(k, X, X, Y, sigma, jitter=0.0))
    dense_val = np.asarray(lk.gaussian_log_likelihood(k, X, Y, sigma))
    np.testing.assert_allclose(sparse_val, dense_val, rtol=1e-5)


def test_sparse_gradient_finite_difference(rng):
    """Sparse MLL gradient vs central finite differences — the autodiff
    analogue of the reference's hand-assembled grad(C)
    (SparseLikelihood.h:253-259)."""
    X, Z, Y = _toy(rng, n=30, m=6)
    k = gt.Gaussian(1.5, 1.0)
    sigma, jitter = 0.3, 1e-6
    _, grad = sp.sparse_mll_value_and_grad(k, Z, X, Y, sigma, jitter)
    grad = np.asarray(grad)
    vec0 = np.asarray(kermod.params_vector(k))
    eps = 1e-6
    for i in range(vec0.size):
        vp, vm = vec0.copy(), vec0.copy()
        vp[i] += eps
        vm[i] -= eps
        fp = float(sp.sparse_mll_scalar(k.with_params(list(vp)), Z, X, Y, sigma, jitter))
        fm = float(sp.sparse_mll_scalar(k.with_params(list(vm)), Z, X, Y, sigma, jitter))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - grad[i]) < 1e-4 * max(1.0, abs(fd)), (i, fd, grad[i])


def test_sparse_prediction_quality(rng):
    """Few inducing points still regress a smooth function well (the
    dense-MLE -> sparse-predict handoff of MaximumLikelihoodTest2)."""
    n = 200
    X = np.sort(rng.uniform(0, 2 * math.pi, n))[:, None]
    Y = (np.sin(X[:, 0]) + 0.05 * rng.standard_normal(n))[:, None]
    Z = np.linspace(0, 2 * math.pi, 15)[:, None]
    k = gt.Gaussian(1.0, 1.0)
    sgp = sp.fit_sparse(k, Z, X, Y, sigma=0.05, jitter=1e-8)
    xt = np.linspace(0.2, 2 * math.pi - 0.2, 25)[:, None]
    pred = np.asarray(sgp.predict(jnp.asarray(xt)))[:, 0]
    err = np.mean(np.abs(pred - np.sin(xt[:, 0])))
    assert err < 0.05, err


def test_more_inducing_than_dense_rejected(rng):
    X = rng.standard_normal((5, 1))
    Z = rng.standard_normal((8, 1))
    with pytest.raises(ValueError):
        sp.fit_sparse(gt.Gaussian(1.0), Z, X, np.zeros((5, 1)), sigma=0.1)


def test_optimize_inducing_improves_mll(rng):
    """VI-style optimization of inducing locations increases the sparse
    MLL (north-star extension, BASELINE.json)."""
    n = 80
    X = np.sort(rng.uniform(0, 2 * math.pi, n))[:, None]
    Y = np.sin(X[:, 0])[:, None]
    k = gt.Gaussian(1.0, 1.0)
    # deliberately bad initial inducing points (all clustered)
    Z0 = np.full((6, 1), 0.3) + 0.05 * rng.standard_normal((6, 1))
    sigma, jitter = 0.1, 1e-8
    before = float(sp.sparse_mll_scalar(k, Z0, X, Y, sigma, jitter))
    Zstar, trace = sp.optimize_inducing(
        k, Z0, X, Y, sigma, jitter, iterations=150, learning_rate=0.05
    )
    after = float(sp.sparse_mll_scalar(k, Zstar, X, Y, sigma, jitter))
    assert after > before + 1.0, (before, after)


class TestSVGP:
    """Titsias collapsed bound + variational inducing-point optimization
    (beyond the reference; BASELINE.json 'VI over inducing locations')."""

    def _data(self):
        rng = np.random.default_rng(0)
        X = np.linspace(0, 10, 150)[:, None]
        Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(150)
        return X, Y

    def test_elbo_lower_bounds_mll(self):
        """ELBO <= sparse marginal likelihood (the trace term is >= 0)."""
        X, Y = self._data()
        Z = X[::30]
        k = kermod.Gaussian(1.0, 1.0)
        elbo = float(sp.titsias_elbo(k, Z, X, Y, 0.1))
        mll = float(sp.sparse_mll_scalar(k, jnp.asarray(Z), jnp.asarray(X), jnp.asarray(Y), 0.1))
        assert elbo <= mll + 1e-8

    def test_elbo_tight_when_inducing_equals_data(self):
        """Z = X: Q_nn = K_nn, the trace penalty vanishes and the bound is
        tight against the DTC likelihood."""
        X, Y = self._data()
        X, Y = X[:40], Y[:40]
        k = kermod.Gaussian(1.5, 1.0)
        elbo = float(sp.titsias_elbo(k, X, X, Y, 0.1, jitter=1e-8))
        mll = float(sp.sparse_mll_scalar(k, jnp.asarray(X), jnp.asarray(X), jnp.asarray(Y), 0.1, jitter=1e-8))
        np.testing.assert_allclose(elbo, mll, rtol=1e-5)

    def test_fit_svgp_improves_and_predicts(self):
        X, Y = self._data()
        Z0 = X[::30] + 0.2
        k = kermod.Gaussian(1.0, 1.0)
        sgp, trace = sp.fit_svgp(k, Z0, X, Y, 0.1, iterations=100)
        assert float(trace[-1]) > float(trace[0])
        pred = np.asarray(sgp.predict(X))
        rmse = float(np.sqrt(np.mean((pred[:, 0] - np.sin(X[:, 0])) ** 2)))
        assert rmse < 0.15


def test_dense_mle_to_sparse_predict_handoff(rng):
    """The reference's MaximumLikelihoodTest2 scenario (.cpp:120): optimize
    hyperparameters on the DENSE likelihood, then hand them to a sparse
    inducing-point GP for prediction — quality must carry over."""
    from gpr_tpu.inference.optimize import fit_mle

    X = np.linspace(0, 10, 160)
    Y = np.sin(X) + 0.05 * rng.standard_normal(160)
    k0 = gt.Gaussian(0.5, 0.5)
    k_opt, _ = fit_mle(k0, X, Y, sigma=0.05, iterations=120, learning_rate=0.05)

    Z = X[::8][:, None]  # 20 inducing points
    sgp = sp.fit_sparse(k_opt, Z, X[:, None], Y, sigma=0.05)
    pred = np.asarray(sgp.predict(X[:, None]))[:, 0]
    rmse = float(np.sqrt(np.mean((pred - np.sin(X)) ** 2)))
    assert rmse < 0.08, rmse
    # the MLE must have moved the hyperparameters off the initialization
    assert not np.allclose(
        np.asarray(kermod.params_vector(k_opt)),
        np.asarray(kermod.params_vector(k0)),
    )


def test_sparse_save_load_roundtrip(tmp_path, rng):
    """Sparse persistence (beyond the reference, whose SparseGaussianProcess
    has no Save/Load of inducing state): bitwise round trip + identical
    predictions."""
    X = np.linspace(0, 8, 80)[:, None]
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(80)
    k = gt.Sum(gt.Gaussian(1.5, 1.0), gt.White(0.1))
    sgp = sp.fit_sparse(k, X[::8], X, Y, sigma=0.1, jitter=1e-8)
    path = str(tmp_path / "sparse.npz")
    sp.save_sparse(sgp, path)
    loaded = sp.load_sparse(path)
    assert loaded.kernel == sgp.kernel
    np.testing.assert_array_equal(np.asarray(loaded.alpha), np.asarray(sgp.alpha))
    p1 = np.asarray(sgp.predict(X[:5]))
    p2 = np.asarray(loaded.predict(X[:5]))
    np.testing.assert_array_equal(p1, p2)
    c1 = float(sgp.credible_interval(X[3]))
    c2 = float(loaded.credible_interval(X[3]))
    assert c1 == c2


def test_inducing_gradient_finite_difference(rng):
    """grad wrt inducing locations Z — the quantity optimize_inducing and
    fit_svgp descend — vs central finite differences, for both the sparse
    MLL and the Titsias collapsed ELBO."""
    X = rng.standard_normal((20, 2))
    Y = rng.standard_normal((20, 1))
    Z = rng.standard_normal((4, 2))
    k, sigma, jitter = gt.Gaussian(1.3, 0.9), 0.2, 1e-8

    _, g_mll = sp.sparse_mll_and_grad_inducing(k, Z, X, Y, sigma, jitter)
    g_elbo = np.asarray(
        jax.grad(lambda z: sp.titsias_elbo(k, z, X, Y, sigma, jitter))(
            jnp.asarray(Z)
        )
    )
    h = 1e-5
    for fn, g in (
        (lambda z: float(sp.sparse_mll_scalar(k, z, X, Y, sigma, jitter)), np.asarray(g_mll)),
        (lambda z: float(sp.titsias_elbo(k, z, X, Y, sigma, jitter)), g_elbo),
    ):
        for i, j in [(0, 0), (1, 1), (3, 0)]:
            e = np.zeros_like(Z)
            e[i, j] = h
            fd = (fn(jnp.asarray(Z + e)) - fn(jnp.asarray(Z - e))) / (2 * h)
            assert abs(fd - g[i, j]) < 2e-4 * max(1.0, abs(fd)), (i, j, fd, g[i, j])
