"""Exact GP regression tests.

Ports the semantics (analytic data + tolerances) of reference
tests/GaussianProcessTest.cpp, tests/PosteriorProcessTest.cpp and
tests/IOTest.cpp.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpr_tpu as gt
from gpr_tpu.utils import matrixio


def test1_sinus_regression():
    """Reference Test1 (tests/GaussianProcessTest.cpp:35-76):
    GaussianKernel(2.889), sigma=0, 10 samples of sin on [0, 2pi),
    summed |err| over 50 test points < 0.0008."""
    k = gt.Gaussian(2.889)
    xs = np.arange(10) * 2 * math.pi / 10
    gp = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.0)
    xt = np.arange(50) * 2 * math.pi / 50
    pred = np.asarray(gp.predict(jnp.asarray(xt[:, None])))[:, 0]
    err = np.sum(np.abs(pred - np.sin(xt)))
    assert err < 0.0008, err


def test2_2d_regression():
    """Reference Test2 (GaussianProcessTest.cpp:78-121): sin/cos
    simultaneously, summed error < 0.005."""
    k = gt.Gaussian(3.24)
    t = np.arange(10) * 2 * math.pi / 10
    X = np.stack([t, t], axis=1)
    Y = np.stack([np.sin(t), np.cos(t)], axis=1)
    gp = gt.fit(k, X, Y, sigma=0.0)
    tt = np.arange(50) * 2 * math.pi / 50
    Xt = np.stack([tt, tt], axis=1)
    P = np.asarray(gp.predict(jnp.asarray(Xt)))
    err = np.sum(np.abs(P[:, 0] - np.sin(tt))) + np.sum(np.abs(P[:, 1] - np.cos(tt)))
    assert err < 0.005, err


def test4_vector_input_scalar_output():
    """Reference Test4 (GaussianProcessTest.cpp:157-236): landmark
    interpolation at sigma=0 — the GP must reproduce training labels."""
    k = gt.Gaussian(3.24)
    X = np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 8.0], [3.0, 5.0]])
    Y = np.array([[10.0], [3.0], [3.0], [5.0]])
    gp = gt.fit(k, X, Y, sigma=0.0)
    P = np.asarray(gp.predict(jnp.asarray(X)))
    np.testing.assert_allclose(P, Y, atol=1e-6)


def test5_derivative_process():
    """Reference Test5 (GaussianProcessTest.cpp:238-279): derivative of a
    sinus GP (unit-sigma Gaussian kernel) approximates cosine; summed error
    over 50 points < 0.6."""
    k = gt.Gaussian(1.0)
    xs = np.arange(20) * 4 * math.pi / 20
    gp = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.0)
    err = 0.0
    for i in range(50):
        x = jnp.asarray([i * 4 * math.pi / 50])
        _, D = gp.predict_derivative(x)
        err += abs(float(D[0, 0]) - math.cos(float(x[0])))
    assert err < 0.6, err


def test_input_dim_check():
    k = gt.Gaussian(1.0)
    gp = gt.fit(k, np.zeros((3, 2)), np.zeros((3, 1)), sigma=0.1)
    with pytest.raises(ValueError):
        gp.predict(jnp.asarray([1.0, 2.0, 3.0]))


def test_empty_training_rejected():
    with pytest.raises(ValueError):
        gt.fit(gt.Gaussian(1.0), np.zeros((0, 1)), np.zeros((0, 1)))


def test_posterior_variance_and_credible_interval():
    """Reference PosteriorProcessTest semantics: at sigma=0 the posterior
    variance at training points is ~0 and samples interpolate landmarks."""
    k = gt.Gaussian(1.5)
    xs = np.linspace(0, 2 * math.pi, 8)
    gp = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.0)
    for x in xs:
        ci = float(gp.credible_interval(jnp.asarray([x])))
        assert ci < 1e-4, ci
    # between points variance is positive
    ci_mid = float(gp.credible_interval(jnp.asarray([(xs[0] + xs[1]) / 2])))
    assert ci_mid >= 0.0
    # batched variance path agrees with pointwise path
    xt = np.linspace(0, 2 * math.pi, 13)
    batched = np.asarray(gp.credible_interval(jnp.asarray(xt[:, None])))
    pointwise = np.array(
        [float(gp.credible_interval(jnp.asarray([x]))) for x in xt]
    )
    np.testing.assert_allclose(batched, pointwise, atol=1e-7)


def test_posterior_sampling_interpolates():
    """Reference tests/PosteriorProcessTest.cpp:97-165: posterior samples at
    sigma=0 pass through the landmarks."""
    k = gt.Gaussian(1.5)
    xs = np.linspace(0, 2 * math.pi, 8)
    ys = np.sin(xs)
    gp = gt.fit(k, xs[:, None], ys[:, None], sigma=0.0)
    samples = gp.sample_posterior(jax.random.PRNGKey(0), jnp.asarray(xs[:, None]), 5)
    arr = np.asarray(samples)[:, :, 0]  # (5, 8)
    np.testing.assert_allclose(arr, np.broadcast_to(ys, arr.shape), atol=1e-3)


def test_posterior_cov_matches_definition(rng):
    k = gt.Gaussian(1.2, 0.9)
    X = rng.standard_normal((12, 2))
    Y = rng.standard_normal((12, 1))
    sigma = 0.3
    gp = gt.fit(k, X, Y, sigma=sigma)
    x = jnp.asarray(rng.standard_normal(2))
    y = jnp.asarray(rng.standard_normal(2))
    # direct formula with explicit inverse
    K = np.asarray(gt.gram(k, jnp.asarray(X))) + sigma**2 * np.eye(12)
    Kx = np.asarray(gt.kvec(k, jnp.asarray(X), x))
    Ky = np.asarray(gt.kvec(k, jnp.asarray(X), y))
    ref = float(k(x, y)) - Kx @ np.linalg.solve(K, Ky)
    got = float(gp.posterior_cov(x, y))
    assert abs(ref - got) < 1e-10


def test_efficient_storage_mode():
    """Reference GaussianProcess.h:150-156: efficient storage drops the core
    matrix; predictions identical, posterior cov recomputed on demand."""
    k = gt.Gaussian(1.5)
    xs = np.linspace(0, 5, 9)
    gp_full = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.1)
    gp_eff = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.1, efficient_storage=True)
    assert gp_eff.L is None
    x = jnp.asarray([2.3])
    np.testing.assert_allclose(
        float(gp_full.predict(x)[0]), float(gp_eff.predict(x)[0]), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(gp_full.credible_interval(x)),
        float(gp_eff.credible_interval(x)),
        rtol=1e-8,
        atol=1e-12,
    )


def test_describe_and_inversion_error():
    """Reference ToString (lib/GaussianProcess.cpp:268-288) and the
    debug-mode inversion check (:507-509): the summary carries the model
    facts and the Cholesky-based core reproduces (K+sigma^2 I)^-1 to
    near-machine accuracy."""
    k = gt.Gaussian(2.0, 1.5)
    xs = np.linspace(0, 5, 9)
    gp = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.1)
    s = gp.describe()
    assert "Gaussian Process" in s
    assert "# samples:\t\t9" in s
    assert "GaussianKernel" in s
    assert "input dimension:\t1" in s
    err = float(gp.inversion_error())
    assert err < 1e-10, err  # f64 on the CPU suite
    # efficient-storage models recompute the factor transparently
    gp_eff = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.1,
                    efficient_storage=True)
    assert float(gp_eff.inversion_error()) < 1e-10


def test_save_load_roundtrip(tmp_path):
    """Reference tests/IOTest.cpp: full GP save/load round-trips under deep
    operator== (incl. efficient-storage variant)."""
    k = gt.Sum(gt.Gaussian(2.0, 1.5), gt.White(0.1))
    xs = np.linspace(0, 5, 7)
    gp = gt.fit(k, xs[:, None], np.stack([np.sin(xs), np.cos(xs)], 1), sigma=0.2)
    prefix = str(tmp_path / "model")
    gp.save(prefix)
    gp2 = gt.load(prefix)
    assert gp == gp2
    x = jnp.asarray([1.234])
    np.testing.assert_allclose(
        np.asarray(gp.predict(x)), np.asarray(gp2.predict(x)), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(gp.credible_interval(x)), float(gp2.credible_interval(x)), rtol=1e-8
    )
    # efficient storage variant: CoreMatrix saved as 0x0
    gp_eff = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.2, efficient_storage=True)
    prefix2 = str(tmp_path / "model_eff")
    gp_eff.save(prefix2)
    core = matrixio.read_matrix(prefix2 + "-CoreMatrix.txt")
    assert core.shape == (0, 0)
    gp_eff2 = gt.load(prefix2)
    np.testing.assert_allclose(
        np.asarray(gp_eff.predict(x)), np.asarray(gp_eff2.predict(x)), rtol=1e-12
    )


def test_load_consumes_core_matrix(tmp_path):
    """Round-5 VERDICT item 8: ``load`` consumes the stored CoreMatrix
    directly (reference lib/GaussianProcess.cpp:183-268) — no O(n^3)
    refactorization — and the core-GEMM covariance path matches the
    Cholesky path."""
    k = gt.Gaussian(2.0, 1.5)
    xs = np.linspace(0, 5, 11)
    gp = gt.fit(k, xs[:, None], np.sin(xs)[:, None], sigma=0.2)
    prefix = str(tmp_path / "coremodel")
    gp.save(prefix)
    gp2 = gt.load(prefix)
    # the loaded model holds the explicit inverse, NOT a refit factor
    assert gp2.L is None and gp2.core is not None
    assert gp2.core.shape == (11, 11)
    x = jnp.asarray([2.345])
    np.testing.assert_allclose(
        float(gp.credible_interval(x)), float(gp2.credible_interval(x)),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(gp.posterior_var(xs[:5, None])),
        np.asarray(gp2.posterior_var(xs[:5, None])), rtol=1e-7, atol=1e-12,
    )
    assert float(gp2.inversion_error()) < 1e-8
    # save round-trips the loaded artifact bit-for-bit
    prefix3 = str(tmp_path / "resaved")
    gp2.save(prefix3)
    c1 = matrixio.read_matrix(prefix + "-CoreMatrix.txt")
    c2 = matrixio.read_matrix(prefix3 + "-CoreMatrix.txt")
    np.testing.assert_array_equal(c1, c2)
    # materialize() restores a factor for extend/shrink on loaded models
    gp3 = gp2.materialize()
    assert gp3.L is not None
    np.testing.assert_allclose(
        np.asarray(gp3.L), np.asarray(gp.L), rtol=1e-10, atol=1e-12
    )


def test_matrixio_roundtrip(tmp_path, rng):
    """Reference lib/MatrixIO.cpp:103-117 self-test + fixture compat."""
    assert matrixio.matrix_io_test(str(tmp_path))
    M = rng.standard_normal((5, 4)).astype(np.float32)
    p = str(tmp_path / "m32.bin")
    matrixio.write_matrix(M, p)
    N = matrixio.read_matrix(p)
    assert N.dtype == np.float32
    np.testing.assert_array_equal(M, N)


def test_matrixio_reads_reference_fixture():
    """The reference test fixture tests/data/breathing1D.mat (header
    '1 3773', float64 payload) must load."""
    import os

    path = "/root/reference/tests/data/breathing1D.mat"
    if not os.path.exists(path):
        pytest.skip("reference fixture not available")
    M = matrixio.read_matrix(path)
    assert M.shape == (1, 3773)
    assert np.all(np.isfinite(M))


def test_performance_shape_n2500_d73(rng):
    """Reference Test3 (GaussianProcessTest.cpp:123-155): n=2500, d=73
    random data trains and predicts without error (timing is reported by
    bench.py, not asserted here)."""
    n, d = 500, 73  # reduced n on CPU test mesh; bench.py runs the full size
    X = rng.standard_normal((n, d))
    Y = rng.standard_normal((n, d))
    gp = gt.fit(gt.Gaussian(4.0), X, Y, sigma=0.01)
    P = np.asarray(gp.predict(jnp.asarray(rng.standard_normal((50, d)))))
    assert P.shape == (50, d)
    assert np.all(np.isfinite(P))


def test_loo_cv_matches_refits(rng):
    """The one-factorization LOO identities must equal brute-force refits
    without each point."""
    from gpr_tpu.gp.exact import loo_cv

    n = 25
    X = np.linspace(0, 5, n)
    Y = np.sin(X) + 0.1 * rng.standard_normal(n)
    k = gt.Gaussian(1.0, 1.0)
    gp = gt.fit(k, X, Y, sigma=0.2)
    loo_mean, loo_var, lpd = loo_cv(gp)

    for i in (0, 7, 24):
        mask = np.arange(n) != i
        gp_i = gt.fit(k, X[mask], Y[mask], sigma=0.2)
        m = float(np.asarray(gp_i.predict(np.atleast_1d(X[i])))[0])
        v = float(gp_i.posterior_cov(np.atleast_1d(X[i]), np.atleast_1d(X[i]))) + 0.2**2
        np.testing.assert_allclose(float(loo_mean[i, 0]), m, rtol=1e-8)
        np.testing.assert_allclose(float(loo_var[i]), v, rtol=1e-8)
    assert np.isfinite(float(lpd))


class TestExtend:
    def test_extend_matches_refit(self):
        import numpy as np
        import jax.numpy as jnp
        import gpr_tpu as gt
        from gpr_tpu.gp import exact

        rng = np.random.default_rng(21)
        X = rng.standard_normal((30, 2))
        Y = np.sin(X.sum(-1, keepdims=True))
        Xn = rng.standard_normal((7, 2))
        Yn = np.sin(Xn.sum(-1, keepdims=True))
        k = gt.Gaussian(1.3, 0.9)
        gp = exact.fit(k, X, Y, sigma=0.1)
        ext = exact.extend(gp, Xn, Yn)
        ref = exact.fit(k, np.concatenate([X, Xn]), np.concatenate([Y, Yn]),
                        sigma=0.1)
        np.testing.assert_allclose(np.asarray(ext.L), np.asarray(ref.L),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(ext.alpha),
                                   np.asarray(ref.alpha), atol=1e-9)
        # and the prediction surface agrees
        Xs = rng.standard_normal((5, 2))
        np.testing.assert_allclose(np.asarray(ext.predict(Xs)),
                                   np.asarray(ref.predict(Xs)), atol=1e-9)

    def test_extend_repeated_streaming(self):
        import numpy as np
        import gpr_tpu as gt
        from gpr_tpu.gp import exact

        rng = np.random.default_rng(22)
        X = rng.standard_normal((10, 1))
        Y = np.sin(X)
        gp = exact.fit(gt.Gaussian(1.0, 1.0), X, Y, sigma=0.05)
        for i in range(3):
            xn = rng.standard_normal((4, 1))
            gp = exact.extend(gp, xn, np.sin(xn))
        assert gp.num_samples == 22
        ref = exact.fit(gt.Gaussian(1.0, 1.0), np.asarray(gp.X),
                        np.asarray(gp.Y), sigma=0.05)
        np.testing.assert_allclose(np.asarray(gp.alpha),
                                   np.asarray(ref.alpha), atol=1e-8)

    def test_shrink_matches_refit(self):
        import numpy as np
        import gpr_tpu as gt
        from gpr_tpu.gp import exact

        rng = np.random.default_rng(31)
        X = rng.standard_normal((25, 2))
        Y = np.sin(X.sum(-1, keepdims=True))
        k = gt.Gaussian(1.3, 0.9)
        gp = exact.fit(k, X, Y, sigma=0.1)
        small = exact.shrink(gp, 6)
        ref = exact.fit(k, X[6:], Y[6:], sigma=0.1)
        np.testing.assert_allclose(np.asarray(small.L), np.asarray(ref.L),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(small.alpha),
                                   np.asarray(ref.alpha), atol=1e-8)

    def test_sliding_window_extend_shrink(self):
        """extend + shrink = an O(n^2) window slide matching a fresh fit."""
        import numpy as np
        import gpr_tpu as gt
        from gpr_tpu.gp import exact

        rng = np.random.default_rng(33)
        X = rng.standard_normal((20, 1))
        Y = np.sin(X)
        gp = exact.fit(gt.Gaussian(1.0, 1.0), X, Y, sigma=0.05)
        for _ in range(3):
            xn = rng.standard_normal((2, 1))
            gp = exact.shrink(exact.extend(gp, xn, np.sin(xn)), 2)
        assert gp.num_samples == 20
        ref = exact.fit(gt.Gaussian(1.0, 1.0), np.asarray(gp.X),
                        np.asarray(gp.Y), sigma=0.05)
        np.testing.assert_allclose(np.asarray(gp.alpha),
                                   np.asarray(ref.alpha), atol=1e-7)
