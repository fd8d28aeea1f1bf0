"""Feature-pipeline tests: PCA + AR(p).

Golden semantics from the reference (include/PCA.h, include/AutoRegression.h)
re-derived independently in numpy inside the tests — projection identities,
1/sqrt(N) scaling, zero-padded delay embeddings, n-step rollouts, batching
quirks, and persistence round-trips.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpr_tpu.pipeline import autoregression as ar
from gpr_tpu.pipeline import pca as pca_mod


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

class TestPCA:
    def _data(self, d=40, N=25, seed=0):
        rng = np.random.default_rng(seed)
        # low-rank + noise so the spectrum is interesting
        A = rng.standard_normal((d, 5))
        B = rng.standard_normal((5, N))
        return A @ B + 0.01 * rng.standard_normal((d, N)) + 3.0

    def test_sigma_scaling_matches_svd(self):
        """sigma = singular_values(X - mean)/sqrt(N) (reference PCA.h:44)."""
        X = self._data()
        model = pca_mod.fit_pca(X)
        Xc = X - X.mean(axis=1, keepdims=True)
        s = np.linalg.svd(Xc, compute_uv=False)
        np.testing.assert_allclose(
            np.asarray(model.sigma), s / np.sqrt(X.shape[1]), rtol=1e-10,
            atol=1e-12,
        )

    def test_gram_trick_equals_direct_svd(self):
        """The d>N Gram-trick path must give the same subspace/spectrum as
        the direct SVD path (reference uses BDCSVD always, PCA.h:41)."""
        X = self._data(d=300, N=20)
        direct = pca_mod.fit_pca(X, gram_threshold=10**9)  # force SVD path
        grammed = pca_mod.fit_pca(X, gram_threshold=1)  # force Gram path
        # the Gram trick is sqrt(eps)-accurate on (numerically) zero
        # singular values — compare with a spectrum-relative atol
        top = float(direct.sigma[0])
        np.testing.assert_allclose(
            np.asarray(grammed.sigma), np.asarray(direct.sigma),
            rtol=1e-7, atol=1e-7 * top,
        )
        # columns match up to sign
        for j in range(5):
            u1 = np.asarray(direct.U[:, j])
            u2 = np.asarray(grammed.U[:, j])
            assert min(np.linalg.norm(u1 - u2), np.linalg.norm(u1 + u2)) < 1e-6

    def test_projection_reconstruction_identity(self):
        """Full-rank reduce -> reconstruct is the identity: the whitened
        basis (PCA.h:46) against the scaled inverse basis (PCA.h:47)."""
        X = self._data(d=30, N=12)
        model = pca_mod.fit_pca(X)
        W = model.reduce(X)
        Xr = model.reconstruct(W)
        np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-8)

    def test_truncation_reduces_error_monotonically(self):
        rng = np.random.default_rng(0)
        X = rng.standard_normal((50, 5)) @ rng.standard_normal((5, 30))  # exact rank 5
        model = pca_mod.fit_pca(X)
        errs = []
        for k in (1, 3, 5):
            W = model.reduce(X, n_features=k)
            Xr = model.reconstruct(W, n_features=k)
            errs.append(float(np.linalg.norm(np.asarray(Xr) - X)))
        assert errs == sorted(errs, reverse=True)
        assert errs[-1] < 1e-6  # rank-5 data: 5 modes reconstruct exactly

    def test_explained_variance(self):
        X = self._data()
        ev = np.asarray(pca_mod.fit_pca(X).explained_variance())
        assert np.all(np.diff(ev) >= 0)
        assert abs(ev[-1] - 1.0) < 1e-12
        model = pca_mod.fit_pca(X)
        k = model.modes_for_compactness(0.95)
        assert 1 <= k <= 6  # rank-5 signal

    def test_save_load_roundtrip(self, tmp_path):
        """{prefix}Mean.bin/Sigma.bin/U.bin artifact set (PCA.h:126-134)."""
        X = self._data()
        model = pca_mod.fit_pca(X)
        prefix = str(tmp_path / "pcatest")
        model.save(prefix)
        loaded = pca_mod.load_pca(prefix)
        np.testing.assert_allclose(np.asarray(loaded.mean), np.asarray(model.mean))
        np.testing.assert_allclose(np.asarray(loaded.sigma), np.asarray(model.sigma))
        np.testing.assert_allclose(np.asarray(loaded.U), np.asarray(model.U))
        W1 = np.asarray(model.reduce(X, 4))
        W2 = np.asarray(loaded.reduce(X, 4))
        np.testing.assert_allclose(W1, W2, atol=1e-12)


# ---------------------------------------------------------------------------
# AR(p)
# ---------------------------------------------------------------------------

def _ref_embed(Xb: np.ndarray, p: int) -> np.ndarray:
    """Independent numpy replica of the reference's ComputeSubmatrix
    (AutoRegression.h:189-199): D[t, k] = Xb[t-k] for t >= k else 0."""
    K = len(Xb) - 1
    D = np.zeros((K, p))
    for k in range(p):
        for t in range(k, K):
            D[t, k] = Xb[t - k]
    return D


class TestAutoRegression:
    def test_embedding_matches_reference_recurrence(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(9)
        p = 3
        D, Y = ar.build_design(x, p, batches=[(9, 1)])
        np.testing.assert_allclose(np.asarray(D)[:, :, 0], _ref_embed(x, p))
        np.testing.assert_allclose(np.asarray(Y)[:, 0], x[1:])

    def test_recovers_ar_coefficients(self):
        """Noise-free AR(2) series: theta must equal the generating
        coefficients (the embedding discards the zero-padded startup rows'
        influence asymptotically).  Uses a marginally-stable oscillator
        (sustained excitation) with the zero-history convention x[-1] = 0 so
        every embedded row is consistent with the recurrence."""
        phi = np.array([2 * np.cos(0.7), -1.0])
        T = 400
        x = np.zeros(T)
        x[0] = 1.0
        x[1] = phi[0] * x[0]  # x[-1] = 0
        for t in range(2, T):
            x[t] = phi[0] * x[t - 1] + phi[1] * x[t - 2]
        theta = np.asarray(ar.fit_ar(x, p=2, batches=[(T, 1)]))
        np.testing.assert_allclose(theta[:, 0], phi, atol=1e-6)

    def test_multifeature_independent(self):
        """Features are fit independently (the reference loops per feature,
        AutoRegression.h:79-107; we vmap)."""
        T = 200
        phi0 = np.array([2 * np.cos(0.5), -1.0])
        phi1 = np.array([2 * np.cos(1.3), -1.0])
        X = np.zeros((T, 2))
        X[0] = [1.0, -0.7]
        X[1, 0] = phi0[0] * X[0, 0]
        X[1, 1] = phi1[0] * X[0, 1]
        for t in range(2, T):
            X[t, 0] = phi0 @ X[t - 2 : t, 0][::-1]
            X[t, 1] = phi1 @ X[t - 2 : t, 1][::-1]
        theta = np.asarray(ar.fit_ar(X, p=2, batches=[(T, 1)]))
        np.testing.assert_allclose(theta[:, 0], phi0, atol=1e-6)
        np.testing.assert_allclose(theta[:, 1], phi1, atol=1e-6)

    def test_rollout_matches_manual(self):
        """n-step rollout = repeated (D @ theta, shift) (reference
        AutoRegression.h:166-173), checked against a numpy loop."""
        rng = np.random.default_rng(4)
        x = rng.standard_normal(12)
        p, n = 3, 4
        theta = np.asarray(ar.fit_ar(x, p, batches=[(12, 1)]))
        pred = np.asarray(
            ar.predict_ar(x, jnp.asarray(theta), n, batches=[(12, 1)],
                          one_prediction_per_batch=False)
        )
        D = _ref_embed(x, p)
        for _ in range(n):
            y = D @ theta[:, 0]
            D = np.concatenate([y[:, None], D[:, : p - 1]], axis=1)
        np.testing.assert_allclose(pred[:, 0], y, atol=1e-10)

    def test_batches_are_isolated(self):
        """The embedding restarts (zero history) at every batch boundary."""
        rng = np.random.default_rng(5)
        a = rng.standard_normal(6)
        b = rng.standard_normal(6)
        D, _ = ar.build_design(np.concatenate([a, b]), 2, batches=[(6, 2)])
        D = np.asarray(D)[:, :, 0]
        np.testing.assert_allclose(D[:5], _ref_embed(a, 2))
        np.testing.assert_allclose(D[5:], _ref_embed(b, 2))

    def test_one_prediction_per_batch_default(self):
        """batches=None forces the reference default: batches of size p and
        one prediction per batch (AutoRegression.h:120-126,176-183)."""
        rng = np.random.default_rng(6)
        p = 3
        x = rng.standard_normal(9)  # 3 batches of size p=3
        theta = ar.fit_ar(x, p)
        pred = np.asarray(ar.predict_ar(x, theta, n=1))
        assert pred.shape == (3, 1)
        full = np.asarray(
            ar.predict_ar(x, theta, n=1, batches=[(3, 3)],
                          one_prediction_per_batch=False)
        )
        # reference picks row (b+1)*(B0-1)-1 per batch
        np.testing.assert_allclose(pred[:, 0], full[[1, 3, 5], 0])

    def test_batch_validation(self):
        with pytest.raises(ValueError):
            ar.build_design(np.zeros(10), 2, batches=[(3, 2)])  # 6 != 10

    def test_save_load_roundtrip(self, tmp_path):
        theta = jnp.asarray(np.random.default_rng(7).standard_normal((3, 4)))
        path = str(tmp_path / "armodel.bin")
        ar.save_ar(theta, path)
        loaded = ar.load_ar(path)
        np.testing.assert_allclose(np.asarray(loaded), np.asarray(theta))
