"""Posterior-predictive (Bayesian-model-averaged) GP tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpr_tpu
from gpr_tpu.inference import hmc as hmc_mod
from gpr_tpu.inference.predictive import (
    predictive,
    predictive_from_hmc,
    subsample_draws,
)


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    X = np.linspace(0, 6, 40)
    Y = np.sin(X) + 0.1 * rng.standard_normal(40)
    return X, Y


class TestPredictive:
    def test_single_draw_equals_plain_gp(self, dataset):
        """With one draw the mixture collapses to that draw's GP."""
        X, Y = dataset
        theta = jnp.asarray([[1.3, 0.9]])
        res = predictive(
            gpr_tpu.Gaussian(1.0, 1.0), theta, X, Y, X[:10], 0.1,
            include_noise=False,
        )
        gp = gpr_tpu.fit(gpr_tpu.Gaussian(1.3, 0.9), X, Y, sigma=0.1)
        np.testing.assert_allclose(
            np.asarray(res.mean)[:, 0],
            np.asarray(gp.predict(X[:10])).ravel(),
            atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(res.variance),
            np.asarray(gp.posterior_var(X[:10][:, None])),
            atol=1e-8,
        )

    def test_mixture_variance_exceeds_mean_of_variances(self, dataset):
        """Disagreeing draws inflate predictive variance (the epistemic
        term the reference's point estimate cannot express)."""
        X, Y = dataset
        theta = jnp.asarray([[0.3, 1.0], [3.0, 1.0]])  # very different fits
        res = predictive(
            gpr_tpu.Gaussian(1.0, 1.0), theta, X, Y, np.linspace(0, 6, 25), 0.1
        )
        assert np.all(
            np.asarray(res.variance)
            >= np.asarray(res.variance_per_draw).mean(0) - 1e-9
        )
        # and strictly greater somewhere (the draws disagree)
        assert np.any(
            np.asarray(res.variance)
            > np.asarray(res.variance_per_draw).mean(0) + 1e-4
        )

    @pytest.mark.slow
    def test_end_to_end_with_hmc(self, dataset):
        """HMC draws -> thinned -> averaged prediction beats noise floor."""
        X, Y = dataset
        kernel = gpr_tpu.Gaussian(1.0, 1.0)
        logp = hmc_mod.make_gp_log_posterior(kernel, X, Y, sigma=0.1)
        res = hmc_mod.sample_hmc(
            logp, np.zeros((2, 2)), jax.random.PRNGKey(0),
            hmc_mod.HMCConfig(num_warmup=200, num_samples=200, num_leapfrog=8),
        )
        pred = predictive_from_hmc(
            kernel, res, X, Y, X, 0.1, num_draws=8, include_noise=False
        )
        rmse = float(
            np.sqrt(np.mean((np.asarray(pred.mean)[:, 0] - np.sin(X)) ** 2))
        )
        assert rmse < 0.1, rmse
        assert np.all(np.asarray(pred.variance) >= 0)

    def test_subsample_shapes(self):
        z = jnp.zeros((4, 100, 3))
        t = subsample_draws(z, 16)
        assert t.shape == (16, 3)
        np.testing.assert_allclose(np.asarray(t), 1.0)  # exp(0)


class TestShardedPredictive:
    def test_matches_single_device(self, dataset):
        """Draws sharded over 8 devices reproduce the single-device mixture
        exactly (psum-combined moments)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from gpr_tpu.inference.predictive import predictive_sharded

        X, Y = dataset
        rng = np.random.default_rng(1)
        theta = jnp.asarray(np.abs(rng.normal(1.2, 0.2, (16, 2))))
        k = gpr_tpu.Gaussian(1.0, 1.0)
        r1 = predictive(k, theta, X, Y, X[:8], 0.1)
        r2 = predictive_sharded(k, theta, X, Y, X[:8], 0.1)
        np.testing.assert_allclose(
            np.asarray(r2.mean), np.asarray(r1.mean), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(r2.variance), np.asarray(r1.variance), atol=1e-12
        )

    def test_indivisible_draws_rejected(self, dataset):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from gpr_tpu.inference.predictive import predictive_sharded

        X, Y = dataset
        with pytest.raises(ValueError):
            predictive_sharded(
                gpr_tpu.Gaussian(1.0, 1.0), jnp.ones((10, 2)), X, Y, X[:4], 0.1
            )
