"""NUTS sampler tests: analytic-target moments, agreement with HMC on a GP
hyperparameter posterior, and robustness on pathological targets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpr_tpu
from gpr_tpu.inference import hmc as hmc_mod
from gpr_tpu.inference.nuts import NUTSConfig, sample_nuts


class TestNUTSGaussian:
    def test_correlated_gaussian_moments(self):
        cov = jnp.asarray([[1.0, 0.8], [0.8, 2.0]])
        prec = jnp.linalg.inv(cov)
        logp = lambda z: -0.5 * z @ prec @ z
        res = sample_nuts(
            logp,
            np.zeros((4, 2)),
            jax.random.PRNGKey(0),
            NUTSConfig(num_warmup=300, num_samples=400, max_depth=6),
        )
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(s.mean(0), [0, 0], atol=0.15)
        np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.3)
        assert np.all(np.asarray(res.accept_rate) > 0.6)

    def test_anisotropic_mass_adaptation(self):
        """Badly scaled target: warmup must adapt the diagonal metric."""
        scales = jnp.asarray([0.1, 10.0])
        logp = lambda z: -0.5 * jnp.sum((z / scales) ** 2)
        res = sample_nuts(
            logp,
            np.zeros((2, 2)),
            jax.random.PRNGKey(1),
            NUTSConfig(num_warmup=400, num_samples=300, max_depth=8),
        )
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.3)
        # inverse mass should reflect the variances (ratio >> 1)
        im = np.asarray(res.inv_mass)
        assert im[1] / im[0] > 100

    def test_heavy_tail_no_nan(self):
        """Cauchy-ish target: divergence guard must keep the chain finite."""
        logp = lambda z: -jnp.sum(jnp.log1p(z**2))
        res = sample_nuts(
            logp,
            np.zeros((2, 1)),
            jax.random.PRNGKey(2),
            NUTSConfig(num_warmup=100, num_samples=100, max_depth=5),
        )
        assert np.all(np.isfinite(np.asarray(res.samples)))


class TestNUTSOnGP:
    @pytest.mark.slow
    def test_matches_hmc_posterior(self):
        """NUTS and HMC must agree on the GP hyperparameter posterior
        within Monte-Carlo error (the north-star consistency check)."""
        rng = np.random.default_rng(0)
        X = np.linspace(0, 6, 40)
        Y = np.sin(X) + 0.1 * rng.standard_normal(40)
        kernel = gpr_tpu.Gaussian(1.0, 1.0)
        logp = hmc_mod.make_gp_log_posterior(kernel, X, Y, sigma=0.1)

        z0 = np.zeros((2, 2))
        hmc_res = hmc_mod.sample_hmc(
            logp, z0, jax.random.PRNGKey(3),
            hmc_mod.HMCConfig(num_warmup=300, num_samples=400, num_leapfrog=16),
        )
        nuts_res = sample_nuts(
            logp, z0, jax.random.PRNGKey(4),
            NUTSConfig(num_warmup=300, num_samples=400, max_depth=7),
        )
        # the scale parameter's posterior is heavy-tailed (weakly identified
        # on 40 points), so compare robust z-space medians rather than means
        z_hmc = np.asarray(hmc_res.samples).reshape(-1, 2)
        z_nuts = np.asarray(nuts_res.samples).reshape(-1, 2)
        med_hmc = np.median(z_hmc, axis=0)
        med_nuts = np.median(z_nuts, axis=0)
        np.testing.assert_allclose(med_nuts, med_hmc, atol=0.5)
        # the lengthscale IS well identified — tight agreement required
        np.testing.assert_allclose(
            np.exp(med_nuts[0]), np.exp(med_hmc[0]), rtol=0.15
        )
        assert np.all(np.asarray(nuts_res.accept_rate) > 0.5)


class TestNUTSNonGaussian:
    def test_lognormal_target_moments(self):
        """Exact non-Gaussian check: z ~ N(mu, s^2) componentwise implies
        exp(z) has known log-normal mean/variance; sampling in z-space must
        reproduce them (this is precisely the GP log-hyperparameter
        situation)."""
        mu = jnp.asarray([0.3, -0.5])
        s = jnp.asarray([0.4, 0.7])
        logp = lambda z: -0.5 * jnp.sum(((z - mu) / s) ** 2)
        res = sample_nuts(
            logp, np.zeros((4, 2)), jax.random.PRNGKey(7),
            NUTSConfig(num_warmup=300, num_samples=500, max_depth=6),
        )
        theta = np.exp(np.asarray(res.samples).reshape(-1, 2))
        mean_expected = np.exp(np.asarray(mu) + np.asarray(s) ** 2 / 2)
        np.testing.assert_allclose(theta.mean(0), mean_expected, rtol=0.1)
        var_expected = (np.exp(np.asarray(s) ** 2) - 1) * mean_expected**2
        np.testing.assert_allclose(theta.var(0), var_expected, rtol=0.35)

    def test_ess_is_healthy(self):
        """NUTS draws on a standard normal must have high effective sample
        size per draw (the adaptive trajectories decorrelate)."""
        from gpr_tpu.inference.hmc import effective_sample_size

        logp = lambda z: -0.5 * jnp.sum(z * z)
        res = sample_nuts(
            logp, np.zeros((4, 2)), jax.random.PRNGKey(8),
            NUTSConfig(num_warmup=200, num_samples=300, max_depth=6),
        )
        ess = np.asarray(effective_sample_size(res.samples))
        total = 4 * 300
        assert np.all(ess > 0.25 * total), ess


def test_nuts_windowed_warmup_metric():
    """NUTS with expanding-window warmup recovers the hard-target metric."""
    scales = jnp.asarray([0.05, 20.0])
    logp = lambda z: -0.5 * jnp.sum((z / scales) ** 2)
    res = sample_nuts(
        logp, np.zeros((2, 2)), jax.random.PRNGKey(0),
        NUTSConfig(num_warmup=300, num_samples=200, max_depth=7,
                   windowed_warmup=True),
    )
    im = np.asarray(res.inv_mass)
    assert im[1] / im[0] > (400**2) / 4
    s = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.3)


@pytest.mark.slow
def test_nuts_chunked_matches_scan():
    """sample_nuts_chunked reproduces sample_nuts over a short run (same
    key flow; unrolled programs round differently, so short runs only —
    see test_hmc.test_chunked_sampler_matches_scan)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import gpr_tpu as gt
    from gpr_tpu.inference import hmc as hm
    from gpr_tpu.inference import nuts as nt

    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((16, 2)))
    Y = jnp.asarray(np.sin(np.asarray(X[:, 0])))[:, None]
    logp = hm.make_gp_log_posterior(gt.Gaussian(1.0, 1.0), X, Y, sigma=0.1)
    z0 = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(7)
    cfg = nt.NUTSConfig(num_warmup=16, num_samples=7, max_depth=4)

    r_scan = nt.sample_nuts(logp, z0, key, cfg)
    r_chunk = nt.sample_nuts_chunked(logp, z0, key, cfg, chunk_size=3)

    np.testing.assert_allclose(
        np.asarray(r_chunk.samples), np.asarray(r_scan.samples), atol=1e-7
    )
    np.testing.assert_allclose(
        float(r_chunk.step_size), float(r_scan.step_size), rtol=1e-8
    )
