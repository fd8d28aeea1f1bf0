"""Mean-field ADVI (inference/advi.py) — the VI leg of the BASELINE
north star ("NUTS/HMC and VI instead of L-BFGS point estimates")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpr_tpu
from gpr_tpu.inference import advi, hmc


def test_standard_normal_recovery():
    def logp(z):
        return -0.5 * jnp.sum(z * z)

    res = advi.fit_advi(
        logp, jnp.asarray([0.7, -0.4], jnp.float32), jax.random.PRNGKey(0),
        num_steps=600, num_samples=16, learning_rate=0.05,
    )
    np.testing.assert_allclose(np.asarray(res.mean), [0.0, 0.0], atol=0.08)
    np.testing.assert_allclose(np.asarray(res.std), [1.0, 1.0], atol=0.12)
    # exact family match: at the optimum ELBO = log Z = log(2 pi) for the
    # UNNORMALIZED 2-D standard-normal target (up to MC noise of the
    # 16-draw estimator)
    assert abs(float(res.elbo) - np.log(2 * np.pi)) < 0.8
    # trace improves
    assert float(res.elbo_trace[-1]) > float(res.elbo_trace[0])


def test_anisotropic_scales():
    scales = jnp.asarray([0.5, 2.0], jnp.float32)

    def logp(z):
        return -0.5 * jnp.sum((z / scales) ** 2)

    res = advi.fit_advi(
        logp, jnp.zeros(2, jnp.float32), jax.random.PRNGKey(1),
        num_steps=800, num_samples=16,
    )
    np.testing.assert_allclose(np.asarray(res.std), np.asarray(scales),
                               rtol=0.25)


def test_gp_hyperposterior_matches_hmc_moments():
    """The GP hyperparameter posterior: ADVI's mean must sit inside the
    HMC posterior's credible region (mean-field VI may under-cover the
    variance — that is the known ADVI bias, not a bug)."""
    rng = np.random.default_rng(0)
    n = 48
    X = jnp.asarray(np.linspace(0, 6, n)[:, None].astype(np.float32))
    Y = jnp.asarray(
        (np.sin(np.asarray(X[:, 0]) * 1.5)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)[:, None]
    )
    kernel = gpr_tpu.Gaussian(jnp.float32(1.0), jnp.float32(1.0))
    logp = hmc.make_gp_log_posterior(kernel, X, Y, sigma=0.1)

    z0 = jnp.zeros(2, jnp.float32)
    vres = advi.fit_advi(logp, z0, jax.random.PRNGKey(2), num_steps=500,
                         num_samples=8)
    cfg = hmc.HMCConfig(num_warmup=200, num_samples=300, num_leapfrog=8)
    hres = hmc.sample_hmc(logp, jnp.zeros((4, 2), jnp.float32),
                          jax.random.PRNGKey(3), cfg)
    flat = np.asarray(hres.samples).reshape(-1, 2)
    h_mean, h_std = flat.mean(0), flat.std(0)
    v_mean = np.asarray(vres.mean)
    assert np.all(np.abs(v_mean - h_mean) < 2.5 * h_std + 0.1), (
        v_mean, h_mean, h_std,
    )
    # q draws feed the predictive path (Bayesian model averaging)
    from gpr_tpu.inference.predictive import predictive

    draws = np.exp(np.asarray(vres.sample(jax.random.PRNGKey(4), 16)))
    pred = predictive(kernel, jnp.asarray(draws), X, Y, X[:5], sigma=0.1)
    assert np.all(np.isfinite(np.asarray(pred.mean)))
    assert np.all(np.asarray(pred.variance) > 0)


def test_result_sampler_shapes():
    res = advi.ADVIResult(
        mean=jnp.zeros(3), std=jnp.ones(3), elbo=jnp.float32(0),
        elbo_trace=jnp.zeros(5),
    )
    s = res.sample(jax.random.PRNGKey(0), 7)
    assert s.shape == (7, 3)
