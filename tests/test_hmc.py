"""HMC tests: correctness on analytic targets, GP hyperparameter posteriors
vs MAP point estimates (reference MaximumAPosterioriTest semantics), and
multi-device chain sharding with psum'd adaptation (8 virtual CPU devices).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpr_tpu as gt
from gpr_tpu.inference import hmc as hm
from gpr_tpu.inference import priors as pr
from gpr_tpu.inference.optimize import fit_map
from gpr_tpu.parallel import sharded_hmc as sh


def test_hmc_standard_normal():
    """HMC recovers moments of an analytic Gaussian target."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sd = jnp.asarray([0.5, 1.5, 1.0])

    def logp(z):
        return -0.5 * jnp.sum(((z - mu) / sd) ** 2)

    cfg = hm.HMCConfig(num_warmup=300, num_samples=600, num_leapfrog=8)
    z0 = jnp.zeros((4, 3))
    res = hm.sample_hmc(logp, z0, jax.random.PRNGKey(0), cfg)
    flat = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(flat.std(0), np.asarray(sd), atol=0.2)
    # acceptance near the 0.8 target
    assert 0.5 < float(np.mean(np.asarray(res.accept_rate))) <= 1.0
    # diagnostics behave
    rhat = np.asarray(hm.split_rhat(res.samples))
    assert np.all(rhat < 1.1), rhat
    ess = np.asarray(hm.effective_sample_size(res.samples))
    assert np.all(ess > 100), ess


@pytest.mark.slow
def test_hmc_gp_posterior_mode_matches_map(rng):
    """The HMC posterior over GP hyperparameters concentrates near the MAP
    point estimate (the reference's MaximumAPosterioriTest recovers its
    parameters by Gauss-Newton; here the full posterior must agree within
    Monte-Carlo error — BASELINE.json north-star check)."""
    n = 12
    xs = np.arange(n) * 2 * math.pi / n
    X, Y = xs[:, None], (np.sin(xs) + 0.05 * rng.standard_normal(n))[:, None]
    sigma = 0.1
    priors = [
        pr.LogGaussianDensity.from_mode_and_variance(2.0, 1.0),
        pr.LogGaussianDensity.from_mode_and_variance(1.0, 0.5),
    ]
    kernel = gt.Gaussian(1.5, 1.0)

    kmap, _ = fit_map(kernel, X, Y, sigma, priors, iterations=400, learning_rate=0.02)
    map_params = np.array([float(p) for p in kmap.params])

    logp = hm.make_gp_log_posterior(kernel, X, Y, sigma, priors)
    z0 = jnp.log(jnp.asarray([[1.5, 1.0]] * 4)) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (4, 2)
    )
    cfg = hm.HMCConfig(num_warmup=300, num_samples=400, num_leapfrog=12)
    res = hm.sample_hmc(logp, z0, jax.random.PRNGKey(2), cfg)
    summ = hm.posterior_summary(res.samples)
    post_mean = np.asarray(summ["mean"])
    post_std = np.asarray(summ["std"])
    # MAP lies within ~2.5 posterior std of the posterior mean
    assert np.all(np.abs(post_mean - map_params) < 2.5 * post_std + 0.3), (
        post_mean,
        post_std,
        map_params,
    )
    assert np.all(np.asarray(summ["rhat"]) < 1.2)


def test_sharded_hmc_runs_on_mesh():
    """Chains sharded over the 8-device CPU mesh; psum'd adaptation gives
    every device the same step size; moments match the target."""
    mu = jnp.asarray([0.5, -1.0])
    sd = jnp.asarray([1.0, 0.7])

    def logp(z):
        return -0.5 * jnp.sum(((z - mu) / sd) ** 2)

    mesh = sh.default_mesh()
    assert mesh.devices.size == 8
    cfg = hm.HMCConfig(num_warmup=200, num_samples=300, num_leapfrog=8)
    z0 = jnp.zeros((16, 2))  # 2 chains per device
    res = sh.sample_hmc_sharded(logp, z0, jax.random.PRNGKey(0), cfg, mesh=mesh)
    assert res.samples.shape == (16, 300, 2)
    flat = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(flat.std(0), np.asarray(sd), atol=0.2)
    assert float(res.step_size) > 0


def test_sharded_chain_count_must_divide():
    def logp(z):
        return -0.5 * jnp.sum(z**2)

    with pytest.raises(ValueError):
        sh.sample_hmc_sharded(logp, jnp.zeros((3, 2)), jax.random.PRNGKey(0))


def test_scaling_efficiency_helper():
    eff = sh.chain_scaling_efficiency({1: 100.0, 2: 180.0, 4: 300.0})
    assert abs(eff[2] - 0.9) < 1e-12
    assert abs(eff[4] - 0.75) < 1e-12


def test_scaling_harness_writes_artifact(tmp_path, monkeypatch):
    """benchmarks/bench_scaling.py (VERDICT r4 item 4): the multi-host
    efficiency harness runs on the suite's 8-virtual-device mesh and
    emits the {devices, samples_per_s, efficiency} rows + SCALING.json —
    ready to produce the BASELINE '>= 80% linear 1 -> 2 hosts' figure
    the day real multi-chip hardware exists."""
    import json
    import os
    import runpy
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "benchmarks", "bench_scaling.py")
    monkeypatch.setenv("GPR_SCALING_T", "8")
    monkeypatch.setenv("GPR_SCALING_CHUNK", "8")
    out = str(tmp_path / "SCALING.json")
    monkeypatch.setenv("GPR_SCALING_OUT", out)
    monkeypatch.setattr(sys, "argv", [script, "2", "32"])
    # redirect the artifact into the tmpdir (bench_scaling writes to its
    # repo-root constant; patch after import via module dict)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    cwd = os.getcwd()
    try:
        with redirect_stdout(buf):
            runpy.run_path(script, run_name="__main__")
    finally:
        os.chdir(cwd)
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]
    rows = [l for l in lines if "devices" in l]
    assert {r["devices"] for r in rows} == {1, 2, 4, 8}
    assert all(r["samples_per_s"] > 0 for r in rows)
    assert abs(rows[0]["efficiency"] - 1.0) < 1e-9
    assert os.path.exists(out)
    with open(out) as f:
        summary = json.load(f)
    assert len(summary["rows"]) == 4
    assert set(summary["efficiency_vs_linear"]) == {"2", "4", "8"}


class TestCheckpointResume:
    """Chain checkpoint/resume (SURVEY.md §5.3 rebuild contract)."""

    def test_roundtrip_and_resume(self, tmp_path):
        logp = lambda z: -0.5 * jnp.sum(z * z)
        res = hm.sample_hmc(
            logp, np.zeros((2, 2)), jax.random.PRNGKey(0),
            hm.HMCConfig(num_warmup=150, num_samples=150),
        )
        path = str(tmp_path / "chains.npz")
        hm.save_chain_checkpoint(path, res)
        loaded, states = hm.load_chain_checkpoint(path)
        np.testing.assert_array_equal(
            np.asarray(loaded.samples), np.asarray(res.samples)
        )
        assert float(loaded.step_size) == float(res.step_size)

        res2 = hm.resume_hmc(logp, path, jax.random.PRNGKey(1), 200)
        s = np.asarray(res2.samples).reshape(-1, 2)
        # resumed chains sample the same standard normal without re-warmup
        np.testing.assert_allclose(s.std(0), [1.0, 1.0], atol=0.25)
        np.testing.assert_allclose(s.mean(0), [0.0, 0.0], atol=0.25)


class TestProfiling:
    def test_stage_timer_csv(self, tmp_path):
        from gpr_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("gram"):
            pass
        with t.stage("chol"):
            pass
        assert set(t.totals()) == {"gram", "chol"}
        path = str(tmp_path / "times.txt")
        t.write(path)
        assert open(path).read().count(",") == 2


class TestWindowedWarmup:
    def test_metric_recovery_on_hard_target(self):
        """Expanding-window adaptation recovers a 160000:1 scale ratio that
        the two-stage scheme underestimates by ~40x."""
        scales = jnp.asarray([0.05, 20.0])
        logp = lambda z: -0.5 * jnp.sum((z / scales) ** 2)
        res = hm.sample_hmc(
            logp, np.zeros((2, 2)), jax.random.PRNGKey(0),
            hm.HMCConfig(num_warmup=400, num_samples=300, windowed_warmup=True),
        )
        im = np.asarray(res.inv_mass)
        true_ratio = float((scales[1] / scales[0]) ** 2)
        assert im[1] / im[0] > true_ratio / 4, im
        s = np.asarray(res.samples).reshape(-1, 2)
        np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.3)

    def test_window_schedule(self):
        head, wins, tail = hm._window_schedule(500)
        assert head == 75 and tail == 50
        assert sum(wins) == 500 - 75 - 50
        assert all(w > 0 for w in wins)
        # doubling-ish growth
        assert wins[-1] >= wins[0]

    def test_default_path_unchanged(self):
        """windowed_warmup=False keeps the original two-stage behavior."""
        logp = lambda z: -0.5 * jnp.sum(z * z)
        r1 = hm.sample_hmc(
            logp, np.zeros((2, 2)), jax.random.PRNGKey(3),
            hm.HMCConfig(num_warmup=100, num_samples=100),
        )
        s = np.asarray(r1.samples).reshape(-1, 2)
        np.testing.assert_allclose(s.std(0), [1, 1], atol=0.3)


def test_sparse_gp_log_posterior_sampling():
    """HMC over SPARSE-GP hyperparameters (Woodbury likelihood in the
    leapfrog gradient) recovers a sensible lengthscale."""
    rng = np.random.default_rng(0)
    X = np.linspace(0, 10, 120)[:, None]
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(120)
    Z = X[::12]
    kernel = gt.Gaussian(1.0, 1.0)
    logp = hm.make_sparse_gp_log_posterior(kernel, Z, X, Y, sigma=0.1, jitter=1e-8)
    res = hm.sample_hmc(
        logp, np.zeros((2, 2)), jax.random.PRNGKey(11),
        hm.HMCConfig(num_warmup=150, num_samples=150, num_leapfrog=8),
    )
    theta = np.exp(np.asarray(res.samples).reshape(-1, 2))
    # posterior lengthscale concentrated in a plausible band for sin(x)
    med = np.median(theta[:, 0])
    assert 0.5 < med < 4.0, med
    assert np.all(np.isfinite(theta))


def test_profiler_trace_writes(tmp_path):
    """jax.profiler trace scope produces a TensorBoard-loadable directory
    (SURVEY.md §5.1 rebuild contract)."""
    from gpr_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace files written"


def test_chunked_sampler_matches_scan():
    """sample_hmc_chunked must reproduce sample_hmc: same key flow, same
    math — every scan is python-unrolled in jitted chunks (the remote-TPU
    compile workaround, BENCHMARKS.md).  The unrolled programs fuse
    differently than the scans, so agreement is to float rounding and only
    over SHORT runs — once a rounding difference flips one Metropolis
    accept, chains decorrelate (equal in distribution, not per-draw).
    Chunk size 3 over 8 samples exercises the remainder program."""
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((16, 2)))
    Y = jnp.asarray(np.sin(np.asarray(X[:, 0])))[:, None]
    logp = hm.make_gp_log_posterior(gt.Gaussian(1.0, 1.0), X, Y, sigma=0.1)
    z0 = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(5)
    cfg = hm.HMCConfig(num_warmup=20, num_samples=8, num_leapfrog=4)

    r_scan = hm.sample_hmc(logp, z0, key, cfg)
    r_chunk = hm.sample_hmc_chunked(logp, z0, key, cfg, chunk_size=3)

    np.testing.assert_allclose(
        np.asarray(r_chunk.samples), np.asarray(r_scan.samples), atol=1e-7
    )
    np.testing.assert_allclose(
        float(r_chunk.step_size), float(r_scan.step_size), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(r_chunk.inv_mass), np.asarray(r_scan.inv_mass), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(r_chunk.accept_rate), np.asarray(r_scan.accept_rate), atol=1e-7
    )
