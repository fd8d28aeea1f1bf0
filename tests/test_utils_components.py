"""Tests for the L1 utility components: general kernel, FFT period
estimation, prior grid sampling, validation metrics, log utils.

Mirrors the reference's HighlyGeneralKernelTest + the LikelihoodUtils /
PriorUtils semantics."""

import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

import gpr_tpu
from gpr_tpu.kernels.utils import get_general_kernel
from gpr_tpu.inference.period import get_local_period_length, periodic_b_from_period
from gpr_tpu.inference.prior_utils import get_samples
from gpr_tpu.inference import priors
from gpr_tpu.apps import validate
from gpr_tpu.pipeline import imageio
from gpr_tpu.utils.logutils import write_to_log_file, get_current_date_time


class TestGeneralKernel:
    PARAMS = [1.0, 2.0, 1.5, 3.0, 0.8, 0.5, 1.2, 0.9, 2.5, 1.1, 0.7, 4.0, 0.3]

    def test_structure_and_value(self):
        """Gauss + Gauss*Periodic + RQ + (Gauss + White), parameter order per
        reference KernelUtils.h:73-84."""
        p = self.PARAMS
        k = get_general_kernel(p)
        x, y = jnp.asarray([0.3]), jnp.asarray([1.1])
        r2 = float(jnp.sum((x - y) ** 2))
        k1 = p[0] ** 2 * math.exp(-0.5 * r2 / p[1] ** 2)
        k2 = (
            p[2] ** 2
            * math.exp(-0.5 * r2 / p[3] ** 2)
            * (p[4] ** 2 * math.exp(-0.5 * math.sin(p[5] * (0.3 - 1.1)) ** 2 / p[6] ** 2))
        )
        k3 = p[7] ** 2 * (1 + 0.5 * r2 / (p[8] ** 2 * p[9])) ** (-p[9])
        k4 = p[10] ** 2 * math.exp(-0.5 * r2 / p[11] ** 2)  # white term is 0 at x!=y
        expected = k1 + k2 + k3 + k4
        np.testing.assert_allclose(float(k(x, y)), expected, rtol=1e-12)

    def test_wrong_arity(self):
        with pytest.raises(ValueError):
            get_general_kernel([1.0] * 12)

    def test_dsl_roundtrip(self):
        k = get_general_kernel(self.PARAMS)
        s = gpr_tpu.kernel_to_string(k)
        k2 = gpr_tpu.parse_kernel(s)
        assert k == k2

    def test_regression_quality(self):
        """The general kernel must fit a sinus + trend signal (semantics of
        reference tests/HighlyGeneralKernelTest.cpp)."""
        rng = np.random.default_rng(0)
        X = np.linspace(0, 10, 60)
        Y = X + 10 * np.sin(X) + 0.05 * rng.standard_normal(60)
        k = get_general_kernel([1, 3, 1, 3, 1, 1, 1, 1, 2, 1, 0.5, 5, 0.1])
        gp = gpr_tpu.fit(k, X, Y, sigma=0.1)
        pred = np.asarray(gp.predict(X)).ravel()
        assert np.mean(np.abs(pred - Y)) < 0.2


class TestPeriodEstimation:
    def test_pure_sinusoid(self):
        """Exact period recovery on a bin-aligned sinusoid
        (reference LikelihoodUtils.h:31-75)."""
        n, cycles = 256, 8
        t = np.arange(n)
        sig = 3.0 * np.sin(2 * np.pi * cycles * t / n)
        period, amp, likeness = get_local_period_length(sig)
        assert float(period) == n / cycles
        np.testing.assert_allclose(float(amp), 3.0, rtol=1e-5)
        assert float(likeness) > 10.0  # dominated by one frequency

    def test_omit_skips_drift(self):
        """A slow linear drift dominates the low bins; omit must skip it."""
        n = 256
        t = np.arange(n)
        sig = 0.05 * t + 2.0 * np.sin(2 * np.pi * 16 * t / n)
        period, _, _ = get_local_period_length(sig, omit=4)
        assert float(period) == n / 16

    def test_short_signal_raises(self):
        with pytest.raises(ValueError):
            get_local_period_length(np.zeros(4), omit=1)

    def test_b_conversion(self):
        b = float(periodic_b_from_period(16.0))
        np.testing.assert_allclose(b, math.pi / 16.0)

    def test_noise_has_low_sinus_likeness(self):
        rng = np.random.default_rng(1)
        _, _, likeness = get_local_period_length(rng.standard_normal(256))
        assert float(likeness) < 1.0


class TestPriorSampling:
    def test_gaussian_grid(self):
        """Mode first; all samples within mode +- std
        (reference PriorUtils.h:33-58)."""
        d = priors.GaussianDensity(5.0, 2.0)
        s = get_samples(d, 50)
        assert s[0] == 5.0
        std = math.sqrt(float(d.variance()))
        assert all(5.0 - std - 1e-6 <= v <= 5.0 + std + 1e-6 for v in s[1:])
        assert len(s) > 10  # a Gaussian has ~68% mass inside +-1 std

    def test_zero_points(self):
        d = priors.GaussianDensity(1.0, 1.0)
        assert get_samples(d, 0) == [1.0]


class TestValidate:
    def test_dvf_percentiles(self, tmp_path):
        gt_dir = tmp_path / "gt"
        pr_dir = tmp_path / "pred"
        gt_dir.mkdir()
        pr_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(4):
            gt = rng.standard_normal((3, 4, 5, 3))
            pred = gt + 0.1  # constant offset -> error sqrt(3)*0.1 everywhere
            imageio.write_image(
                imageio.Image(gt, (1, 1, 1), (0, 0, 0), ncomponents=3),
                str(gt_dir / f"df{i:05d}.vtk"),
            )
            imageio.write_image(
                imageio.Image(pred, (1, 1, 1), (0, 0, 0), ncomponents=3),
                str(pr_dir / f"dfPred{i:05d}.vtk"),
            )
        stats = validate.dvf_error(str(gt_dir), str(pr_dir))
        for p, v in stats["percentiles"].items():
            np.testing.assert_allclose(v, math.sqrt(3) * 0.1, rtol=1e-6)

    def test_comptime(self, tmp_path):
        prefix = str(tmp_path / "gpr")
        with open(prefix + "-latestInferenceTime.txt", "w") as f:
            f.write("0.001,0.002,0.003,")
        with open(prefix + "-latestCompTimePCA.txt", "w") as f:
            f.write("0.01,0.01,0.01,")
        stats = validate.comp_time(prefix)
        np.testing.assert_allclose(stats["mean"], 0.012, rtol=1e-9)
        np.testing.assert_allclose(stats["max"], 0.013, rtol=1e-9)


class TestLogUtils:
    def test_append_dated_file(self, tmp_path):
        prefix = str(tmp_path / "app-log_")
        write_to_log_file(prefix, "hello")
        write_to_log_file(prefix, "world")
        path = prefix + get_current_date_time("date") + ".txt"
        assert open(path).read() == "hello\nworld\n"
