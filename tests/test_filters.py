"""pipeline.filters vs scipy goldens + reference-semantics checks.

Covers the itkUtils.h filter families (VERDICT r1 missing #2): smoothing,
pyramids, median, histogram matching, threshold/crop/rescale/invert/shrink,
mean/variance.  Reference: include/itkUtils.h (cited per function in
gpr_tpu/pipeline/filters.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.pipeline import filters as F

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def _img(shape=(32, 40), seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestGaussianSmoothing:
    def test_matches_scipy(self):
        img = _img()
        out = np.asarray(F.gaussian_smoothing(jnp.asarray(img), variance=2.25))
        ref = scipy_ndimage.gaussian_filter(
            img, sigma=1.5, mode="nearest", truncate=4.0
        )
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_series_axes(self):
        series = _img((5, 16, 16), seed=1)
        out = np.asarray(
            F.gaussian_smoothing(jnp.asarray(series), variance=1.0, axes=(1, 2))
        )
        # slice-wise blur must equal per-slice 2D blur
        ref = np.stack(
            [
                scipy_ndimage.gaussian_filter(s, sigma=1.0, mode="nearest", truncate=4.0)
                for s in series
            ]
        )
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_spacing_scales_kernel(self):
        img = _img()
        fine = np.asarray(F.gaussian_smoothing(jnp.asarray(img), 4.0, spacing=[2.0, 2.0]))
        ref = np.asarray(F.gaussian_smoothing(jnp.asarray(img), 1.0))
        np.testing.assert_allclose(fine, ref, atol=1e-5)

    def test_jittable(self):
        img = jnp.asarray(_img())
        f = jax.jit(lambda x: F.gaussian_smoothing(x, 1.0))
        np.testing.assert_allclose(
            np.asarray(f(img)), np.asarray(F.gaussian_smoothing(img, 1.0)), atol=1e-6
        )


class TestMedianAndMean:
    @pytest.mark.parametrize("radius", [1, 2])
    def test_median_matches_scipy(self, radius):
        img = _img((21, 17), seed=2)
        out = np.asarray(F.median_filter(jnp.asarray(img), radius))
        ref = scipy_ndimage.median_filter(img, size=2 * radius + 1, mode="nearest")
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_median_radius0_identity(self):
        img = jnp.asarray(_img())
        assert F.median_filter(img, 0) is img  # reference returns input unchanged

    def test_median_3d(self):
        img = _img((7, 9, 8), seed=3)
        out = np.asarray(F.median_filter(jnp.asarray(img), 1))
        ref = scipy_ndimage.median_filter(img, size=3, mode="nearest")
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_mean_matches_scipy(self):
        img = _img((19, 23), seed=4)
        out = np.asarray(F.mean_filter(jnp.asarray(img), 2))
        ref = scipy_ndimage.uniform_filter(img, size=5, mode="nearest")
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_variance_nonnegative_when_mean_consistent(self):
        img = jnp.asarray(_img((24, 24), seed=5))
        mean = F.gaussian_smoothing(img, 2.0)
        var = F.image_variance(img, 2.0, mean)
        assert float(jnp.min(var)) > -1e-4  # G(I^2) - G(I)^2 >= 0 up to rounding


class TestPyramids:
    def test_schedule(self):
        assert F.pyramid_schedule(3) == [4, 2, 1]

    def test_levels_shapes_and_order(self):
        img = jnp.asarray(_img((64, 48), seed=6))
        levels = F.image_pyramid(img, 3)
        assert [l.shape for l in levels] == [(16, 12), (32, 24), (64, 48)]
        # finest level is the input itself
        np.testing.assert_array_equal(np.asarray(levels[-1]), np.asarray(img))

    def test_coarse_level_is_smoothed_decimation(self):
        img = jnp.asarray(_img((32, 32), seed=7))
        levels = F.image_pyramid(img, 2)
        ref = np.asarray(F.gaussian_smoothing(img, 1.0))[::2, ::2]
        np.testing.assert_allclose(np.asarray(levels[0]), ref, atol=1e-6)

    def test_series_preserves_time_axis(self):
        series = jnp.asarray(_img((5, 32, 32), seed=8))
        levels = F.image_pyramid_series(series, 3)
        assert [l.shape for l in levels] == [(5, 8, 8), (5, 16, 16), (5, 32, 32)]

    def test_target_image_from_series(self):
        series = np.zeros((4, 8, 8), np.float32)
        series[0] += 0.0
        series[1] += 1.0
        series[2] += 2.0
        series[3] += 9.0  # overall mean 3.0 -> slice 2 closest
        tiled, idx = F.get_target_image_from_series(jnp.asarray(series))
        assert int(idx) == 2
        np.testing.assert_array_equal(
            np.asarray(tiled), np.broadcast_to(series[2], series.shape)
        )

    def test_shuffle_scatters(self):
        series = jnp.asarray(_img((4, 3, 3), seed=9))
        out = np.asarray(F.shuffle_image_data(series, [2, 0, 3, 1]))
        np.testing.assert_array_equal(out[2], np.asarray(series[0]))
        np.testing.assert_array_equal(out[0], np.asarray(series[1]))
        np.testing.assert_array_equal(out[1], np.asarray(series[3]))


class TestHistogramMatching:
    def test_quantiles_move_to_reference(self):
        rng = np.random.default_rng(10)
        src = rng.normal(0.0, 1.0, (64, 64)).astype(np.float32)
        ref = rng.normal(10.0, 3.0, (64, 64)).astype(np.float32)
        out = np.asarray(F.histogram_matching(jnp.asarray(src), jnp.asarray(ref)))
        for q in (0.25, 0.5, 0.75):
            assert abs(np.quantile(out, q) - np.quantile(ref, q)) < 0.5
        # order preserved (monotone mapping)
        flat_src = src.reshape(-1)
        flat_out = out.reshape(-1)
        order = np.argsort(flat_src)
        assert np.all(np.diff(flat_out[order]) > -1e-5)


class TestPointwise:
    def test_threshold_below(self):
        img = jnp.asarray(np.array([[-1.0, 0.5], [2.0, 0.1]], np.float32))
        out = np.asarray(F.threshold_below(img, 0.2))
        np.testing.assert_array_equal(out, [[0.0, 0.5], [2.0, 0.0]])

    def test_threshold_window_clamps_to_data_values(self):
        """Reference itkUtils.h:975-1041: values above thresh_max become the
        LARGEST value below it; values below thresh_min become the SMALLEST
        value above it."""
        img = jnp.asarray(np.array([0.0, 1.0, 2.0, 5.0, 9.0], np.float32))
        out = np.asarray(F.threshold_window(img, thresh_max=6.0, thresh_min=0.5))
        np.testing.assert_array_equal(out, [1.0, 1.0, 2.0, 5.0, 5.0])

    def test_rescale(self):
        img = jnp.asarray(_img(seed=11))
        out = F.rescale_intensity(img, 0.0, 255.0)
        assert abs(float(jnp.min(out))) < 1e-4
        assert abs(float(jnp.max(out)) - 255.0) < 1e-3

    def test_shrink(self):
        img = jnp.asarray(_img((12, 16), seed=12))
        out = F.shrink_image(img, factor_x=4, factor_y=2)
        assert out.shape == (6, 4)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(img)[0::2, 1::4]
        )

    def test_invert(self):
        img = jnp.asarray(_img(seed=13))
        out = F.invert_image(img)
        np.testing.assert_allclose(
            np.asarray(out), float(jnp.max(img)) - np.asarray(img), atol=1e-6
        )

    def test_round_normalize_arith(self):
        img = jnp.asarray(_img(seed=14))
        assert float(jnp.mean(F.normalize_image(img))) == pytest.approx(0.0, abs=1e-6)
        assert float(jnp.std(F.normalize_image(img))) == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_array_equal(
            np.asarray(F.round_image(jnp.asarray([0.4, 1.6]))), [0.0, 2.0]
        )
        a, b = jnp.asarray([2.0, -1.0]), jnp.asarray([0.5, 3.0])
        np.testing.assert_array_equal(np.asarray(F.multiply_images(a, b)), [1.0, -3.0])
        np.testing.assert_array_equal(np.asarray(F.subtract_images(a, b)), [1.5, -4.0])
        np.testing.assert_array_equal(np.asarray(F.multiply_constant(a, 3.0)), [6.0, -3.0])
        np.testing.assert_array_equal(np.asarray(F.abs_difference(a, b)), [1.5, 4.0])
        assert float(F.accumulate_image(a)) == 1.0
