"""Warping tests: constant-shift exactness, identity field, magnitudes,
diff images — the rebuild of the reference's ITK warping stack
(itkUtils.h:1098-1180)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpr_tpu.pipeline import imageio
from gpr_tpu.pipeline.warp import (
    diff_image,
    displacement_magnitude,
    warp_array,
    warp_image,
)


class TestWarpArray:
    def test_identity_field(self):
        rng = np.random.default_rng(0)
        img = rng.standard_normal((4, 5, 6))
        df = np.zeros((4, 5, 6, 3))
        out = np.asarray(warp_array(jnp.asarray(img), jnp.asarray(df)))
        np.testing.assert_allclose(out, img, atol=1e-12)

    def test_integer_shift_in_x(self):
        """d = (+2, 0, 0): output(x) = input(x + 2) exactly at order 1."""
        img = np.arange(5 * 5 * 8, dtype=np.float64).reshape(5, 5, 8)
        df = np.zeros((5, 5, 8, 3))
        df[..., 0] = 2.0  # dx
        out = np.asarray(warp_array(jnp.asarray(img), jnp.asarray(df)))
        np.testing.assert_allclose(out[..., :6], img[..., 2:], atol=1e-10)

    def test_spacing_scales_displacement(self):
        """Physical displacement 3.0 with spacing 1.5 = 2 voxels."""
        img = np.arange(3 * 3 * 6, dtype=np.float64).reshape(3, 3, 6)
        df = np.zeros((3, 3, 6, 3))
        df[..., 0] = 3.0
        out = np.asarray(
            warp_array(jnp.asarray(img), jnp.asarray(df), spacing=(1.5, 1.0, 1.0))
        )
        np.testing.assert_allclose(out[..., :4], img[..., 2:], atol=1e-10)

    def test_subvoxel_is_linear_interp(self):
        img = np.zeros((1, 1, 4))
        img[0, 0] = [0.0, 1.0, 2.0, 3.0]
        df = np.zeros((1, 1, 4, 3))
        df[..., 0] = 0.5
        out = np.asarray(warp_array(jnp.asarray(img), jnp.asarray(df)))
        np.testing.assert_allclose(out[0, 0, :3], [0.5, 1.5, 2.5], atol=1e-12)

    def test_2d(self):
        img = np.arange(16, dtype=np.float64).reshape(4, 4)
        df = np.zeros((4, 4, 2))
        df[..., 1] = 1.0  # dy
        out = np.asarray(warp_array(jnp.asarray(img), jnp.asarray(df)))
        np.testing.assert_allclose(out[:3], img[1:], atol=1e-10)


class TestCubicBSpline:
    """Order-3 warping — the reference's DEFAULT interpolator
    (itkUtils.h:1098-1158, BSplineInterpolateImageFunction at :1139-1146).
    Goldens: scipy.ndimage with the same mirror boundary contract."""

    def test_matches_scipy_order3(self):
        from scipy import ndimage as ndi

        rng = np.random.default_rng(3)
        img = rng.standard_normal((6, 7, 8))
        df = rng.uniform(-1.5, 1.5, size=(6, 7, 8, 3))
        out = np.asarray(
            warp_array(jnp.asarray(img), jnp.asarray(df), order=3)
        )
        grid = np.meshgrid(*[np.arange(s) for s in img.shape], indexing="ij")
        coords = np.stack(
            [grid[ax] + df[..., 2 - ax] for ax in range(3)]
        )
        ref = ndi.map_coordinates(img, coords, order=3, mode="mirror")
        np.testing.assert_allclose(out, ref, atol=1e-12)

    def test_interpolates_samples_exactly(self):
        # a cubic B-spline INTERPOLATES: integer coordinates reproduce the
        # samples exactly (the prefilter is what makes this true)
        rng = np.random.default_rng(4)
        img = rng.standard_normal((5, 6, 7))
        df = np.zeros((5, 6, 7, 3))
        out = np.asarray(
            warp_array(jnp.asarray(img), jnp.asarray(df), order=3)
        )
        np.testing.assert_allclose(out, img, atol=1e-10)

    def test_spline_filter_matches_scipy(self):
        from scipy import ndimage as ndi

        from gpr_tpu.pipeline.bspline import spline_filter

        rng = np.random.default_rng(5)
        for shape in [(2,), (9,), (33,), (7, 12), (5, 6, 7)]:
            a = rng.standard_normal(shape)
            ours = np.asarray(spline_filter(jnp.asarray(a)))
            ref = ndi.spline_filter(a, order=3, mode="mirror")
            np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)

    def test_smooth_field_beats_trilinear(self):
        # the round-4 gap this closes: on a smooth image under a smooth
        # field, cubic warping must be materially closer to the analytic
        # ground truth than trilinear
        z, y, x = np.meshgrid(
            np.linspace(0, 1, 12), np.linspace(0, 1, 13),
            np.linspace(0, 1, 14), indexing="ij",
        )
        img = np.sin(4 * x) * np.cos(3 * y) + np.sin(2 * z)
        df = np.zeros(img.shape + (3,))
        df[..., 0] = 0.4  # subvoxel x shift
        analytic = np.sin(4 * (x + 0.4 / 13)) * np.cos(3 * y) + np.sin(2 * z)
        w1 = np.asarray(warp_array(jnp.asarray(img), jnp.asarray(df), order=1))
        w3 = np.asarray(warp_array(jnp.asarray(img), jnp.asarray(df), order=3))
        # the mirror-extension bias decays over ~3-4 voxels (the analytic
        # field is not mirror-periodic); compare away from that ring
        interior = (slice(4, -4),) * 3
        e1 = np.abs(w1 - analytic)[interior].max()
        e3 = np.abs(w3 - analytic)[interior].max()
        assert e3 < 0.2 * e1, (e1, e3)

    def test_warp_image_defaults_to_cubic(self):
        from scipy import ndimage as ndi

        rng = np.random.default_rng(6)
        data = rng.standard_normal((5, 5, 5))
        img = imageio.Image(data, (1, 1, 1), (0, 0, 0))
        df_data = rng.uniform(-0.8, 0.8, size=(5, 5, 5, 3))
        df = imageio.Image(df_data, (1, 1, 1), (0, 0, 0), ncomponents=3)
        warped = warp_image(img, df)
        grid = np.meshgrid(*[np.arange(5)] * 3, indexing="ij")
        coords = np.stack(
            [grid[ax] + df_data[..., 2 - ax] for ax in range(3)]
        )
        ref = ndi.map_coordinates(data, coords, order=3, mode="mirror")
        np.testing.assert_allclose(warped.data, ref, atol=1e-12)


class TestWarpImage:
    def test_roundtrip_through_codecs(self, tmp_path):
        rng = np.random.default_rng(1)
        img = imageio.Image(rng.standard_normal((4, 4, 4)), (1, 1, 1), (0, 0, 0))
        df_data = np.zeros((4, 4, 4, 3))
        df_data[..., 2] = 1.0  # dz: one slice shift
        df = imageio.Image(df_data, (1, 1, 1), (0, 0, 0), ncomponents=3)
        warped = warp_image(img, df)
        np.testing.assert_allclose(
            warped.data[:3], np.asarray(img.data)[1:], atol=1e-10
        )

    def test_scalar_field_rejected(self):
        img = imageio.Image(np.zeros((2, 2, 2)), (1, 1, 1), (0, 0, 0))
        with pytest.raises(ValueError):
            warp_image(img, img)


class TestDiffAndMagnitude:
    def test_magnitude(self):
        df = imageio.Image(
            np.full((2, 2, 2, 3), 2.0), (1, 1, 1), (0, 0, 0), ncomponents=3
        )
        np.testing.assert_allclose(
            displacement_magnitude(df), np.full((2, 2, 2), 2 * np.sqrt(3))
        )

    def test_diff_image_and_save_option(self, tmp_path):
        from gpr_tpu.apps import validate

        gt_dir = tmp_path / "gt"
        pr_dir = tmp_path / "pr"
        diff_dir = tmp_path / "diff"
        gt_dir.mkdir(), pr_dir.mkdir()
        rng = np.random.default_rng(2)
        for i in range(2):
            g = rng.standard_normal((2, 3, 4, 3))
            imageio.write_image(
                imageio.Image(g, (1, 1, 1), (0, 0, 0), ncomponents=3),
                str(gt_dir / f"g{i}.vtk"),
            )
            imageio.write_image(
                imageio.Image(g + 0.5, (1, 1, 1), (0, 0, 0), ncomponents=3),
                str(pr_dir / f"p{i}.vtk"),
            )
        validate.dvf_error(str(gt_dir), str(pr_dir), diff_dir=str(diff_dir))
        d0 = imageio.read_image(str(diff_dir / "diff_000.mha"))
        np.testing.assert_allclose(d0.data, -0.5 * np.ones((2, 3, 4, 3)), atol=1e-12)


def test_dvf_error_with_voi_mask(tmp_path):
    """Masked validation (reference validation_dvf.py --mask: only voxels
    inside the VOI contribute to the statistics)."""
    from gpr_tpu.apps import validate

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pr"
    gt_dir.mkdir(), pr_dir.mkdir()
    shape = (3, 4, 5)
    gt = np.zeros(shape + (3,))
    pred = gt.copy()
    # error 1.0 outside the mask, 0.25 inside
    pred[..., 0] += 1.0
    pred[1:3, 1:3, 1:3, 0] = gt[1:3, 1:3, 1:3, 0] + 0.25
    mask = np.zeros(shape)
    mask[1:3, 1:3, 1:3] = 1.0
    imageio.write_image(
        imageio.Image(gt, (1, 1, 1), (0, 0, 0), ncomponents=3),
        str(gt_dir / "g0.vtk"),
    )
    imageio.write_image(
        imageio.Image(pred, (1, 1, 1), (0, 0, 0), ncomponents=3),
        str(pr_dir / "p0.vtk"),
    )
    mask_path = str(tmp_path / "mask.mha")
    imageio.write_image(imageio.Image(mask, (1, 1, 1), (0, 0, 0)), mask_path)

    unmasked = validate.dvf_error(str(gt_dir), str(pr_dir))
    masked = validate.dvf_error(str(gt_dir), str(pr_dir), mask_path=mask_path)
    assert abs(masked["percentiles"][99] - 0.25) < 1e-9
    assert unmasked["percentiles"][99] > 0.9
