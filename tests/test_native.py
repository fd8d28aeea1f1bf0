"""Native C++ runtime tests: MatrixIO codec + threaded VTK loader,
cross-validated against the pure-Python implementations (the rebuild's
analogue of the reference's Eigen-vs-LAPACK cross-checks, LAPACKTest.cpp)."""

import os

import numpy as np
import pytest

from gpr_tpu.pipeline import dataparser, imageio
from gpr_tpu.utils import matrixio, native

needs_native = pytest.mark.skipif(
    not (native.available() or native.build()), reason="native lib not buildable"
)


@needs_native
class TestNativeMatrixIO:
    def test_roundtrip_f64(self, tmp_path):
        M = np.random.default_rng(0).standard_normal((40, 9))
        p = str(tmp_path / "m.bin")
        native.write_matrix(M, p)
        np.testing.assert_array_equal(native.read_matrix(p), M)

    def test_cross_python(self, tmp_path):
        """Bytes are identical between codecs (both match the reference's
        lib/MatrixIO.cpp format)."""
        M = np.random.default_rng(1).standard_normal((12, 3))
        p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
        native.write_matrix(M, p1)
        matrixio.write_matrix(M, p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()
        np.testing.assert_array_equal(matrixio.read_matrix(p1), M)
        np.testing.assert_array_equal(native.read_matrix(p2), M)

    def test_f32_inference(self, tmp_path):
        M = np.random.default_rng(2).standard_normal((7, 7)).astype(np.float32)
        p = str(tmp_path / "f.bin")
        matrixio.write_matrix(M, p)
        np.testing.assert_allclose(native.read_matrix(p), M, atol=1e-7)


@needs_native
class TestNativeVtkLoader:
    def test_scalar_images_match_python(self, tmp_path):
        rng = np.random.default_rng(3)
        files = []
        for i in range(6):
            img = rng.integers(0, 255, (5, 7)).astype(np.float64)
            p = str(tmp_path / f"us{i:03d}.vtk")
            imageio.write_image(imageio.Image(img, (1, 1), (0, 0)), p)
            files.append(p)
        M = native.load_vtk_dir(files, scale=1 / 255.0)
        cols = [
            imageio.read_image(f).flatten() / 255.0 for f in files
        ]
        np.testing.assert_allclose(M, np.stack(cols, axis=1), atol=1e-15)

    def test_dvf_match_python(self, tmp_path):
        rng = np.random.default_rng(4)
        files = []
        for i in range(4):
            df = rng.standard_normal((2, 3, 4, 3))
            p = str(tmp_path / f"df{i:03d}.vtk")
            imageio.write_image(
                imageio.Image(df, (1, 1, 1), (0, 0, 0), ncomponents=3), p
            )
            files.append(p)
        M = native.load_vtk_dir(files)
        cols = [imageio.read_image(f).flatten() for f in files]
        np.testing.assert_array_equal(M, np.stack(cols, axis=1))

    def test_dataparser_uses_native(self, tmp_path):
        """parse_image_files must produce identical results whether or not
        the native fast path engages."""
        rng = np.random.default_rng(5)
        files = []
        for i in range(3):
            img = rng.integers(0, 255, (4, 4)).astype(np.float64)
            p = str(tmp_path / f"x{i}.vtk")
            imageio.write_image(imageio.Image(img, (1, 1), (0, 0)), p)
            files.append(p)
        M = dataparser.parse_image_files(files)
        cols = [imageio.read_image(f).flatten() / 255.0 for f in files]
        np.testing.assert_allclose(M, np.stack(cols, axis=1), atol=1e-15)

    def test_geometry_mismatch_errors(self, tmp_path):
        p1 = str(tmp_path / "a.vtk")
        p2 = str(tmp_path / "b.vtk")
        imageio.write_image(imageio.Image(np.zeros((4, 4)), (1, 1), (0, 0)), p1)
        imageio.write_image(imageio.Image(np.zeros((5, 5)), (1, 1), (0, 0)), p2)
        with pytest.raises(IOError):
            native.load_vtk_dir([p1, p2])


@needs_native
class TestNativeMhaLoader:
    def test_mha_match_python(self, tmp_path):
        rng = np.random.default_rng(6)
        files = []
        for i in range(4):
            df = rng.standard_normal((2, 3, 4, 3))
            p = str(tmp_path / f"d{i:03d}.mha")
            imageio.write_image(
                imageio.Image(df, (1, 1, 1), (0, 0, 0), ncomponents=3), p
            )
            files.append(p)
        M = native.load_mha_dir(files)
        cols = [imageio.read_image(f).flatten() for f in files]
        np.testing.assert_array_equal(M, np.stack(cols, axis=1))

    def test_compressed_falls_back(self, tmp_path):
        """Compressed .mha raises from the native path; the DataParser
        dispatch falls back to the Python codec transparently."""
        p = str(tmp_path / "c.mha")
        data = np.random.default_rng(7).standard_normal((2, 2, 2, 3))
        imageio.write_mha(
            imageio.Image(data, (1, 1, 1), (0, 0, 0), ncomponents=3),
            p, compressed=True,
        )
        with pytest.raises(IOError):
            native.load_mha_dir([p])
        M = dataparser.parse_displacement_files([p])
        np.testing.assert_allclose(M[:, 0], data.reshape(-1))

    def test_uchar_mha_scaled(self, tmp_path):
        """uint8 MHA frames through the /255 image path."""
        img = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
        p = str(tmp_path / "u.mha")
        imageio.write_image(imageio.Image(img, (1, 1, 1), (0, 0, 0)), p)
        M = native.load_mha_dir([p], scale=1 / 255.0)
        np.testing.assert_allclose(
            M[:, 0], img.reshape(-1).astype(np.float64) / 255.0
        )
