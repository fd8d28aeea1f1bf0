"""Tests for the analysis tools (modes/convert/plots), drift runner, and
dataset-prep utilities (pair splitting, ROI cropping, blurring)."""

import csv
import os

import numpy as np
import pytest

from gpr_tpu.apps import analysis
from gpr_tpu.data import prep
from gpr_tpu.pipeline import imageio


class TestAnalysis:
    def test_mode_counts(self, tmp_path):
        gpr = tmp_path / "gpr"
        gpr.mkdir()
        np.savetxt(gpr / "gpr-inputCompactness.csv", [0.3, 0.6, 0.9, 1.0])
        np.savetxt(gpr / "gpr-outputCompactness.csv", [0.55, 0.8, 1.0])
        n_in, n_out = analysis.mode_counts(str(gpr), 0.5)
        assert (n_in, n_out) == (1, 0)

    def test_convert_vtk_dir(self, tmp_path):
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        src.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            img = imageio.Image(rng.standard_normal((2, 3, 4)), (1, 1, 1), (0, 0, 0))
            imageio.write_image(img, str(src / f"v{i}.vtk"))
        n = analysis.convert_vtk_dir(str(src), str(dst))
        assert n == 3
        back = imageio.read_image(str(dst / "v0.mha"))
        orig = imageio.read_image(str(src / "v0.vtk"))
        np.testing.assert_allclose(back.data, orig.data)

    def test_feature_trajectories(self, tmp_path):
        F = np.random.default_rng(1).standard_normal((4, 20))
        path = str(tmp_path / "f.csv")
        np.savetxt(path, F, delimiter=",")
        out = str(tmp_path / "f.png")
        stats = analysis.feature_trajectories(path, out)
        assert stats["n_modes"] == 4 and stats["n_frames"] == 20
        assert os.path.exists(out)

    def test_dvf_mean(self, tmp_path):
        d = tmp_path / "dvf"
        d.mkdir()
        for i, scale in enumerate((1.0, 2.0)):
            img = imageio.Image(
                np.full((2, 2, 2, 3), scale), (1, 1, 1), (0, 0, 0), ncomponents=3
            )
            imageio.write_image(img, str(d / f"df{i}.vtk"))
        mags = analysis.dvf_mean_magnitude(str(d))
        np.testing.assert_allclose(mags, [np.sqrt(3), 2 * np.sqrt(3)])


class TestPrep:
    def test_crop_dvf_roi(self, tmp_path):
        """Nonzero bounding box across the series; all-zero master skipped
        (reference preprocess_dvf.py:25-82)."""
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        src.mkdir()
        master = np.zeros((6, 6, 6, 3))
        imageio.write_image(
            imageio.Image(master, (1, 1, 1), (0, 0, 0), ncomponents=3),
            str(src / "a_master.mha"),
        )
        d = np.zeros((6, 6, 6, 3))
        d[2:5, 1:4, 3:6] = 1.0
        imageio.write_image(
            imageio.Image(d, (1, 1, 1), (0, 0, 0), ncomponents=3),
            str(src / "b_field.mha"),
        )
        roi = prep.crop_dvf_roi(str(src), str(dst))
        assert roi == {
            "z_min": 2, "z_max": 4, "y_min": 1, "y_max": 3, "x_min": 3, "x_max": 5,
        }
        cropped = imageio.read_image(str(dst / "b_field.mha"))
        assert cropped.data.shape == (2, 2, 2, 3)  # max index dropped (ref quirk)
        assert os.path.exists(src / "indices_VOI.npy")

    def test_blur_us(self, tmp_path):
        src = tmp_path / "us"
        src.mkdir()
        img = np.zeros((9, 9))
        img[4, 4] = 255.0
        imageio.write_image(imageio.Image(img, (1, 1), (0, 0)), str(src / "f.vtk"))
        dest = prep.blur_us(str(src), sigma=1.0)
        blurred = imageio.read_image(os.path.join(dest, "f.vtk")).data
        assert blurred.max() < 255.0 / 2
        np.testing.assert_allclose(blurred.sum(), 255.0, rtol=1e-6)

    def test_check_synchro(self, tmp_path):
        us, dvf = tmp_path / "us", tmp_path / "dvf"
        us.mkdir(), dvf.mkdir()
        for i in range(6):
            (us / f"u{i}.png").touch()
        for i in range(3):
            (dvf / f"d{i}.vtk").touch()
        assert prep.check_synchro(str(us), str(dvf), factor=2)
        assert not prep.check_synchro(str(us), str(dvf), factor=1)

    def test_create_pairs_mode2(self, tmp_path):
        """Non-AR moco split: CT one-per-US, no CT for test, offset rows
        (reference create_pairs.py:105-125)."""
        root = tmp_path
        pairs = root / "pairs"
        (pairs / "CT").mkdir(parents=True)
        (pairs / "US").mkdir()
        n = 10
        rows = [["ct", "us", "x", "ds"]]
        for i in range(n):
            (pairs / "CT" / f"deformationfield_{i:03d}.mha").touch()
            (pairs / "US" / f"us_{i:05d}.png").touch()
            rows.append([str(i), str(i), "0", "0"])
        with open(pairs / "pairs.csv", "w", newline="") as f:
            csv.writer(f).writerows(rows)

        prep.create_pairs(str(root), split=[4, 2, 3], split_factor=1,
                          offset=1, mode=2)
        us = pairs / "US"
        assert len(os.listdir(us / "train")) == 4
        assert len(os.listdir(us / "validation")) == 2
        assert len(os.listdir(us / "test")) == 3
        assert len(os.listdir(us / "offset")) == 1
        ct = pairs / "CT"
        assert len(os.listdir(ct / "train")) == 4
        assert len(os.listdir(ct / "validation")) == 2
        assert len(os.listdir(ct / "test")) == 0  # no CT for test

    def test_dicom_delegates(self, tmp_path):
        """prep.load_dicom_series is the dicom-module ingestion (reference
        scripts/data/dicom_loader.py:17-60), no longer a gated raise."""
        from gpr_tpu.data import dicom

        src = tmp_path / "in"
        src.mkdir()
        for i in range(4):
            dicom.write_minimal_dicom(str(src / f"f{i}.dcm"), i + 1)
        out = prep.load_dicom_series(str(src), str(tmp_path / "out"), n_slices=2)
        assert len(out) == 4
        assert (tmp_path / "out" / "sorted" / "slice01").is_dir()


class TestCliReturnCodes:
    def test_analysis_modes_cli(self, tmp_path):
        gpr = tmp_path / "gpr"
        gpr.mkdir()
        np.savetxt(gpr / "gpr-inputCompactness.csv", [0.4, 0.8, 1.0])
        np.savetxt(gpr / "gpr-outputCompactness.csv", [0.6, 1.0])
        assert analysis.main(["modes", str(gpr), "--thresh", "0.5"]) == 0

    def test_analysis_unknown_command(self):
        assert analysis.main(["bogus"]) == -1

    def test_validate_unknown_mode(self):
        from gpr_tpu.apps import validate

        assert validate.main(["bogus"]) == -1
        assert validate.main([]) == -1
