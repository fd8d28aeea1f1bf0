"""End-to-end app tests: image I/O codecs, DataParser, learn/predict CLIs.

Mirrors the reference's manual pipeline validation (SURVEY.md §4: the
reference has no automated end-to-end test — we add one): synthetic
"ultrasound" frames drive synthetic DVFs through PCA -> GP -> inverse PCA,
and the predicted displacement fields must recover the ground truth.
"""

import json
import os

import numpy as np
import pytest

from gpr_tpu.pipeline import imageio
from gpr_tpu.pipeline.dataparser import DataParser, read_csv, write_csv


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

class TestImageIO:
    def test_vtk_scalar_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 255, (4, 6, 8)).astype(np.float64)
        img = imageio.Image(data, spacing=(1.5, 2.0, 2.5), origin=(1, 2, 3))
        path = str(tmp_path / "t.vtk")
        imageio.write_vtk(img, path)
        back = imageio.read_vtk(path)
        np.testing.assert_allclose(back.data, data)
        assert back.spacing == (1.5, 2.0, 2.5)
        assert back.origin == (1.0, 2.0, 3.0)

    def test_vtk_vector_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.standard_normal((3, 4, 5, 3))
        img = imageio.Image(data, spacing=(1, 1, 1), origin=(0, 0, 0), ncomponents=3)
        path = str(tmp_path / "df.vtk")
        imageio.write_vtk(img, path)
        back = imageio.read_vtk(path)
        assert back.ncomponents == 3
        np.testing.assert_allclose(back.data, data)

    def test_vtk_ascii(self, tmp_path):
        data = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
        img = imageio.Image(data, spacing=(1, 1, 1), origin=(0, 0, 0))
        path = str(tmp_path / "a.vtk")
        imageio.write_vtk(img, path, binary=False)
        back = imageio.read_vtk(path)
        np.testing.assert_allclose(back.data, data)

    def test_mha_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        data = rng.standard_normal((5, 6, 7)).astype(np.float32)
        img = imageio.Image(data, spacing=(0.5, 0.5, 2.0), origin=(-1, 0, 1))
        path = str(tmp_path / "t.mha")
        imageio.write_mha(img, path)
        back = imageio.read_mha(path)
        np.testing.assert_allclose(back.data, data)
        assert back.spacing == (0.5, 0.5, 2.0)

    def test_mha_compressed_vector(self, tmp_path):
        rng = np.random.default_rng(3)
        data = rng.standard_normal((4, 4, 4, 3)).astype(np.float64)
        img = imageio.Image(data, spacing=(1, 1, 1), origin=(0, 0, 0), ncomponents=3)
        path = str(tmp_path / "c.mha")
        imageio.write_mha(img, path, compressed=True)
        back = imageio.read_mha(path)
        np.testing.assert_allclose(back.data, data)

    def test_png_roundtrip(self, tmp_path):
        data = np.random.default_rng(4).integers(0, 255, (16, 20)).astype(np.uint8)
        img = imageio.Image(data, spacing=(1, 1), origin=(0, 0))
        path = str(tmp_path / "t.png")
        imageio.write_png(img, path)
        back = imageio.read_png(path)
        np.testing.assert_array_equal(back.data, data)

    def test_flatten_is_itk_order(self):
        """C-order flatten = ITK iteration (x fastest, components innermost;
        reference DataParser.h:536-613)."""
        data = np.arange(2 * 3 * 4 * 3).reshape(2, 3, 4, 3)
        img = imageio.Image(data, (1, 1, 1), (0, 0, 0), ncomponents=3)
        flat = img.flatten()
        # voxel (z=0,y=0,x=1), component 0 comes right after voxel (0,0,0)'s
        # three components
        assert flat[3] == data[0, 0, 1, 0]


class TestCsv:
    def test_roundtrip(self, tmp_path):
        M = np.random.default_rng(5).standard_normal((4, 7))
        path = str(tmp_path / "m.csv")
        write_csv(path, M)
        back = read_csv(path)
        np.testing.assert_allclose(back, M, atol=1e-6)  # 6 decimals on disk


# ---------------------------------------------------------------------------
# synthetic end-to-end pipeline
# ---------------------------------------------------------------------------

@pytest.fixture
def synthetic_dataset(tmp_path):
    """Breathing-like dataset: 2-D 'US' frames whose intensity pattern moves
    with a latent phase, and 3-D DVFs whose displacements follow the same
    phase — so the US -> DVF map is learnable."""
    rng = np.random.default_rng(0)
    n_train, n_test = 40, 10
    h = w = 12
    dvf_shape = (4, 5, 6)

    def us_frame(phase):
        yy, xx = np.mgrid[0:h, 0:w]
        img = 127 + 100 * np.sin(2 * np.pi * (yy / h) + phase)
        return np.clip(img + rng.normal(0, 1.0, (h, w)), 0, 255)

    def dvf_frame(phase):
        base = np.stack(
            [
                np.full(dvf_shape, np.sin(phase)),
                np.full(dvf_shape, 0.5 * np.cos(phase)),
                np.full(dvf_shape, 0.25 * np.sin(2 * phase)),
            ],
            axis=-1,
        )
        return base + rng.normal(0, 0.005, base.shape)

    paths = {}
    for split, n, start in (("train", n_train, 0), ("test", n_test, n_train)):
        us_dir = tmp_path / split / "us"
        dvf_dir = tmp_path / split / "dvf"
        us_dir.mkdir(parents=True)
        dvf_dir.mkdir(parents=True)
        phases = 2 * np.pi * np.arange(start, start + n) / 12.0
        for i, ph in enumerate(phases):
            imageio.write_image(
                imageio.Image(us_frame(ph), (1, 1), (0, 0)),
                str(us_dir / f"us{i:05d}.vtk"),
            )
            imageio.write_image(
                imageio.Image(dvf_frame(ph), (1, 1, 1), (0, 0, 0), ncomponents=3),
                str(dvf_dir / f"df{i:05d}.vtk"),
            )
        paths[split] = (str(us_dir), str(dvf_dir))
    paths["phases_test"] = 2 * np.pi * np.arange(n_train, n_train + n_test) / 12.0
    return tmp_path, paths


CONFIG_MODEL = {
    "perform_ar": False,
    "n_inputModes": 5,
    "n_outputModes": 4,
    "ar_n": 1,
    "ar_p": 2,
    "kernel_string": "GaussianKernel(2, 1,)",
    "data_noise": 0.01,
}
CONFIG_LEARN = {"use_precomputed": False, "n_trainImgs": 0, "start_trainInd": 0}
CONFIG_PREDICT = {"use_precomputed": False, "compute_groundtruth_features": True}


class TestEndToEnd:
    def test_learn_predict_cli(self, synthetic_dataset):
        from gpr_tpu.apps import learn, predict

        tmp_path, paths = synthetic_dataset
        us_train, dvf_train = paths["train"]
        us_test, dvf_test = paths["test"]
        prefix = str(tmp_path / "gpr")
        result_dir = tmp_path / "results"
        result_dir.mkdir()

        cm = str(tmp_path / "config_model.json")
        cl = str(tmp_path / "config_learn.json")
        cp = str(tmp_path / "config_predict.json")
        json.dump(CONFIG_MODEL, open(cm, "w"))
        json.dump(CONFIG_LEARN, open(cl, "w"))
        json.dump(CONFIG_PREDICT, open(cp, "w"))

        assert learn.main([cm, cl, prefix, us_train, dvf_train]) == 0

        # model + PCA artifact set on disk (reference §5.4 artifact names)
        for suffix in (
            "-RegressionVectors.txt", "-CoreMatrix.txt", "-SampleVectors.txt",
            "-LabelVectors.txt", "-ParameterFile.txt",
            "-inputMean.bin", "-inputSigma.bin", "-inputU.bin",
            "-outputMean.bin", "-outputSigma.bin", "-outputU.bin",
            "-inputFeatures.csv", "-outputFeatures.csv",
            "-inputCompactness.csv", "-outputCompactness.csv",
        ):
            assert os.path.exists(prefix + suffix), suffix

        ref_file = sorted(os.listdir(dvf_train))[0]
        assert (
            predict.main(
                [cm, cp, prefix, us_test, dvf_test, str(result_dir),
                 os.path.join(dvf_train, ref_file)]
            )
            == 0
        )

        # per-frame artifacts
        assert os.path.exists(prefix + "-latestInferenceTime.txt")
        assert os.path.exists(prefix + "-latestCompTimePCA.txt")
        assert os.path.exists(prefix + "-credibleInterval.csv")
        preds = sorted(os.listdir(result_dir))
        assert preds == [f"dfPred{i:05d}.vtk" for i in range(10)]

        # accuracy: predicted DVFs match the analytic ground truth
        errs = []
        for i, ph in enumerate(paths["phases_test"]):
            img = imageio.read_image(str(result_dir / f"dfPred{i:05d}.vtk"))
            gt = np.stack(
                [
                    np.full((4, 5, 6), np.sin(ph)),
                    np.full((4, 5, 6), 0.5 * np.cos(ph)),
                    np.full((4, 5, 6), 0.25 * np.sin(2 * ph)),
                ],
                axis=-1,
            )
            errs.append(np.abs(img.data - gt).max())
        assert max(errs) < 0.1, errs
        assert float(np.mean(errs)) < 0.04, errs

    def test_precomputed_feature_cache(self, synthetic_dataset):
        """use_precomputed short-circuits image parsing + PCA (reference
        DataParser.h:386-410)."""
        tmp_path, paths = synthetic_dataset
        us_train, dvf_train = paths["train"]
        prefix = str(tmp_path / "gpr")

        parser = DataParser.for_training(
            us_train, dvf_train, "", prefix, CONFIG_MODEL, CONFIG_LEARN
        )
        pairs = parser.get_training_data()

        cfg2 = dict(CONFIG_LEARN, use_precomputed=True)
        parser2 = DataParser.for_training(
            us_train, dvf_train, "", prefix, CONFIG_MODEL, cfg2
        )
        pairs2 = parser2.get_training_data()
        assert len(pairs) == len(pairs2)
        for (x1, y1), (x2, y2) in zip(pairs, pairs2):
            np.testing.assert_allclose(x1, x2, atol=2e-6)  # csv: 6 decimals
            np.testing.assert_allclose(y1, y2, atol=2e-6)


def test_sparse_mode_cli(synthetic_dataset):
    """config_model['sparse_inducing'] trains an inducing-point GP (config
    extension beyond the reference); predict transparently loads it."""
    from gpr_tpu.apps import learn, predict

    tmp_path, paths = synthetic_dataset
    us_train, dvf_train = paths["train"]
    us_test, dvf_test = paths["test"]
    prefix = str(tmp_path / "gprs")
    result_dir = tmp_path / "results_sparse"
    result_dir.mkdir()

    cm = dict(CONFIG_MODEL, sparse_inducing=12)
    cmp_ = str(tmp_path / "cm_sparse.json")
    cl = str(tmp_path / "cl_sparse.json")
    cp = str(tmp_path / "cp_sparse.json")
    json.dump(cm, open(cmp_, "w"))
    json.dump(CONFIG_LEARN, open(cl, "w"))
    json.dump(CONFIG_PREDICT, open(cp, "w"))

    assert learn.main([cmp_, cl, prefix, us_train, dvf_train]) == 0
    assert os.path.exists(prefix + "-sparse.npz")

    ref_file = sorted(os.listdir(dvf_train))[0]
    assert predict.main(
        [cmp_, cp, prefix, us_test, dvf_test, str(result_dir),
         os.path.join(dvf_train, ref_file)]
    ) == 0
    import numpy as np
    from gpr_tpu.pipeline import imageio as iio

    errs = []
    for i, ph in enumerate(paths["phases_test"]):
        img = iio.read_image(str(result_dir / f"dfPred{i:05d}.vtk"))
        gt = np.stack(
            [np.full((4, 5, 6), np.sin(ph)),
             np.full((4, 5, 6), 0.5 * np.cos(ph)),
             np.full((4, 5, 6), 0.25 * np.sin(2 * ph))], axis=-1,
        )
        errs.append(np.abs(img.data - gt).mean())
    assert float(np.mean(errs)) < 0.15, errs  # 12 inducing pts over 40 frames


def test_precomputed_prediction_cache(synthetic_dataset):
    """Prediction-side feature cache: a second predict run with
    use_precomputed=True reads Features_prediction.csv instead of
    re-parsing images (reference DataParser.h:440-455) and yields the same
    features."""
    tmp_path, paths = synthetic_dataset
    us_train, dvf_train = paths["train"]
    us_test, dvf_test = paths["test"]
    prefix = str(tmp_path / "gprc")

    parser = DataParser.for_training(
        us_train, dvf_train, "", prefix, CONFIG_MODEL, CONFIG_LEARN
    )
    parser.get_training_data()

    p1 = DataParser.for_prediction(
        us_test, dvf_test, prefix, CONFIG_MODEL,
        {"use_precomputed": False, "compute_groundtruth_features": False},
    )
    v1 = p1.get_test_data()
    assert os.path.exists(prefix + "-inputFeatures_prediction.csv")

    p2 = DataParser.for_prediction(
        us_test, dvf_test, prefix, CONFIG_MODEL,
        {"use_precomputed": True, "compute_groundtruth_features": False},
    )
    v2 = p2.get_test_data()
    assert len(v1) == len(v2)
    for a, b in zip(v1, v2):
        np.testing.assert_allclose(a, b, atol=2e-6)  # csv stores 6 decimals
