"""End-to-end test of the AR-enabled pipeline: grouped US frames drive an
AR(p) feature predictor ahead of the GP (the reference's full respiratory
prediction mode — DataParser.h:333-412 concat-PCA + AR flow, with
batching)."""

import json
import os

import numpy as np
import pytest

from gpr_tpu.pipeline import imageio


P = 2  # AR order / frames per sweep
N_TRAIN = 16  # DVFs (sweeps) for training
N_TEST = 6
N_AR_TRAIN = 10  # AR-model sweeps
N_AR_TEST = 4


def us_frame(rng, ph):
    yy, _ = np.mgrid[0:10, 0:10]
    img = 127 + 100 * np.sin(2 * np.pi * yy / 10 + ph)
    return np.clip(img + rng.normal(0, 0.5, (10, 10)), 0, 255)


def dvf_frame(ph):
    return np.stack(
        [
            np.full((2, 3, 4), np.sin(ph)),
            np.full((2, 3, 4), 0.6 * np.cos(ph)),
            np.full((2, 3, 4), 0.3 * np.sin(ph)),
        ],
        axis=-1,
    )


@pytest.fixture
def ar_dataset(tmp_path):
    """Phase advances by dphi per FRAME; each sweep has P frames and one
    DVF at the phase of the frame FOLLOWING the sweep (so the AR must
    predict ar_n=1 steps ahead for the GP input to align)."""
    rng = np.random.default_rng(0)
    dphi = 2 * np.pi / 10

    dirs = {}
    for name in ("us_train", "us_test", "dvf_train", "dvf_test",
                 "ar/train", "ar/test"):
        d = tmp_path / name
        d.mkdir(parents=True)
        dirs[name] = d

    def write_sweeps(us_dir, dvf_dir, n_sweeps, phase0):
        for s in range(n_sweeps):
            base = phase0 + s * P * dphi
            for f in range(P):
                ph = base + f * dphi
                imageio.write_image(
                    imageio.Image(us_frame(rng, ph), (1, 1), (0, 0)),
                    str(us_dir / f"us{s * P + f:05d}.vtk"),
                )
            if dvf_dir is not None:
                # the DVF corresponds to one step past the sweep's last frame
                target_ph = base + P * dphi
                imageio.write_image(
                    imageio.Image(
                        dvf_frame(target_ph) + rng.normal(0, 0.003, (2, 3, 4, 3)),
                        (1, 1, 1), (0, 0, 0), ncomponents=3,
                    ),
                    str(dvf_dir / f"df{s:05d}.vtk"),
                )

    write_sweeps(dirs["us_train"], dirs["dvf_train"], N_TRAIN, 0.0)
    write_sweeps(dirs["us_test"], dirs["dvf_test"], N_TEST, 1.234)
    write_sweeps(dirs["ar/train"], None, N_AR_TRAIN, 0.321)
    write_sweeps(dirs["ar/test"], None, N_AR_TEST, 2.1)

    config_model = {
        "perform_ar": True,
        "n_inputModes": 4,
        "n_outputModes": 3,
        "ar_n": 1,
        "ar_p": P,
        "kernel_string": "GaussianKernel(2, 1,)",
        "data_noise": 0.01,
    }
    config_learn = {
        "use_precomputed": False,
        "n_trainImgs": 0,
        "start_trainInd": 0,
        "ar_batchSizeTrain": [P],
        "ar_batchRepetitionTrain": [N_AR_TRAIN],
        "ar_batchSizeTest": [P],
        "ar_batchRepetitionTest": [N_AR_TEST],
        "ar_onePredictionPerBatchTest": True,
        "ar_batchSize": [P],
        "ar_batchRepetition": [N_TRAIN],
        "ar_onePredictionPerBatch": True,
    }
    config_predict = {
        "use_precomputed": False,
        "compute_groundtruth_features": False,
        "ar_batchSize": [P],
        "ar_batchRepetition": [N_TEST],
        "ar_onePredictionPerBatch": True,
    }
    return tmp_path, dirs, config_model, config_learn, config_predict


class TestARPipeline:
    def test_learn_predict_with_ar(self, ar_dataset):
        from gpr_tpu.apps import learn, predict

        tmp_path, dirs, cm_d, cl_d, cp_d = ar_dataset
        cm = str(tmp_path / "cm.json")
        cl = str(tmp_path / "cl.json")
        cp = str(tmp_path / "cp.json")
        json.dump(cm_d, open(cm, "w"))
        json.dump(cl_d, open(cl, "w"))
        json.dump(cp_d, open(cp, "w"))
        prefix = str(tmp_path / "gpr")
        result_dir = tmp_path / "results"
        result_dir.mkdir()

        rc = learn.main(
            [cm, cl, prefix, str(dirs["us_train"]), str(dirs["dvf_train"]),
             str(tmp_path / "ar")]
        )
        assert rc == 0
        # AR artifacts written (reference DataParser.h:374,381-383)
        assert os.path.exists(prefix + "-arModel.bin")
        assert os.path.exists(prefix + "-arModel.csv")
        assert os.path.exists(prefix + "-arFeaturesTest.csv")
        assert os.path.exists(prefix + "-arFeaturesTestPredict.csv")

        rc = predict.main(
            [cm, cp, prefix, str(dirs["us_test"]), str(dirs["dvf_test"]),
             str(result_dir),
             str(dirs["dvf_train"] / "df00000.vtk")]
        )
        assert rc == 0
        preds = sorted(os.listdir(result_dir))
        assert preds == [f"dfPred{i:05d}.vtk" for i in range(N_TEST)]

        # accuracy: the AR + GP chain must predict the one-step-ahead DVF
        errs = []
        for s in range(N_TEST):
            pred = imageio.read_image(str(result_dir / f"dfPred{s:05d}.vtk")).data
            target_ph = 1.234 + s * P * (2 * np.pi / 10) + P * (2 * np.pi / 10)
            errs.append(np.abs(pred - dvf_frame(target_ph)).mean())
        assert float(np.mean(errs)) < 0.15, errs

    def test_ar_feature_count_matches_outputs(self, ar_dataset):
        """With AR, inputs group p frames per sweep: feature pairs must
        equal the number of DVFs (reference one-prediction-per-batch)."""
        from gpr_tpu.pipeline.dataparser import DataParser

        tmp_path, dirs, cm_d, cl_d, _ = ar_dataset
        parser = DataParser.for_training(
            str(dirs["us_train"]), str(dirs["dvf_train"]), str(tmp_path / "ar"),
            str(tmp_path / "gpr2"), cm_d, cl_d,
        )
        pairs = parser.get_training_data()
        assert len(pairs) == N_TRAIN
        assert pairs[0][0].shape == (cm_d["n_inputModes"],)
        assert pairs[0][1].shape == (cm_d["n_outputModes"],)
