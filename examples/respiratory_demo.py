"""End-to-end respiratory-motion demo (runs on CPU in ~1 minute).

Generates a synthetic breathing study (2-D ultrasound navigators + 3-D
displacement fields driven by a shared respiratory phase), then walks the
full framework:

  1. train/predict through the reference-contract CLIs (PCA features -> GP)
  2. validate: DVF error percentiles
  3. hyperparameter posterior via NUTS + Bayesian-model-averaged prediction
  4. drift study over sliding training windows

    python examples/respiratory_demo.py [workdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root, n_train=40, n_test=10):
    from gpr_tpu.pipeline import imageio

    rng = np.random.default_rng(0)
    for split, n, start in (("train", n_train, 0), ("test", n_test, n_train)):
        us = os.path.join(root, "us", split)
        dvf = os.path.join(root, "reg3d", split)
        os.makedirs(us, exist_ok=True)
        os.makedirs(dvf, exist_ok=True)
        for i in range(n):
            ph = 2 * np.pi * (start + i) / 11.0
            yy, _ = np.mgrid[0:16, 0:16]
            frame = np.clip(
                127 + 100 * np.sin(2 * np.pi * yy / 16 + ph)
                + rng.normal(0, 1, (16, 16)),
                0, 255,
            )
            imageio.write_image(
                imageio.Image(frame, (1, 1), (0, 0)),
                os.path.join(us, f"us{i:05d}.vtk"),
            )
            df = np.stack(
                [
                    np.full((4, 5, 6), 3.0 * np.sin(ph)),      # SI drift (mm)
                    np.full((4, 5, 6), 1.5 * np.cos(ph)),      # AP
                    np.full((4, 5, 6), 0.5 * np.sin(2 * ph)),  # LR
                ],
                axis=-1,
            ) + rng.normal(0, 0.02, (4, 5, 6, 3))
            imageio.write_image(
                imageio.Image(df, (1, 1, 1), (0, 0, 0), ncomponents=3),
                os.path.join(dvf, f"df{i:05d}.vtk"),
            )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gpr_tpu_demo"
    os.makedirs(root, exist_ok=True)
    os.chdir(root)
    print(f"== demo workdir: {root}")
    make_dataset(root)

    cm = {"perform_ar": False, "n_inputModes": 5, "n_outputModes": 3,
          "ar_n": 1, "ar_p": 2,
          "kernel_string": "GaussianKernel(2, 1,)", "data_noise": 0.02}
    json.dump(cm, open("config_model.json", "w"))
    json.dump({"use_precomputed": False, "n_trainImgs": 0, "start_trainInd": 0},
              open("config_learn.json", "w"))
    json.dump({"use_precomputed": False, "compute_groundtruth_features": False},
              open("config_predict.json", "w"))

    from gpr_tpu.apps import learn, predict, validate

    print("\n== 1. train (gpLearn contract)")
    assert learn.main(["config_model.json", "config_learn.json", "gpr",
                       "us/train", "reg3d/train"]) == 0

    print("\n== 2. predict + validate")
    os.makedirs("results", exist_ok=True)
    assert predict.main(["config_model.json", "config_predict.json", "gpr",
                         "us/test", "reg3d/test", "results",
                         "reg3d/train/df00000.vtk"]) == 0
    stats = validate.dvf_error("reg3d/test", "results")
    for p, v in stats["percentiles"].items():
        print(f"   {p}% percentile error: {v:.3f} mm")

    print("\n== 3. NUTS posterior over GP hyperparameters + BMA prediction")
    import gpr_tpu
    from gpr_tpu.inference import hmc as H
    from gpr_tpu.inference.nuts import NUTSConfig, sample_nuts
    from gpr_tpu.inference.predictive import predictive_from_hmc
    from gpr_tpu.pipeline.dataparser import read_csv

    feats_in = read_csv("gpr-inputFeatures.csv")[:cm["n_inputModes"]].T
    # sample the posterior for the dominant output mode (scalar target keeps
    # the demo's chains short; multi-output works the same way, just slower)
    feats_out = read_csv("gpr-outputFeatures.csv")[:1].T
    kernel = gpr_tpu.Gaussian(2.0, 1.0)
    logp = H.make_gp_log_posterior(kernel, feats_in, feats_out, sigma=0.02)
    z0 = np.log(np.asarray([[2.0, 1.0], [2.5, 1.5]]))  # init near the MAP
    res = sample_nuts(logp, z0, jax.random.PRNGKey(0),
                      NUTSConfig(num_warmup=400, num_samples=300, max_depth=7))
    summ = H.posterior_summary(res.samples)
    print(f"   posterior mean (sigma, scale): {np.asarray(summ['mean'])}")
    print(f"   R-hat: {np.asarray(summ['rhat'])}")
    pred = predictive_from_hmc(kernel, res, feats_in, feats_out,
                               feats_in[:5], 0.02, num_draws=8)
    print(f"   BMA predictive variance (first 5 frames): "
          f"{np.asarray(pred.variance)}")

    print("\n== 4. drift study (sliding 25-frame training windows)")
    import yaml

    cfg = {"options": {}, "general": {"root_dir": root, "surrogate_dir": "us",
                                      "registration_dir": "reg3d",
                                      "master_volume": "reg3d/train/df00000.vtk"},
           "gpr_model": dict(cm, subdir="test"),
           "gpr_learn": {"use_precomputed": False, "n_trainImgs": 0,
                         "start_trainInd": 0},
           "gpr_predict": {"use_precomputed": False,
                           "compute_groundtruth_features": False}}
    yaml.safe_dump(cfg, open("config.yaml", "w"))
    from gpr_tpu.apps import drift

    results = drift.run_drift("config.yaml", n_train=25, starts=[0, 10])
    for tag, r in results.items():
        print(f"   {tag}: median error {r['percentiles']['50']:.3f} mm")

    print("\ndemo complete.")


if __name__ == "__main__":
    main()
