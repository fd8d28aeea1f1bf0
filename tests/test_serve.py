"""Real-time serving-loop test: frames arriving in a watched directory are
predicted in order with per-frame latency accounting."""

import json
import os
import threading
import time

import numpy as np
import pytest

from gpr_tpu.pipeline import imageio


@pytest.fixture
def trained_model(tmp_path):
    """Train a tiny model via the learn CLI on synthetic data; returns
    (prefix, config_model, frame_factory)."""
    from gpr_tpu.apps import learn

    rng = np.random.default_rng(0)
    us = tmp_path / "us"
    dvf = tmp_path / "dvf"
    us.mkdir(), dvf.mkdir()

    def us_frame(ph, noise=True):
        yy, _ = np.mgrid[0:8, 0:8]
        img = 127 + 100 * np.sin(2 * np.pi * yy / 8 + ph)
        if noise:
            img = img + rng.normal(0, 1, (8, 8))
        return np.clip(img, 0, 255)

    for i in range(24):
        ph = 2 * np.pi * i / 8
        imageio.write_image(
            imageio.Image(us_frame(ph), (1, 1), (0, 0)), str(us / f"u{i:05d}.vtk")
        )
        df = np.stack(
            [np.full((2, 3, 4), np.sin(ph)), np.full((2, 3, 4), np.cos(ph)),
             np.zeros((2, 3, 4))],
            axis=-1,
        )
        imageio.write_image(
            imageio.Image(df, (1, 1, 1), (0, 0, 0), ncomponents=3),
            str(dvf / f"d{i:05d}.vtk"),
        )

    config_model = {
        "perform_ar": False, "n_inputModes": 3, "n_outputModes": 2,
        "ar_n": 1, "ar_p": 2,
        "kernel_string": "GaussianKernel(2, 1,)", "data_noise": 0.01,
    }
    cm = str(tmp_path / "cm.json")
    cl = str(tmp_path / "cl.json")
    json.dump(config_model, open(cm, "w"))
    json.dump({"use_precomputed": False, "n_trainImgs": 0, "start_trainInd": 0},
              open(cl, "w"))
    prefix = str(tmp_path / "gpr")
    assert learn.main([cm, cl, prefix, str(us), str(dvf)]) == 0
    return prefix, config_model, us_frame


class TestServe:
    def test_streaming_frames(self, tmp_path, trained_model):
        from gpr_tpu.apps.serve import Server, watch

        prefix, config_model, us_frame = trained_model
        watch_dir = tmp_path / "incoming"
        out_dir = tmp_path / "served"
        watch_dir.mkdir()

        server = Server(config_model, prefix, str(out_dir))
        server.warmup(us_frame(0.0, noise=False))

        def producer():
            for i in range(5):
                ph = 2 * np.pi * i / 8
                imageio.write_image(
                    imageio.Image(us_frame(ph, noise=False), (1, 1), (0, 0)),
                    str(watch_dir / f"f{i:05d}.vtk"),
                )
                time.sleep(0.03)

        t = threading.Thread(target=producer)
        t.start()
        served = watch(server, str(watch_dir), poll=0.01, max_frames=5)
        t.join()
        assert served == 5
        outs = sorted(os.listdir(out_dir))
        assert outs == [f"dvf{i:05d}.npy" for i in range(5)]
        # prediction accuracy on the clean frames: x-displacement ~ sin(ph)
        for i in range(5):
            ph = 2 * np.pi * i / 8
            dvf = np.load(out_dir / f"dvf{i:05d}.npy").reshape(-1, 3)
            assert abs(dvf[:, 0].mean() - np.sin(ph)) < 0.1
        # latency artifact written
        assert os.path.exists(prefix + "-latestInferenceTime.txt")

    def test_direct_handle_frame_latency(self, trained_model, tmp_path):
        from gpr_tpu.apps.serve import Server

        prefix, config_model, us_frame = trained_model
        server = Server(config_model, prefix, str(tmp_path / "o"), features_only=True)
        server.warmup(us_frame(0.0, noise=False))
        _, _, dt = server.handle_frame(us_frame(1.0, noise=False), 0)
        # generous bound: the compiled path takes ~100us-1ms on an idle CPU
        # but CI machines can be heavily contended
        assert dt < 5.0
