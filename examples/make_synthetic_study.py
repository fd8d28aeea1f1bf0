"""Generate a synthetic respiratory study in the flat layout the
``experiments`` app's ``splitting_data`` stage expects (reference
scripts/main.py:217-263): ``<root>/us/*.vtk`` surrogate frames and
``<root>/reg3d/*.vtk`` displacement fields driven by a shared phase.

    python examples/make_synthetic_study.py <root> [n_frames]

The shipped configs in ``examples/params/`` run against this layout:

    python examples/make_synthetic_study.py /tmp/study
    python -m gpr_tpu.apps.experiments examples/params/respiratory_synthetic.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_study(root: str, n_frames: int = 50, field_ncomp: int = 3) -> None:
    """``field_ncomp=2`` writes 2-D+t displacement fields (the tracking
    matrix, examples/params/matrix/config_tracking_2d.yaml — reference
    scripts/params/tracking/ semantics); 3 (default) writes volumes."""
    from gpr_tpu.pipeline import imageio

    rng = np.random.default_rng(0)
    us_dir = os.path.join(root, "us")
    dvf_dir = os.path.join(root, "reg3d")
    os.makedirs(us_dir, exist_ok=True)
    os.makedirs(dvf_dir, exist_ok=True)
    for i in range(n_frames):
        ph = 2 * np.pi * i / 11.0
        yy, _ = np.mgrid[0:16, 0:16]
        frame = np.clip(
            127 + 100 * np.sin(2 * np.pi * yy / 16 + ph) + rng.normal(0, 1, (16, 16)),
            0,
            255,
        )
        imageio.write_image(
            imageio.Image(frame, (1, 1), (0, 0)),
            os.path.join(us_dir, f"us{i:05d}.vtk"),
        )
        if field_ncomp == 2:
            df = np.stack(
                [
                    np.full((6, 7), 3.0 * np.sin(ph)),
                    np.full((6, 7), 1.5 * np.cos(ph)),
                ],
                axis=-1,
            ) + rng.normal(0, 0.02, (6, 7, 2))
            img = imageio.Image(df, (1, 1), (0, 0), ncomponents=2)
        else:
            df = np.stack(
                [
                    np.full((4, 5, 6), 3.0 * np.sin(ph)),
                    np.full((4, 5, 6), 1.5 * np.cos(ph)),
                    np.full((4, 5, 6), 0.5 * np.sin(2 * ph)),
                ],
                axis=-1,
            ) + rng.normal(0, 0.02, (4, 5, 6, 3))
            img = imageio.Image(df, (1, 1, 1), (0, 0, 0), ncomponents=3)
        imageio.write_image(img, os.path.join(dvf_dir, f"df{i:05d}.vtk"))


def make_ar_study(
    root: str, p: int = 2, n_train_sweeps: int = 20, n_test_sweeps: int = 5
) -> None:
    """Pre-split sweep-layout study for the AR matrix config
    (examples/params/matrix/config_pmb_vol01_ar.yaml): each sweep is ``p``
    surrogate frames and ONE displacement field one step ahead (the
    reference's onePredictionPerBatch acquisition — n_slices frames per
    sweep, one stacked DVF per sweep, ar_n-step-ahead target;
    config_114CTarchive_vol04.yaml gpr_learn schedule).  Layout:
    us/{train,test}, reg3d/{train,test}, ar/{train,test}."""
    from gpr_tpu.pipeline import imageio

    rng = np.random.default_rng(3)
    step = 2 * np.pi / 11.0

    def us_frame(ph):
        yy, _ = np.mgrid[0:16, 0:16]
        return np.clip(
            127 + 100 * np.sin(2 * np.pi * yy / 16 + ph)
            + rng.normal(0, 1, (16, 16)), 0, 255,
        )

    def dvf_frame(ph):
        return np.stack(
            [
                np.full((4, 5, 6), 3.0 * np.sin(ph)),
                np.full((4, 5, 6), 1.5 * np.cos(ph)),
                np.full((4, 5, 6), 0.5 * np.sin(2 * ph)),
            ],
            axis=-1,
        ) + rng.normal(0, 0.02, (4, 5, 6, 3))

    def write_sweeps(us_dir, dvf_dir, n_sweeps, offset):
        os.makedirs(us_dir, exist_ok=True)
        if dvf_dir:
            os.makedirs(dvf_dir, exist_ok=True)
        for s in range(n_sweeps):
            for k in range(p):
                ph = offset + (s * p + k) * step
                imageio.write_image(
                    imageio.Image(us_frame(ph), (1, 1), (0, 0)),
                    os.path.join(us_dir, f"us{s * p + k:05d}.vtk"),
                )
            if dvf_dir:
                # target: the field ONE batch (p frames) ahead
                ph = offset + (s * p + p) * step
                imageio.write_image(
                    imageio.Image(dvf_frame(ph), (1, 1, 1), (0, 0, 0),
                                  ncomponents=3),
                    os.path.join(dvf_dir, f"df{s:05d}.vtk"),
                )

    write_sweeps(os.path.join(root, "us", "train"),
                 os.path.join(root, "reg3d", "train"), n_train_sweeps, 0.0)
    write_sweeps(os.path.join(root, "us", "test"),
                 os.path.join(root, "reg3d", "test"), n_test_sweeps, 1.234)
    write_sweeps(os.path.join(root, "ar", "train"), None, n_train_sweeps, 0.321)
    write_sweeps(os.path.join(root, "ar", "test"), None, n_test_sweeps, 2.1)


def make_dicom_data(root: str, n_frames: int = 24, n_slices: int = 1) -> None:
    """Write a tiny synthetic DICOM acquisition into ``<root>/data`` so the
    ``preprocessing`` stage (DICOM rename/fix/sort, reference
    scripts/main.py:77-113) is runnable end-to-end — exercised by
    ``examples/params/full_pipeline.yaml``."""
    from gpr_tpu.data import dicom

    rng = np.random.default_rng(1)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    for i in range(n_frames * n_slices):
        img = np.clip(
            127 + 80 * np.sin(2 * np.pi * i / 11.0) + rng.normal(0, 4, (16, 16)),
            0, 255,
        ).astype(np.uint8)
        dicom.write_minimal_dicom(
            os.path.join(data_dir, f"IM{i:05d}.dcm"),
            instance_number=i + 1,
            series_number=1,
            acquisition_number=1 + i % n_slices,
            pixel_data=img,
        )


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gpr_tpu_study"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    make_study(root, n)
    make_dicom_data(root)
    print(f"synthetic study written to {root} ({n} frames)")
