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


def make_study(root: str, n_frames: int = 50) -> None:
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
        df = np.stack(
            [
                np.full((4, 5, 6), 3.0 * np.sin(ph)),
                np.full((4, 5, 6), 1.5 * np.cos(ph)),
                np.full((4, 5, 6), 0.5 * np.sin(2 * ph)),
            ],
            axis=-1,
        ) + rng.normal(0, 0.02, (4, 5, 6, 3))
        imageio.write_image(
            imageio.Image(df, (1, 1, 1), (0, 0, 0), ncomponents=3),
            os.path.join(dvf_dir, f"df{i:05d}.vtk"),
        )


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
