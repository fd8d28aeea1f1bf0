"""DICOM ingestion tests (reference scripts/data/dicom_loader.py +
create_filestructure.py) using synthetic explicit-VR files.

These run WITHOUT pydicom via the built-in MiniDicom reader; when pydicom
is installed the same workflows are additionally exercised through it.
"""

import os

import pytest

from gpr_tpu.data import dicom as dcm
from gpr_tpu.data.prep import load_dicom_series


def _make_series(d, n, **kw):
    paths = []
    for i in range(1, n + 1):
        p = os.path.join(d, "raw%03d.ima" % i)
        dcm.write_minimal_dicom(p, instance_number=i, **kw)
        paths.append(p)
    return paths


class TestMiniDicom:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.dcm")
        dcm.write_minimal_dicom(
            p, 7, spacing_between_slices=2.5, image_comments="Navigator"
        )
        ds = dcm.MiniDicom.read(p)
        assert ds.get(dcm.TAG_INSTANCE_NUMBER) == 7
        assert ds.get(dcm.TAG_SPACING_BETWEEN_SLICES) == 2.5
        assert ds.get(dcm.TAG_IMAGE_COMMENTS) == "Navigator"
        ds.set(dcm.TAG_SPACING_BETWEEN_SLICES, 1)
        p2 = str(tmp_path / "b.dcm")
        ds.write(p2)
        assert dcm.MiniDicom.read(p2).get(dcm.TAG_SPACING_BETWEEN_SLICES) == 1.0

    def test_rejects_non_dicom(self, tmp_path):
        p = str(tmp_path / "x.dcm")
        with open(p, "wb") as f:
            f.write(b"not dicom")
        with pytest.raises(ValueError, match="DICM"):
            dcm.MiniDicom.read(p)


class TestPreprocess:
    def test_navi_rename_and_spacing_fix(self, tmp_path):
        """Navigator files: renamed navi%05d.dcm by InstanceNumber and
        SpacingBetweenSlices 0 -> 1 (dicom_loader.py:40-46)."""
        src = tmp_path / "src"
        out = tmp_path / "out"
        src.mkdir()
        _make_series(
            str(src), 3, spacing_between_slices=0.0, image_comments="Navigator"
        )
        renamed = dcm.preprocess_dicom_dir(str(src), str(out), is_navi=True)
        assert [os.path.basename(r) for r in renamed] == [
            "navi00001.dcm",
            "navi00002.dcm",
            "navi00003.dcm",
        ]
        for r in renamed:
            assert dcm.MiniDicom.read(r).get(dcm.TAG_SPACING_BETWEEN_SLICES) == 1.0

    def test_data_rename_and_slice_sort(self, tmp_path):
        """Data files: renamed data%05d.dcm and distributed into
        sorted/slice%02d sweep folders (dicom_loader.py:48-60)."""
        src = tmp_path / "src"
        out = tmp_path / "out"
        src.mkdir()
        _make_series(str(src), 6)
        renamed = load_dicom_series(str(src), str(out), n_slices=3)
        assert [os.path.basename(r) for r in renamed] == [
            "data%05d.dcm" % i for i in range(1, 7)
        ]
        for p in range(3):
            d = out / "sorted" / ("slice%02d" % (p + 1))
            # 2 sweeps x 1 file per position
            assert sorted(os.listdir(d)) == [
                "data%05d.dcm" % (p + 1),
                "data%05d.dcm" % (p + 4),
            ]

    def test_wrong_slice_count_raises(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _make_series(str(src), 5)
        with pytest.raises(ValueError, match="slice positions"):
            dcm.preprocess_dicom_dir(str(src), str(tmp_path / "o"), n_slices=3)


class TestCreateFilestructure:
    def test_sorts_and_writes_params(self, tmp_path):
        src = tmp_path / "src"
        dest = tmp_path / "dest"
        src.mkdir()
        for i in range(1, 5):
            dcm.write_minimal_dicom(
                str(src / ("f%02d.ima" % i)),
                instance_number=i,
                protocol_name="zc_4dmri_prot",
                series_number=3,
                acquisition_number=(i + 1) // 2,  # 2 sweeps
            )
        dcm.write_minimal_dicom(
            str(src / "loc.ima"), 1, protocol_name="localizer", series_number=1
        )
        params = dcm.create_filestructure(str(src), str(dest))
        assert params == {"n_images": 4, "n_sweeps": 2, "n_slices": 2.0}
        assert sorted(os.listdir(dest / "zc_4dmri_prot" / "3")) == [
            "scan%05d.dcm" % i for i in range(1, 5)
        ]
        assert (dest / "localizer" / "1" / "scan00001.dcm").exists()
        txt = (dest / "params.txt").read_text()
        assert "n_images: 4" in txt and "n_sweeps: 2" in txt


@pytest.mark.skipif(not dcm._have_pydicom(), reason="pydicom not installed")
class TestWithPydicom:
    def test_pydicom_path(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _make_series(str(src), 2)
        renamed = dcm.preprocess_dicom_dir(
            str(src), str(tmp_path / "o"), n_slices=2
        )
        assert len(renamed) == 2


def test_pixel_array_roundtrip(tmp_path):
    """Uncompressed pixel data decodes through the fallback reader
    (reference read_us_video.py reads US frames via pydicom+SimpleITK)."""
    import numpy as np

    from gpr_tpu.data import dicom

    rng = np.random.default_rng(0)
    img8 = rng.integers(0, 255, (32, 24), dtype=np.uint8)
    img16 = rng.integers(0, 60000, (16, 20), dtype=np.uint16)
    p8 = tmp_path / "f8.dcm"
    p16 = tmp_path / "f16.dcm"
    dicom.write_minimal_dicom(str(p8), 1, pixel_data=img8)
    dicom.write_minimal_dicom(str(p16), 2, pixel_data=img16)
    np.testing.assert_array_equal(dicom.read_pixel_array(str(p8)), img8)
    np.testing.assert_array_equal(dicom.read_pixel_array(str(p16)), img16)


def test_us_video_to_vtk(tmp_path):
    """Directory of US DICOM frames -> video_<InstanceNumber>.vtk
    (reference scripts/read_us_video.py)."""
    import numpy as np

    from gpr_tpu.data import dicom
    from gpr_tpu.pipeline import imageio

    rng = np.random.default_rng(1)
    src = tmp_path / "us_dcm"
    src.mkdir()
    frames = {}
    for i in range(3):
        img = rng.integers(0, 255, (12, 10), dtype=np.uint8)
        frames[i + 1] = img
        dicom.write_minimal_dicom(
            str(src / f"f{i}.dcm"), i + 1, pixel_data=img
        )
    dest = tmp_path / "vtk"
    n = dicom.us_video_to_vtk(str(src), str(dest))
    assert n == 3
    for inst, img in frames.items():
        out = imageio.read_image(str(dest / f"video_{inst}.vtk"))
        np.testing.assert_allclose(out.data, img.astype(np.float64))
