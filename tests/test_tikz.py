"""TikZ export parity (reference scripts/validation_dvf.py:110-198)."""

import os

import numpy as np

from gpr_tpu.apps import tikz


def _fake_result(T=20):
    rng = np.random.default_rng(0)
    base = 0.1 + 0.05 * np.sin(np.arange(T) / 3.0)
    errbars = np.stack(
        [base * s for s in (0.2, 2.0, 0.4, 1.6, 0.7, 1.3, 1.0)]
    )
    return {
        "errbars": errbars,
        "median_per_frame": base,
        "mean_per_frame": base * 1.05,
    }


def test_credible_interval_tikz_source():
    res = _fake_result()
    ci = np.linspace(0.5, 0.8, 20)
    tex = tikz.credible_interval_tikz(res["errbars"], res["median_per_frame"], ci)
    assert "\\begin{tikzpicture}" in tex and tex.count("\\end{axis}") == 2
    # three percentile bands as closed fills + median + confidence
    assert tex.count("\\closedcycle") == 3
    assert "01/99 percentiles" in tex and "25/75 percentiles" in tex
    assert "confidence value" in tex
    # time axis at the reference's 1.25 Hz: last sample at 19/1.25 = 15.2 s
    assert "(15.2," in tex


def test_export_validation_tikz(tmp_path):
    res = _fake_result()
    csv = tmp_path / "gpr-credibleInterval.csv"
    np.savetxt(csv, np.linspace(0.4, 0.9, 20), delimiter=",")
    tex_path = tikz.export_validation_tikz(
        str(tmp_path), res, subdir="test", suffix="_exp1", credible_csv=str(csv)
    )
    assert os.path.exists(tex_path)
    assert os.path.basename(tex_path) == "credible_interval_test__exp1.tex"
    # companion artifacts in the reference's naming
    eb = np.load(tmp_path / "errbars_exp1.npy")
    np.testing.assert_array_equal(eb, res["errbars"])
    assert os.path.exists(tmp_path / "errbars_mean_exp1.npy")

    # masked variant goes to VOI/ with _VOI suffix (validation_dvf.py:131-137)
    tex_voi = tikz.export_validation_tikz(
        str(tmp_path), res, subdir="test", suffix="_exp1", mask=True
    )
    assert tex_voi.endswith("_VOI.tex")
    assert os.path.exists(tmp_path / "VOI" / "errbars_exp1.npy")

    # the COMBINED overlay contract (reference validation_dvf.py:149-198):
    # ONE .tex holding the error-vs-time bands + median on the left axis
    # AND the credible-interval curve on the right axis
    tex = open(tex_path).read()
    assert tex.count("\\closedcycle") == 3          # percentile bands
    assert "median" in tex                            # error median curve
    assert "axis y line*=right" in tex                # CI overlay axis
    assert "confidence value" in tex
    assert tex.count("\\end{axis}") == 2
