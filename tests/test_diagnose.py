"""Scene-conditioned diagnosis (eval.diagnose): features + rank correlations.

No reference counterpart — the reference's statistical harness stops at
aggregate plots (``resolution_comparison_statistical.py:378-499``).
"""

import json

import numpy as np

from superresolution_for_pdes_tpu.eval.diagnose import (
    _spearman,
    diagnose,
    format_report,
    scene_features,
)


def test_scene_features_values():
    f = scene_features(4.0, 10.25, levels=(40, 80))
    # level 1: adv = 20*k/39 -> 2.0513 (k=4), 5.2564 (k=10.25)
    assert np.isclose(f["tile_misalign_L1"], max(abs(20 * 4 / 39 - 2), abs(20 * 10.25 / 39 - 5)))
    # level 2: adv = 20*k/79
    assert np.isclose(f["tile_misalign_L2"],
                      max(abs(20 * 4 / 79 - 1), abs(20 * 10.25 / 79 - round(20 * 10.25 / 79))))
    assert f["k_frac"] == 0.25  # k2 = 10.25
    assert f["k_sum"] == 14.25 and f["k_min"] == 4.0 and f["k_max"] == 10.25


def test_spearman_monotone_and_ties():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    assert np.isclose(_spearman(x, x**3), 1.0)      # monotone, nonlinear
    assert np.isclose(_spearman(x, -x), -1.0)
    assert abs(_spearman(np.array([1.0, 1.0, 2.0, 2.0]), np.array([3.0, 3.0, 5.0, 5.0]))) <= 1.0
    assert _spearman(np.ones(4), x) == 0.0           # degenerate -> 0, not nan


def _fake_result(n=12):
    rng = np.random.default_rng(0)
    records = []
    for _ in range(n):
        k1, k2 = rng.uniform(8, 12, size=2)
        feats = scene_features(k1, k2)
        rec = {"k1": float(k1), "k2": float(k2), "rms40": 1.0, "solve_times": {}}
        for res in (80, 160):
            # make 160^2 rel-L2 a clean monotone function of L2 misalignment
            rl2 = 0.2 + (feats["tile_misalign_L2"] if res == 160 else 0.1 * rng.random())
            rec[res] = {
                "ml": {"mae": 1e-5, "rmse": 2e-5, "max_error": 1e-4, "relative_l2": float(rl2)},
                "bilinear": {"mae": 1e-4, "rmse": 2e-4, "max_error": 1e-3, "relative_l2": 1.0},
                "truth_rms": 0.5, "ml_time": 0.1, "bilinear_time": 0.01,
            }
        records.append(rec)
    return {"records": records}


def test_diagnose_recovers_planted_correlation(tmp_path):
    diag = diagnose(_fake_result())
    assert diag["resolutions"] == [80, 160]
    assert np.isclose(diag["features"]["tile_misalign_L2"][160], 1.0)
    assert abs(diag["features"]["tile_misalign_L2"][80]) < 0.9
    assert np.isclose(diag["features"]["amp_ratio"][160], 0.0)  # constant
    # worst list is sorted by rel-L2 descending
    rl2 = [diag["table"][i]["ml_rel_l2_160"] for i in diag["worst"][160]]
    assert rl2 == sorted(rl2, reverse=True)
    report = format_report(diag, focus=160)
    assert "tile_misalign_L2" in report and "worst scenes @ 160^2" in report

    # survives a JSON round trip (integer keys stringify)
    rt = json.loads(json.dumps(_fake_result(), default=float))
    diag2 = diagnose(rt)
    assert np.isclose(diag2["features"]["tile_misalign_L2"][160], 1.0)
