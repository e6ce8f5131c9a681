"""End-to-end real-data harness test: Pillow-format .mat fixture → bin →
MAP (+ tiny MCMC) → KS + held-out report (SURVEY.md §2 harness row, §4.2)."""

import json
import os
import sys

import numpy as np
import pytest


def _run_script(argv):
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "fit_rgc.py")
    spec = importlib.util.spec_from_file_location("fit_rgc", path)
    mod = importlib.util.module_from_spec(spec)
    old = sys.argv
    sys.argv = ["fit_rgc.py"] + argv
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = old


def test_rgc_mat_roundtrip(tmp_path):
    """Fixture writer → loader → binner reproduces the generating spike
    matrix exactly (spikes are placed mid-bin)."""
    from theano_pyglm_tpu.utils.binning import bin_spikes
    from theano_pyglm_tpu.utils.rgc import load_rgc_mat, make_synthetic_rgc, save_rgc_fixture_mat

    path = os.path.join(tmp_path, "fix.mat")
    save_rgc_fixture_mat(path, N=3, T_sec=5.0, seed=1)
    rec = load_rgc_mat(path)
    assert rec["N"] == 3
    assert rec["stim"].shape[1] == 1 and rec["stim_dt"] == 0.01
    per_neuron, stim, true, spec = make_synthetic_rgc(N=3, T_sec=5.0, seed=1)
    T = int(round(rec["T_sec"] / 1e-3))
    S = bin_spikes(rec["times"], rec["neurons"], T, 1e-3, 3)
    S_direct = np.zeros((T, 3), np.float32)
    for n, ts in enumerate(per_neuron):
        np.add.at(S_direct, ((ts / 1e-3).astype(int), n), 1.0)
    np.testing.assert_array_equal(S, S_direct)


@pytest.mark.slow
def test_fit_rgc_end_to_end(tmp_path):
    fixture = os.path.join(tmp_path, "rgc_fixture.mat")
    results = os.path.join(tmp_path, "results")
    _run_script(["--make-fixture", fixture, "--fixture-N", "4",
                 "--fixture-T", "6.0", "--seed", "0"])
    assert os.path.exists(fixture)

    _run_script(["--dataFile", fixture, "--resultsDir", results,
                 "--map_iters", "200", "--n_samples", "15", "--n_warmup", "15"])
    with open(os.path.join(results, "rgc_fit_report.json")) as f:
        report = json.load(f)
    assert report["N"] == 4 and report["n_spikes"] > 0
    m = report["map"]
    assert np.isfinite(m["heldout_loglik"])
    assert np.isfinite(m["ks_mean"]) and 0.0 <= m["ks_mean"] <= 1.0
    # the fitted GLM must explain held-out data better than a homogeneous
    # rate (the KS statistic is smaller = closer to a true point process)
    assert m["ks_beats_null"], (m["ks_mean"], m["ks_null_mean"])
    mc = report["mcmc"]
    assert np.isfinite(mc["heldout_predictive_loglik"])
    assert os.path.exists(os.path.join(results, "rgc_fit_params.npz"))
