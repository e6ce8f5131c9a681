"""End-to-end harness tests: generate → MAP → MCMC through the CLI layer
(≅ running the reference's test/ scripts; SURVEY.md §3/§4)."""

import os

import numpy as np
import pytest

from theano_pyglm_tpu.cli import fit_map, fit_mcmc, generate_synth_data
from theano_pyglm_tpu.utils.io import load_results, parse_cmd_line_args


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("harness"))
    args = parse_cmd_line_args(
        ["--model", "sparse_weighted_model", "-N", "3", "-T", "8", "-r", d, "--seed", "5"]
    )
    generate_synth_data(args)
    return d


def test_generate(workdir):
    data = load_results(os.path.join(workdir, "synth_data.npz"))
    assert data["S"].shape[1] == 3
    assert "true_params" in data and "stim" in data


def test_map_harness(workdir):
    args = parse_cmd_line_args(
        ["-d", os.path.join(workdir, "synth_data.npz"),
         "--model", "sparse_weighted_model", "-r", workdir]
    )
    out = fit_map(args)
    res = load_results(out)
    assert np.isfinite(res["log_joint"])
    assert res["params"]["bias"].shape == (3,)
    assert os.path.exists(os.path.join(workdir, "map_results.png"))


def test_mcmc_harness(workdir):
    args = parse_cmd_line_args(
        ["-d", os.path.join(workdir, "synth_data.npz"),
         "--model", "sparse_weighted_model", "-r", workdir,
         "--n_samples", "10", "--n_warmup", "10"]
    )
    out = fit_mcmc(args)
    res = load_results(out)
    assert res["samples"]["W"].shape[0] == 10
    assert os.path.exists(os.path.join(workdir, "mcmc_metrics.jsonl"))


def test_sparse_map_harness(workdir):
    args = parse_cmd_line_args(
        ["-d", os.path.join(workdir, "synth_data.npz"),
         "--model", "sparse_weighted_model", "-r", workdir, "--lam", "5.0"]
    )
    out = fit_map(args)
    assert np.isfinite(load_results(out)["log_joint"])
