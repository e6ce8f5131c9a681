"""Tests for STA, smart init, IO, metrics, diagnostics."""

import os

import jax
import numpy as np

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference.smart_init import smart_initialize
from theano_pyglm_tpu.utils.diagnostics import ess, split_rhat
from theano_pyglm_tpu.utils.io import load_results, save_results, segment_data
from theano_pyglm_tpu.utils.metrics import MetricsWriter
from theano_pyglm_tpu.utils.sta import sta


def test_sta_oracle(rng):
    T, D, N, L = 60, 2, 3, 4
    stim = rng.randn(T, D)
    S = rng.poisson(0.3, (T, N)).astype(float)
    got = np.asarray(sta(stim, S, L))
    want = np.zeros((N, L, D))
    for n in range(N):
        tot = max(S[:, n].sum(), 1.0)
        for t in range(T):
            for l in range(L):
                if t - 1 - l >= 0:
                    want[n, l] += S[t, n] * stim[t - 1 - l]
        want[n] /= tot
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_smart_init_bias_matches_rate():
    spec = make_model("standard_glm", 3, bkgd={"type": "none"})
    pop = Population(spec)
    rng = np.random.RandomState(0)
    S = rng.poisson(0.02, (5000, 3)).astype(float)  # 20 Hz
    data = pop.prepare_data(S)
    params = smart_initialize(pop, data)
    emp = np.log(S.mean(axis=0) / pop.dt)
    np.testing.assert_allclose(np.asarray(params["bias"]), emp, atol=1e-6)


def test_smart_init_finds_strong_coupling():
    spec = make_model("sparse_weighted_model", 4, bkgd={"type": "none"})
    spec["bias"] = {"mu": float(np.log(30.0)), "sigma": 0.01}  # ~30 Hz
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    # one overwhelming edge 1<-0
    A = np.zeros((4, 4)); A[1, 0] = 1
    true["A"] = A
    true["W"] = np.zeros((4, 4)); true["W"][1, 0] = 5.0
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 30000)
    data = pop.prepare_data(S)
    params = smart_initialize(pop, data)
    W0 = np.asarray(params["W"])
    assert W0[1, 0] == W0.max()
    assert np.asarray(params["A"])[1, 0] == 1


def test_io_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "r.npz")
    results = {"a": np.arange(3.0), "nested": {"b": np.eye(2)}}
    save_results(path, results)
    back = load_results(path)
    np.testing.assert_allclose(back["a"], results["a"])
    np.testing.assert_allclose(back["nested"]["b"], np.eye(2))


def test_segment_data():
    S = np.arange(20).reshape(10, 2)
    (S_tr, _), (S_va, _) = segment_data(S, train_frac=0.7)
    assert S_tr.shape[0] == 7 and S_va.shape[0] == 3
    np.testing.assert_array_equal(np.vstack([S_tr, S_va]), S)


def test_metrics_writer(tmp_path):
    path = os.path.join(tmp_path, "m.jsonl")
    w = MetricsWriter(path)
    w.log(1, logp=-10.5)
    w.log(2, logp=-9.0)
    w.close()
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 2 and '"logp": -9.0' in lines[1]


def test_diagnostics_iid(rng):
    x = rng.randn(500, 4, 3)
    r = split_rhat(x)
    assert np.all(np.abs(r - 1.0) < 0.05)
    e = ess(x)
    assert np.all(e > 0.5 * 500 * 4)


def test_diagnostics_stuck_chain(rng):
    x = rng.randn(500, 4, 1)
    x[:, 0, :] += 10.0  # one chain in a different mode
    assert np.nanmax(split_rhat(x)) > 1.5


def test_time_rescaling_ks():
    """Under the TRUE intensity the rescaled ISIs are uniform (KS accepts);
    under a wrong (constant) intensity on strongly modulated data it rejects."""
    import jax

    from theano_pyglm_tpu import Population, make_model
    from theano_pyglm_tpu.utils.ks import time_rescaling_ks

    spec = make_model("standard_glm", 2)
    spec["bias"] = {"mu": 3.0, "sigma": 0.1}  # ~20 Hz
    spec["bkgd"]["sigma"] = 2.0  # strong stimulus modulation
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    stim = rng.randn(30000, 1)
    S, rates = pop.simulate(jax.random.PRNGKey(1), params, 30000, stim=stim)
    S, rates = np.asarray(S), np.asarray(rates)

    ks_true, pv_true, _ = time_rescaling_ks(rates, S, pop.dt)
    assert np.all(pv_true > 0.005), pv_true

    flat = np.full_like(rates, rates.mean())
    ks_flat, pv_flat, _ = time_rescaling_ks(flat, S, pop.dt)
    assert np.all(pv_flat < 1e-4), pv_flat
    assert np.all(ks_flat > ks_true)


def test_spec_validation_errors():
    import pytest as _pytest

    from theano_pyglm_tpu import Population, make_model

    spec = make_model("standard_glm", 2)
    spec["nlin"] = {"type": "relu"}
    with _pytest.raises(ValueError, match="nlin.type"):
        Population(spec)
    spec = make_model("standard_glm", 2)
    spec["typo_section"] = {}
    with _pytest.raises(ValueError, match="typo_section"):
        Population(spec)
    with _pytest.raises(ValueError, match="positive int"):
        Population({"N": -3})


def test_bin_spikes_native_matches_numpy(rng):
    from theano_pyglm_tpu.utils.binning import bin_spikes, native_available

    n_ev, T, N, dt = 5000, 1000, 7, 1e-3
    times = rng.rand(n_ev) * T * dt * 1.1  # some events past the end
    neurons = rng.randint(-1, N + 1, n_ev)  # some out-of-range ids
    ref = bin_spikes(times, neurons, T, dt, N, use_native=False)
    assert ref.sum() < n_ev  # out-of-range events dropped
    if native_available():
        fast = bin_spikes(times, neurons, T, dt, N, use_native=True)
        np.testing.assert_array_equal(fast, ref)
    else:
        import pytest as _pytest

        _pytest.skip("no C toolchain")


def test_bin_spikes_boundary_events_bit_identical(rng):
    """Events exactly on bin boundaries: both paths must use the same
    multiply-by-reciprocal expression (dt=1e-3 is inexact in binary, so
    t/dt vs t*(1/dt) can land boundary events in adjacent bins)."""
    from theano_pyglm_tpu.utils.binning import bin_spikes, native_available

    T, N, dt = 1000, 3, 1e-3
    # every exact bin edge, plus nextafter on either side
    edges = np.arange(T) * dt
    times = np.concatenate(
        [edges, np.nextafter(edges, -1.0), np.nextafter(edges, 2.0)]
    )
    neurons = np.arange(times.shape[0]) % N
    ref = bin_spikes(times, neurons, T, dt, N, use_native=False)
    assert ref.sum() > 0
    if native_available():
        fast = bin_spikes(times, neurons, T, dt, N, use_native=True)
        np.testing.assert_array_equal(fast, ref)
