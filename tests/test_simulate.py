"""Forward-simulation tests: rate consistency with the design-tensor path,
Poisson statistics, and strict causality (SURVEY.md §4)."""

import jax
import numpy as np

from theano_pyglm_tpu import Population, make_model


def test_simulate_rates_match_design_path():
    """The rate trace emitted during simulation must equal the rate recomputed
    from the design tensors — pins the causal-convolution conventions of
    simulate() and prepare_data() to each other."""
    spec = make_model("sparse_weighted_model", 3)
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    T = 500
    stim = np.random.RandomState(0).randn(T, 1)
    S, rates = pop.simulate(jax.random.PRNGKey(1), params, T, stim=stim)
    data = pop.prepare_data(S, stim=stim)
    I = pop.total_current(params, data)
    rates_design = np.asarray(pop.nlin.rate(I))
    np.testing.assert_allclose(np.asarray(rates), rates_design, rtol=1e-9, atol=1e-9)


def test_zero_coupling_poisson_statistics():
    """With no stimulus and zero coupling the process is homogeneous Poisson
    with rate exp(bias)."""
    spec = make_model("standard_glm", 2, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    params["w_ir"] = params["w_ir"] * 0.0
    params["bias"] = np.log(20.0) * np.ones(2)  # 20 Hz
    T = 20000
    S, rates = pop.simulate(jax.random.PRNGKey(2), params, T)
    np.testing.assert_allclose(np.asarray(rates), 20.0, rtol=1e-6)
    counts = np.asarray(S).sum(axis=0)
    expected = 20.0 * T * pop.dt  # = 400
    # 4 sigma Poisson band
    assert np.all(np.abs(counts - expected) < 4 * np.sqrt(expected))


def test_self_excitation_is_strictly_causal():
    """A huge positive self-filter must not raise the rate within the same
    bin as the spike that triggers it."""
    spec = make_model("standard_glm", 1, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    params["bias"] = np.array([np.log(20.0)])
    params["w_ir"] = 3.0 * np.ones_like(params["w_ir"])
    S, rates = pop.simulate(jax.random.PRNGKey(3), params, 1000)
    S, rates = np.asarray(S), np.asarray(rates)
    assert S[:, 0].sum() > 0, "no spikes drawn — raise T"
    first_spike = int(np.argmax(S[:, 0] > 0))
    # rate in the first-spike bin (and before) is still the baseline
    np.testing.assert_allclose(rates[: first_spike + 1, 0], 20.0, rtol=1e-6)
    assert rates[first_spike + 1, 0] > 20.0


def test_bernoulli_simulation_binary():
    spec = make_model("standard_glm", 2, observation={"type": "bernoulli"}, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), params, 500)
    assert set(np.unique(np.asarray(S))) <= {0.0, 1.0}
