"""MAP inference tests: synthetic ground-truth recovery (SURVEY.md §4 item 1),
sparse (lasso) coupling, and cross-validated λ."""

import jax
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference import cross_validate_lambda, map_fit, sparse_map_fit


@pytest.fixture(scope="module")
def fitted():
    spec = make_model("standard_glm", 2)
    spec["bias"]["mu"] = 2.5  # ~12 Hz — more spikes, better-identified filters
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(11))
    T = 20000
    stim = np.random.RandomState(0).randn(T, 1)
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, T, stim=stim)
    data = pop.prepare_data(S, stim=stim)
    init = pop.sample(jax.random.PRNGKey(99))
    fit, logp, iters = map_fit(pop, data, init, max_iter=400)
    return pop, true, data, fit, float(logp), int(iters)


def test_map_converges(fitted):
    pop, true, data, fit, logp, iters = fitted
    assert np.isfinite(logp)
    assert iters < 400
    # MAP must be at least as good as the generating parameters
    assert logp >= float(pop.log_joint(true, data)) - 1e-3


def test_map_recovers_stimulus_filter(fitted):
    pop, true, data, fit, *_ = fitted
    for n in range(pop.N):
        a = np.asarray(true["w_stim"])[n] @ pop.basis_stim.T
        b = np.asarray(fit["w_stim"])[n] @ pop.basis_stim.T
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.7, corr


def test_map_recovers_bias(fitted):
    pop, true, data, fit, *_ = fitted
    np.testing.assert_allclose(np.asarray(fit["bias"]), np.asarray(true["bias"]), atol=0.5)


def test_sparse_map_shrinks_weights():
    spec = make_model("sparse_weighted_model", 4)
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(5))
    T = 4000
    stim = np.random.RandomState(0).randn(T, 1)
    S, _ = pop.simulate(jax.random.PRNGKey(6), true, T, stim=stim)
    data = pop.prepare_data(S, stim=stim)
    init = dict(true)
    init["A"] = np.ones((4, 4))  # dense fitting: sparsity must come from λ
    fit0, _, _ = map_fit(pop, data, init, max_iter=200)
    fit1, _, _ = sparse_map_fit(pop, data, init, lam=50.0, max_iter=200)
    off = ~np.eye(4, dtype=bool)
    l1_0 = np.abs(np.asarray(fit0["W"]))[off].sum()
    l1_1 = np.abs(np.asarray(fit1["W"]))[off].sum()
    assert l1_1 < 0.5 * l1_0, (l1_0, l1_1)


def test_cross_validate_lambda_runs():
    spec = make_model("sparse_weighted_model", 3)
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(5))
    T = 3000
    stim = np.random.RandomState(0).randn(T, 1)
    S, _ = pop.simulate(jax.random.PRNGKey(6), true, T, stim=stim)
    init = dict(true)
    init["A"] = np.ones((3, 3))
    best, fits, scores = cross_validate_lambda(
        pop, S, stim, init, lambdas=[0.1, 10.0], max_iter=100
    )
    assert best in (0.1, 10.0)
    assert len(fits) == 2 and len(scores) == 2
    assert all(np.isfinite(s) for s in scores)
