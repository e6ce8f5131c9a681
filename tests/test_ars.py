"""ARS tests: exactness on known log-concave densities."""

import numpy as np
import pytest

from theano_pyglm_tpu.inference.ars import adaptive_rejection_sample


def test_standard_normal_moments():
    rng = np.random.RandomState(0)
    h = lambda x: -0.5 * x * x
    hp = lambda x: -x
    xs = np.array([
        adaptive_rejection_sample(h, hp, [-1.0, 1.0], rng=rng) for _ in range(4000)
    ])
    assert abs(xs.mean()) < 0.06
    assert abs(xs.std() - 1.0) < 0.05


def test_gamma_on_half_line():
    rng = np.random.RandomState(1)
    a, b = 3.0, 2.0  # Gamma(3, rate 2): mean 1.5
    h = lambda x: (a - 1) * np.log(x) - b * x
    hp = lambda x: (a - 1) / x - b
    xs = np.array([
        adaptive_rejection_sample(h, hp, [0.5, 3.0], domain=(1e-9, np.inf), rng=rng)
        for _ in range(4000)
    ])
    assert abs(xs.mean() - a / b) < 0.06
    assert abs(xs.var() - a / b**2) < 0.08


def test_requires_mode_bracketing():
    h = lambda x: -0.5 * x * x
    hp = lambda x: -x
    with pytest.raises(ValueError):
        adaptive_rejection_sample(h, hp, [1.0, 2.0])  # both right of mode


def test_update_bias_ars_matches_conditional():
    """update_bias_ars draws must follow the analytic bias conditional
    (validated against a quadrature CDF with a KS test) — ARS wired into the
    inference surface, not just a parity checkbox."""
    import jax
    from scipy.stats import kstest

    from theano_pyglm_tpu import Population, make_model
    from theano_pyglm_tpu.inference.ars import update_bias_ars

    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 400)
    data = pop.prepare_data(S)

    rng = np.random.RandomState(0)
    draws = np.array([
        np.asarray(update_bias_ars(rng, pop, true, data)["bias"])
        for _ in range(400)
    ])  # (400, N) — independent exact draws (conditional ignores own bias)

    # quadrature CDF of the analytic conditional for neuron 0
    I = np.asarray(pop.total_current(true, data))
    I_wo = I - np.asarray(true["bias"])[None, :]
    c1 = np.asarray(data["S"]).sum(0)[0]
    c2 = np.exp(I_wo[:, 0]).sum() * pop.dt
    mu, sigma = pop.spec["bias"]["mu"], pop.spec["bias"]["sigma"]
    grid = np.linspace(draws[:, 0].min() - 1, draws[:, 0].max() + 1, 4001)
    logp = c1 * grid - c2 * np.exp(grid) - 0.5 * ((grid - mu) / sigma) ** 2
    p = np.exp(logp - logp.max())
    cdf_grid = np.cumsum(p)
    cdf_grid /= cdf_grid[-1]

    stat, pval = kstest(draws[:, 0], lambda x: np.interp(x, grid, cdf_grid))
    assert pval > 1e-3, (stat, pval)
