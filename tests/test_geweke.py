"""Geweke joint-distribution test — the gold-standard MCMC correctness check
(SURVEY.md §4 "statistical tests").

Successive-conditional simulator: alternate (a) one transition of the
posterior sampler given current data, (b) re-simulating data given current
params. If every update targets its exact conditional, the stationary law of
params is the PRIOR — so moments of the chain must match prior moments. Any
bias in HMC acceptance, the collapsed (A,W) birth–death move, or the
conjugate updates shows up as drift away from the prior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference.mcmc import init_mcmc_state, make_sweep


@pytest.mark.slow
def test_geweke_er_model():
    N, T = 2, 60
    spec = make_model("sparse_weighted_model", N, bkgd={"type": "none"})
    spec["network"]["graph"]["rho"] = 0.4
    pop = Population(spec)

    key = jax.random.PRNGKey(0)
    params = pop.sample(key)

    def joint_step(carry, k):
        state, params = carry
        k1, k2 = jax.random.split(k)
        # (b) fresh data from the current params
        S, _ = pop.simulate(k1, params, T)
        data = pop.prepare_data(S)
        sweep = make_sweep(pop, data, n_leapfrog=5)
        state = dict(state)
        state["params"] = params
        state = sweep(k2, state, jnp.asarray(False))
        return (state, state["params"]), state["params"]

    state = init_mcmc_state(pop, params, step_size=0.03)
    n_iter = 1500
    keys = jax.random.split(jax.random.PRNGKey(1), n_iter)
    # jit the whole successive-conditional chain
    (_, _), samples = jax.jit(
        lambda carry, ks: jax.lax.scan(joint_step, carry, ks)
    )((state, params), keys)

    burn = 300
    W = np.asarray(samples["W"])[burn:]
    A = np.asarray(samples["A"])[burn:]
    bias = np.asarray(samples["bias"])[burn:]

    n_eff = W.shape[0]
    se = lambda sd, rho_corr=10.0: sd / np.sqrt(n_eff / rho_corr)

    # prior moments (spec): W offdiag ~ N(0, 2), diag ~ N(-2, 1);
    # A ~ Bern(0.4); bias ~ N(1.5, 0.5)
    off = ~np.eye(N, dtype=bool)
    assert abs(W[:, off].mean() - 0.0) < 5 * se(2.0), W[:, off].mean()
    assert abs(W[:, np.eye(N, dtype=bool)].mean() + 2.0) < 5 * se(1.0)
    assert abs(A.mean() - 0.4) < 5 * se(0.49)
    assert abs(bias.mean() - 1.5) < 5 * se(0.5)
    # second moments
    assert abs(W[:, off].std() - 2.0) < 0.35
    assert abs(bias.std() - 0.5) < 0.12
