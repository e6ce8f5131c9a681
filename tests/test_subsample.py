"""CPU coverage for the collapsed (A,W) update's proposal-shaping time
subsample (`gibbs.SUBSAMPLE_T`), which normally only engages at flagship
scale (T > 16384) — the round-3 flagship froze (then crashed) twice on
formulations of exactly this path that every small-T test passed. The
constants are module-level so these tests can shrink the threshold and
drive the dynamic-slice subsample machinery on tiny problems.

Exactness note: the subsample only shapes the Newton PROPOSAL; the MH
ratio uses the exact full-T likelihood, so the kernel stays exact for ANY
subsample content. The Geweke below verifies that end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theano_pyglm_tpu.inference.gibbs as gibbs
from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference.gibbs import update_adjacency_collapsed


@pytest.fixture
def tiny_subsample(monkeypatch):
    """Shrink the subsample geometry so T=200-ish already takes the
    subsampled branch (8 blocks of 8 bins)."""
    monkeypatch.setattr(gibbs, "SUBSAMPLE_T", 64)
    monkeypatch.setattr(gibbs, "SUBSAMPLE_BLK", 8)


def test_subsample_path_mixes_and_stays_finite(tiny_subsample):
    """The subsampled branch runs, adjacency actually mixes (the frozen-
    entry failure mode), and W stays finite."""
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), params, 300)
    data = pop.prepare_data(S)

    @jax.jit
    def step(carry, k):
        p = update_adjacency_collapsed(k, pop, carry, data)
        return p, (p["A"], p["W"])

    _, (As, Ws) = jax.lax.scan(
        step, params, jax.random.split(jax.random.PRNGKey(2), 200)
    )
    As, Ws = np.asarray(As), np.asarray(Ws)
    assert np.isfinite(Ws).all()
    flips = (np.abs(np.diff(As, axis=0)) > 0).sum()
    assert flips > 0, "adjacency frozen under the subsample path"


def test_subsample_proposal_changes_across_sweeps(tiny_subsample):
    """Two sweeps from the same state with different keys must be able to
    reach different states (the deterministic-subsample bug made an
    unlucky entry's proposal identical every sweep)."""
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), params, 300)
    data = pop.prepare_data(S)
    outs = [
        np.asarray(update_adjacency_collapsed(jax.random.PRNGKey(k), pop, params, data)["W"])
        for k in range(6)
    ]
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


@pytest.mark.slow
def test_geweke_er_model_subsampled(tiny_subsample):
    """Full Geweke prior-preservation with the subsample branch ACTIVE —
    the statistical proof that the proposal-only subsample leaves the
    kernel exact (mirrors test_geweke_er_model, which runs at T=60 where
    the branch is dormant)."""
    from theano_pyglm_tpu.inference.mcmc import init_mcmc_state, make_sweep

    N, T = 2, 200  # T > SUBSAMPLE_T(=64): subsampled branch active
    spec = make_model("sparse_weighted_model", N, bkgd={"type": "none"})
    spec["network"]["graph"]["rho"] = 0.4
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))

    def joint_step(carry, k):
        state, params = carry
        k1, k2 = jax.random.split(k)
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
    (_, _), samples = jax.jit(
        lambda carry, ks: jax.lax.scan(joint_step, carry, ks)
    )((state, params), keys)

    burn = 300
    W = np.asarray(samples["W"])[burn:]
    A = np.asarray(samples["A"])[burn:]
    n_eff = W.shape[0]
    se = lambda sd, rho_corr=10.0: sd / np.sqrt(n_eff / rho_corr)
    off = ~np.eye(N, dtype=bool)
    # prior: W offdiag ~ N(0, 2), A ~ Bern(0.4)
    assert abs(W[:, off].mean() - 0.0) < 5 * se(2.0), W[:, off].mean()
    assert abs(A.mean() - 0.4) < 5 * se(0.49), A.mean()
    assert abs(W[:, off].std() - 2.0) < 0.35
