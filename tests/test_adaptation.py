"""Tests for the anti-frozen-chain machinery (round-2 flagship post-mortem).

The round-2 flagship shipped with chains frozen at their inits (R̂ up to
3.4e8) because (a) the glm block's single HMC ε was pinned by the stiffest
neuron and (b) one chain's dual averaging could end warmup at a step size
the post-warmup region rejects outright. The fixes — the Laplace glm block
(tested via the Geweke suite) and cross-chain consensus adaptation
(`parallel.chains._share_adaptation`) — get DIRECT coverage here, plus a
mid-scale frozen-chain regression test reproducing the failure scenario.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference.mcmc import gibbs_sample, init_mcmc_state
from theano_pyglm_tpu.parallel.chains import _share_adaptation, gibbs_sample_chains


def _batched_states(pop, n_chains=4, step_size=0.02):
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    inits = jax.vmap(pop.sample)(keys)
    return jax.vmap(lambda p: init_mcmc_state(pop, p, step_size=step_size))(inits)


def test_share_adaptation_applies_median():
    """One chain ends warmup with an absurd ε / mass scale; after
    _share_adaptation every chain must carry the across-chain median in
    BOTH log_eps_avg (what sampling actually uses) and step_size, and the
    per-coordinate scale must be the elementwise across-chain median."""
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    states = _batched_states(pop, n_chains=4, step_size=0.02)

    glm = states["glm"]
    # chain 0: pathological adaptation outcome (ε ~ e^-20, scale 1e-6)
    log_eps = glm.log_eps_avg.at[0].set(-20.0)
    scale = {k: v.at[0].set(1e-6) for k, v in glm.scale.items()}
    states = dict(states)
    states["glm"] = glm._replace(
        log_eps_avg=log_eps,
        step_size=jnp.exp(log_eps),
        scale=scale,
    )

    shared = _share_adaptation(states)
    med = float(jnp.median(log_eps))
    out = shared["glm"]
    np.testing.assert_allclose(np.asarray(out.log_eps_avg), med, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.step_size), np.exp(med), rtol=1e-6)
    for k, v in out.scale.items():
        expect = np.median(np.asarray(scale[k]), axis=0)
        for c in range(4):
            np.testing.assert_allclose(np.asarray(v)[c], expect, rtol=1e-12)
    # other blocks untouched in structure
    assert set(shared.keys()) == set(states.keys())


def test_share_adaptation_leaves_params_alone():
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    states = _batched_states(pop, n_chains=3)
    shared = _share_adaptation(states)
    for k in states["params"]:
        np.testing.assert_array_equal(
            np.asarray(shared["params"][k]), np.asarray(states["params"][k])
        )
    # positions inside HMC blocks are untouched too
    for k, v in states["glm"].position.items():
        np.testing.assert_array_equal(np.asarray(shared["glm"].position[k]), np.asarray(v))


def test_bias_update_ars_composes():
    """gibbs_sample(bias_update='ars') must run, replace the bias between
    device chunks, and keep every draw finite (exactness is covered by the
    ARS Geweke in test_geweke.py)."""
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 250)
    data = pop.prepare_data(S)
    samples, diag, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2),
        n_samples=6, n_warmup=4, chunk_size=2, bias_update="ars",
    )
    assert samples["bias"].shape[0] == 6
    assert np.all(np.isfinite(samples["bias"]))


def test_bias_update_rejects_unknown():
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    S = np.zeros((50, 2))
    data = pop.prepare_data(S)
    with pytest.raises(ValueError, match="bias_update"):
        gibbs_sample(pop, data, jax.random.PRNGKey(0), n_samples=2,
                     n_warmup=2, bias_update="nope")


@pytest.mark.slow
def test_chains_do_not_freeze_midscale():
    """Regression for the exact round-2 flagship failure: N=10, long-ish T,
    4 chains from jittered MAP-ish inits. After a few hundred sweeps the
    glm-block groups must NOT be frozen at their inits: split-R̂ of bias
    and w_stim must come down to ~1 and every chain must have moved.

    (The round-2 run shipped with R̂(w_stim) = 3.4e8 — chains parked at
    their inits by a pinned HMC ε. The Laplace glm block has no step size,
    so this failure mode is structurally gone; this test keeps it gone.)
    """
    N, T = 10, 20_000
    spec = make_model("sparse_weighted_model", N)
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    stim = rng.randn(T, 1)
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, T, stim=stim)
    data = pop.prepare_data(S, stim=stim)

    from theano_pyglm_tpu.inference.smart_init import smart_initialize

    init = smart_initialize(pop, data, jax.random.PRNGKey(5))
    samples, diag, _ = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(2), n_chains=4,
        n_samples=150, n_warmup=150, chunk_size=50,
        init_params=init, init_jitter=0.05,
    )
    conv = diag["convergence"]
    for grp in ("bias", "w_stim"):
        rhat = conv[grp]["max_rhat"]
        assert rhat < 1.2, (grp, rhat, "glm block frozen — round-2 regression")
    # every chain moved away from its init
    b = samples["bias"]  # (n, C, N)
    move = np.abs(b[-1] - b[0]).max(axis=-1)  # per chain
    assert np.all(move > 1e-3), move
