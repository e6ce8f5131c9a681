"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.parallel import (
    chain_mesh,
    gibbs_sample_chains,
    make_sharded_value_and_grad,
)
from theano_pyglm_tpu.parallel.mesh import neuron_mesh


@pytest.fixture(scope="module")
def er_problem():
    spec = make_model("sparse_weighted_model", 4, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 400)
    return pop, pop.prepare_data(S)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_chain_parallel_sampling(er_problem):
    pop, data = er_problem
    mesh = chain_mesh(8)
    samples, diag, _ = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(2),
        n_chains=8, n_samples=10, n_warmup=10, chunk_size=10, mesh=mesh,
    )
    assert samples["W"].shape[:2] == (10, 8)
    assert np.all(np.isfinite(samples["W"]))
    # chains differ (independent randomness)
    assert np.std(samples["W"][-1], axis=0).max() > 1e-6
    assert "convergence" in diag


def test_chain_device_thinning_matches_raw_stream(er_problem):
    """thin | chunk_size engages the device-thinned path in
    _run_chunk_chains; retained draws must be bit-identical to every
    thin-th draw of the unthinned chains (same chunk boundaries → same
    per-sweep key stream)."""
    pop, data = er_problem
    kw = dict(n_chains=2, n_warmup=10, chunk_size=20)
    full, _, _ = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(5), n_samples=20, **kw
    )
    thinned, _, _ = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(5), n_samples=4, thin=5, **kw
    )
    assert thinned["W"].shape[:2] == (4, 2)
    np.testing.assert_array_equal(thinned["W"], full["W"][4::5])
    np.testing.assert_array_equal(thinned["A"], full["A"][4::5])


def test_chain_convergence_diagnostics(er_problem):
    pop, data = er_problem
    samples, diag, _ = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(3),
        n_chains=4, n_samples=50, n_warmup=30, chunk_size=50,
    )
    conv = diag["convergence"]
    assert "W" in conv and np.isfinite(conv["W"]["min_ess"])
    assert conv["W"]["min_ess"] > 1.0


def test_neuron_sharded_grad_matches_unsharded():
    """shard_map neuron-parallel objective must equal the single-device one
    bit-for-bit (up to float64 roundoff) — validates the sharded model path."""
    spec = make_model("sparse_weighted_model", 8, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    S = jnp.asarray(rng.poisson(0.05, size=(200, 8)).astype(float))
    data = pop.prepare_data(S)

    mesh = neuron_mesh(8)
    vg = make_sharded_value_and_grad(pop, mesh, params, data)
    val_sh, grad_sh = vg(params, data)

    def obj(p, d):
        return -pop.log_joint(p, d)

    val, grad = jax.value_and_grad(obj)(params, data)
    # cross-shard reduction order differs; agreement is to fp64 roundoff
    np.testing.assert_allclose(float(val_sh), float(val), rtol=1e-8)
    for k in grad:
        if np.asarray(grad[k]).dtype.kind == "f":
            np.testing.assert_allclose(
                np.asarray(grad_sh[k]), np.asarray(grad[k]), rtol=1e-6, atol=1e-8
            )


def test_parallel_map_matches_single_device():
    from theano_pyglm_tpu.inference import map_fit
    from theano_pyglm_tpu.parallel.map import parallel_map_fit

    spec = make_model("sparse_weighted_model", 8, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 500)
    data = pop.prepare_data(S)
    init = pop.sample(jax.random.PRNGKey(7))

    fit1, logp1, _ = map_fit(pop, data, init, max_iter=150)
    mesh = neuron_mesh(8)
    fit8, logp8, _ = parallel_map_fit(pop, data, init, mesh, max_iter=150)
    # both converge to the same optimum of the same (convex-ish) objective
    assert abs(float(logp1) - float(logp8)) < 1e-3 * max(1.0, abs(float(logp1)))
    np.testing.assert_allclose(
        np.asarray(fit8["bias"]), np.asarray(fit1["bias"]), atol=2e-3
    )


def test_chain_init_jitter_decorrelates():
    """MAP-broadcast init with jitter must give distinct chains (identical
    inits defeat split-R̂'s purpose)."""
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300)
    data = pop.prepare_data(S)
    samples, _, _ = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(2), n_chains=3, n_samples=5, n_warmup=5,
        chunk_size=5, init_params=true, init_jitter=0.05,
    )
    first = samples["bias"][0]  # (3, N) first draw per chain
    assert np.std(first, axis=0).max() > 1e-4
