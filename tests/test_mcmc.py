"""End-to-end MCMC driver smoke + sanity tests (acceptance configs 3–5,
miniaturized for CPU)."""

import jax
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference import gibbs_sample


def _run(name, N, T=300, n=25, **spec_over):
    spec = make_model(name, N, bkgd={"type": "none"}, **spec_over)
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, T)
    data = pop.prepare_data(S)
    samples, diag, state = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=n, n_warmup=n, chunk_size=25
    )
    return pop, samples, diag


def test_mcmc_er_model():
    pop, samples, diag = _run("sparse_weighted_model", 3)
    assert samples["W"].shape == (25, 3, 3)
    assert set(np.unique(samples["A"])) <= {0.0, 1.0}
    assert np.all(np.isfinite(samples["W"]))
    assert 0.05 < diag["accept_rate_glm"] <= 1.0


def test_mcmc_sbm_model():
    pop, samples, diag = _run("sbm_weighted_model", 4)
    assert samples["y"].shape == (25, 4)
    assert samples["y"].dtype.kind == "i"
    assert samples["Bm"].shape == (25, 2, 2)
    assert np.all((samples["Bm"] > 0) & (samples["Bm"] < 1))
    assert np.all((samples["pi"] > 0) & (samples["pi"] < 1))


def test_mcmc_distance_model():
    pop, samples, diag = _run("distance_weighted_model", 3)
    assert samples["locs"].shape == (25, 3, 2)
    assert np.all(np.isfinite(samples["locs"]))
    assert "accept_rate_latent" in diag
    # locations actually move (HMC on latents is alive)
    assert samples["locs"].std(axis=0).max() > 1e-4
    # the orientation-gauge move is wired into the sweep: successive draws'
    # orientations are near-independent, so the angle of the first location
    # must visit all four quadrants within 25 sweeps (a pure-HMC chain
    # random-walks the orbit far too slowly for that at these step counts)
    ang = np.arctan2(samples["locs"][:, 0, 1], samples["locs"][:, 0, 0])
    quads = set(np.sign(np.cos(ang)) + 2 * np.sign(np.sin(ang)))
    assert len(quads) >= 3, f"orientation orbit not mixing: quadrants {quads}"


def test_mcmc_complete_graph_no_A_update():
    pop, samples, diag = _run("standard_glm", 2)
    np.testing.assert_allclose(samples["A"], 1.0)


def test_mcmc_thinning():
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    samples, _, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=10, n_warmup=10, thin=3, chunk_size=30
    )
    assert samples["W"].shape[0] == 10


def test_mcmc_thinning_unaligned_chunks():
    """thin ∤ chunk_size: retained draws must still be every thin-th draw of
    the underlying stream (global phase carried across chunk boundaries)."""
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    kw = dict(n_warmup=10, chunk_size=25, init_params=true)
    # same chunk boundaries (25, 5) in both runs → identical key stream →
    # identical underlying 30-draw sample stream.
    full, _, _ = gibbs_sample(pop, data, jax.random.PRNGKey(2), n_samples=30, **kw)
    thinned, _, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=10, thin=3, **kw
    )
    assert thinned["W"].shape[0] == 10
    np.testing.assert_allclose(thinned["W"], full["W"][2::3], rtol=1e-12)


def test_mcmc_thinning_on_device_matches_raw_stream():
    """thin | chunk_size engages the device-thinned nested-scan path
    (collect_every=thin in _run_chunk); its retained draws must be
    bit-identical to every thin-th draw of the unthinned stream (same
    chunk boundaries → same per-sweep key stream)."""
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    kw = dict(n_warmup=10, chunk_size=25, init_params=true)
    full, _, _ = gibbs_sample(pop, data, jax.random.PRNGKey(2), n_samples=25, **kw)
    thinned, _, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=5, thin=5, **kw
    )
    assert thinned["W"].shape[0] == 5
    np.testing.assert_array_equal(thinned["W"], full["W"][4::5])
    np.testing.assert_array_equal(thinned["A"], full["A"][4::5])


def test_annealed_warmup_runs():
    """anneal_frac > 0 tempers the likelihood during warmup (β ramp) and
    must leave sampling exact and finite; 0.0 (default) is the identity."""
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300)
    data = pop.prepare_data(S)
    samples, diag, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=15, n_warmup=30,
        chunk_size=15, anneal_frac=0.5,
    )
    assert np.all(np.isfinite(samples["W"]))
    assert 0.05 < diag["accept_rate_glm"] <= 1.0


def test_smart_init_preserves_fixed_A():
    """Fixed-A graphs (complete) never update A downstream, so smart init
    must not threshold it away (advisor round-1 high-severity finding)."""
    from theano_pyglm_tpu.inference.smart_init import smart_initialize

    spec = make_model("simple_weighted_model", 4, bkgd={"type": "none"})
    pop = Population(spec)
    assert pop.graph.fixed_A
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300)
    data = pop.prepare_data(S)
    params = smart_initialize(pop, data)
    np.testing.assert_allclose(np.asarray(params["A"]), 1.0)


def test_predictive_log_likelihood():
    from theano_pyglm_tpu.inference.predictive import predictive_log_likelihood

    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 400)
    data_tr = pop.prepare_data(S[:300])
    data_ho = pop.prepare_data(S[300:])
    samples, _, _ = gibbs_sample(
        pop, data_tr, jax.random.PRNGKey(2), n_samples=20, n_warmup=20, chunk_size=20
    )
    pll = float(predictive_log_likelihood(pop, samples, data_ho))
    assert np.isfinite(pll)
    # posterior-averaged predictive should beat a random prior draw
    rand = float(pop.log_likelihood(pop.sample(jax.random.PRNGKey(99)), data_ho))
    assert pll > rand - 50.0


def test_mcmc_bernoulli_observation():
    """Bernoulli observations exercise the generic (autodiff) birth-death
    path in the collapsed adjacency update."""
    pop, samples, diag = _run("sparse_weighted_model", 3,
                              observation={"type": "bernoulli"})
    assert np.all(np.isfinite(samples["W"]))
    assert set(np.unique(samples["A"])) <= {0.0, 1.0}


def test_mcmc_shared_tuning_curve():
    spec = make_model("standard_glm", 3, bkgd={
        "type": "shared", "D_stim": 1, "dt_max": 0.2, "mu": 0.0, "sigma": 0.5,
        "basis": {"type": "cosine", "n_bas": 4},
    })
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    stim = rng.randn(300, 1)
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300, stim=stim)
    data = pop.prepare_data(S, stim=stim)
    samples, diag, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=10, n_warmup=10, chunk_size=10
    )
    assert samples["w_stim_shared"].shape == (10, 4)
    assert samples["gain"].shape == (10, 3)


def test_windowed_mass_adaptation_runs():
    """n_warmup >= 40 triggers the Stan-style adaptation windows (variance
    reset + mass application + eps re-anchor) in both drivers."""
    from theano_pyglm_tpu.parallel import gibbs_sample_chains

    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300)
    data = pop.prepare_data(S)
    samples, diag, state = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=10, n_warmup=60, chunk_size=25
    )
    assert np.all(np.isfinite(samples["W"]))
    # the mass matrix was actually applied (scale differs from ones)
    sc = np.asarray(state["glm"].scale["bias"])
    assert not np.allclose(sc, 1.0)

    samples, diag, states = gibbs_sample_chains(
        pop, data, jax.random.PRNGKey(3), n_chains=3, n_samples=10, n_warmup=60,
        chunk_size=25,
    )
    assert np.all(np.isfinite(samples["W"]))
    sc = np.asarray(states["glm"].scale["bias"])
    assert sc.shape[0] == 3 and not np.allclose(sc, 1.0)


def test_mcmc_softplus_nlin():
    """Softplus nonlinearity exercises the generic (autodiff) paths in both
    the likelihood and the birth-death update."""
    pop, samples, diag = _run("sparse_weighted_model", 3, nlin={"type": "softplus"})
    assert np.all(np.isfinite(samples["W"]))
    assert 0.05 < diag["accept_rate_glm"] <= 1.0


def test_mcmc_spatiotemporal_stimulus():
    spec = make_model("spatiotemporal_glm", 2)
    spec["bkgd"]["D_stim"] = 4
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    stim = rng.randn(300, 4)
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300, stim=stim)
    data = pop.prepare_data(S, stim=stim)
    samples, diag, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=10, n_warmup=10, chunk_size=10
    )
    assert samples["w_stim_s"].shape == (10, 2, 4)
    assert samples["w_stim_t"].shape[0] == 10


def test_sweep_stages_decomposition():
    """make_sweep(stages=...) — (a) all stages enabled is bitwise the default
    sweep; (b) a single-stage sweep leaves every other update group's
    parameters untouched (the contract benchmarks/sweep_profile.py relies
    on); (c) unknown stage names are rejected."""
    from theano_pyglm_tpu.inference.mcmc import (
        SWEEP_STAGES,
        init_mcmc_state,
        make_sweep,
    )

    spec = make_model("distance_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    state = init_mcmc_state(pop, true)
    k = jax.random.PRNGKey(7)

    full = make_sweep(pop, data)(k, state, False)
    staged = make_sweep(pop, data, stages=SWEEP_STAGES)(k, state, False)
    for name in full["params"]:
        np.testing.assert_array_equal(
            np.asarray(full["params"][name]), np.asarray(staged["params"][name])
        )

    only_latent = make_sweep(pop, data, stages=("latent",), diagnostic=True)(
        k, state, False
    )
    moved = np.asarray(only_latent["params"]["locs"])
    assert not np.array_equal(moved, np.asarray(true["locs"]))
    for name in ("bias", "w_ir", "A", "W"):
        np.testing.assert_array_equal(
            np.asarray(only_latent["params"][name]), np.asarray(true[name])
        )

    with pytest.raises(ValueError):
        make_sweep(pop, data, stages=("glm", "nonsense"), diagnostic=True)

    # A strict stage subset without the diagnostic acknowledgment must be
    # rejected — a partial sweep silently masquerading as a posterior
    # kernel samples the wrong joint (adjacency depends on the hypers
    # stage's disconnected-weight refresh; round-3 verdict #9).
    with pytest.raises(ValueError, match="diagnostic"):
        make_sweep(pop, data, stages=("adjacency",))
    with pytest.raises(ValueError, match="diagnostic"):
        make_sweep(pop, data, stages=("glm", "imp", "latent", "adjacency",
                                      "discrete", "rotation"))


def test_warmup_chunk_uniform():
    """The warmup phase must compile ONE chunk length: warmup_chunk returns
    the largest c <= chunk_size dividing every adaptation segment (falling
    back to greedy chunk_size when segments share no useful divisor)."""
    from theano_pyglm_tpu.inference.mcmc import warmup_chunk, warmup_schedule

    # flagship shape: segments 150/350/350/150, gcd 50
    assert warmup_chunk(1000, warmup_schedule(1000), 250) == 50
    # no boundaries (short warmup): still avoids the 25+5 remainder pair —
    # 30 = 15 x 2 is one compiled length instead of two
    assert warmup_chunk(30, warmup_schedule(30), 25) == 15
    # coprime segments (1001 -> 150/350/350/151, gcd 1) -> fallback
    assert warmup_chunk(1001, warmup_schedule(1001), 250) == 250
    # the chosen c tiles every segment exactly: replay the driver loop
    for n_warmup, chunk in [(1000, 250), (40, 13), (200, 64)]:
        bounds = warmup_schedule(n_warmup)
        c = warmup_chunk(n_warmup, bounds, chunk)
        it, lengths = 0, set()
        while it < n_warmup:
            next_stop = min([n_warmup] + [b for b, _ in bounds if b > it])
            n = min(c, next_stop - it)
            lengths.add(n)
            it += n
        if c != chunk:  # uniform mode engaged -> exactly one compiled length
            assert lengths == {c}


def test_gibbs_warmup_single_compiled_length(monkeypatch):
    """End-to-end: a boundaried warmup run issues _run_chunk calls with ONE
    distinct n_iters (n_warmup=40 -> boundaries {6,20,34}, segments
    6/14/14/6, gcd 2 <= chunk 13)."""
    from theano_pyglm_tpu.inference import mcmc as mcmc_mod

    seen = []
    real = mcmc_mod._run_chunk

    def spy(sweep, n_iters, key, state, adapt, collect_every, betas=None,
            data=None):
        if bool(adapt):  # warmup chunks only
            seen.append(n_iters)
        return real(sweep, n_iters, key, state, adapt, collect_every, betas,
                    data)

    monkeypatch.setattr(mcmc_mod, "_run_chunk", spy)
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300)
    data = pop.prepare_data(S)
    gibbs_sample(pop, data, jax.random.PRNGKey(2), n_samples=5, n_warmup=40,
                 chunk_size=13)
    assert seen and set(seen) == {2}


def test_sampling_chunk_divisor_and_thin_alignment():
    from theano_pyglm_tpu.inference.mcmc import sampling_chunk

    # divides total, keeps thin alignment: 16000 total, thin 10, chunk 250
    assert sampling_chunk(16000, 250, 10) == 250
    # total=300, chunk=9, thin=1 -> largest divisor of 300 <= 9 is 6
    assert sampling_chunk(300, 9, 1) == 6
    # thin must divide the chosen chunk so device thinning stays engaged
    c = sampling_chunk(300, 25, 5)
    assert c % 5 == 0 and 300 % c == 0 and c <= 25
    # coprime-ish fallback: total prime and > chunk*10 -> greedy chunk
    assert sampling_chunk(1009, 25, 1) == 25
