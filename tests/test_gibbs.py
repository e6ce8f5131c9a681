"""Exactness tests for the discrete Gibbs machinery.

Strategy (SURVEY.md §4 "statistical tests"): on models tiny enough to
*enumerate*, the empirical distribution of a long Gibbs chain must match the
exact conditional distribution computed by brute force.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference.gibbs import (
    update_adjacency,
    update_er_rho,
    update_sbm_hypers,
    update_sbm_types,
    update_sbm_types_collapsed,
)


def _tv(p, q):
    return 0.5 * np.abs(p - q).sum()


def test_adjacency_sweep_targets_exact_conditional():
    """Empirical law of A under repeated collapsed-Gibbs sweeps vs brute-force
    enumeration of all 2^(N²) adjacency configurations."""
    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    spec["network"]["graph"]["rho"] = 0.3
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    T = 150
    S, _ = pop.simulate(jax.random.PRNGKey(1), params, T)
    data = pop.prepare_data(S)

    # exact: enumerate 16 configs
    configs = list(itertools.product([0.0, 1.0], repeat=4))
    logw = []
    for c in configs:
        A = jnp.asarray(np.array(c).reshape(2, 2))
        p = {**params, "A": A}
        ll = float(pop.log_likelihood(p, data))
        rho = 0.3
        lp = float(np.sum(np.where(np.array(c) > 0, np.log(rho), np.log(1 - rho))))
        logw.append(ll + lp)
    logw = np.array(logw)
    exact = np.exp(logw - logw.max())
    exact /= exact.sum()

    # chain of sweeps
    @jax.jit
    def step(carry, k):
        p = update_adjacency(k, pop, carry, data)
        return p, p["A"]

    n = 6000
    _, As = jax.lax.scan(step, params, jax.random.split(jax.random.PRNGKey(2), n))
    As = np.asarray(As).reshape(n, 4)[1000:]  # burn-in
    idx = (As * np.array([8, 4, 2, 1])).sum(axis=1).astype(int)
    # config order: product(...) big-endian over (A00,A01,A10,A11)
    emp = np.bincount(idx, minlength=16).astype(float)
    emp /= emp.sum()
    assert _tv(emp, exact) < 0.08, (emp, exact)


def test_sbm_type_gibbs_targets_exact_conditional():
    spec = make_model("sbm_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    K = 2
    params["pi"] = jnp.array([0.6, 0.4])
    params["Bm"] = jnp.array([[0.8, 0.2], [0.3, 0.6]])

    A = np.asarray(params["A"])
    pi = np.asarray(params["pi"])
    Bm = np.asarray(params["Bm"])

    # exact enumeration over y ∈ {0,1}^3  (y conditional depends on A, π, B only)
    configs = list(itertools.product(range(K), repeat=3))
    logw = []
    for y in configs:
        y = np.array(y)
        P = Bm[y[:, None], y[None, :]]
        lw = np.log(pi[y]).sum() + (A * np.log(P) + (1 - A) * np.log(1 - P)).sum()
        logw.append(lw)
    logw = np.array(logw)
    exact = np.exp(logw - logw.max())
    exact /= exact.sum()

    @jax.jit
    def step(carry, k):
        p = update_sbm_types(k, pop, carry)
        return p, p["y"]

    n = 8000
    _, ys = jax.lax.scan(step, params, jax.random.split(jax.random.PRNGKey(3), n))
    ys = np.asarray(ys)[2000:]
    idx = ys[:, 0] * 4 + ys[:, 1] * 2 + ys[:, 2]
    emp = np.bincount(idx, minlength=8).astype(float)
    emp /= emp.sum()
    assert _tv(emp, exact) < 0.05, (emp, exact)


def test_sbm_type_collapsed_gibbs_targets_exact_marginal():
    """The collapsed type kernel (π, B marginalized) iterated alone must
    target the exact MARGINAL p(y | A): brute-force enumeration of y ∈ K^N
    with Dirichlet–multinomial class-count evidence and Beta–Bernoulli
    block-edge evidence over all N² ordered pairs (self-pairs included,
    matching update_sbm_hypers' counting)."""
    from scipy.special import betaln, gammaln

    spec = make_model("sbm_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    gspec = pop.spec["network"]["graph"]
    K = int(gspec.get("K", 2))
    alpha0 = float(gspec.get("alpha0", 1.0))
    b0, b1 = [float(v) for v in gspec.get("B_prior", (1.0, 1.0))]
    A = np.asarray(params["A"])
    N = A.shape[0]

    configs = list(itertools.product(range(K), repeat=N))
    logw = []
    for y in configs:
        y = np.array(y)
        cnt = np.bincount(y, minlength=K).astype(float)
        onehot = np.eye(K)[y]
        E = onehot.T @ A @ onehot
        P = np.outer(cnt, cnt)
        lw = gammaln(alpha0 + cnt).sum() + betaln(b0 + E, b1 + (P - E)).sum()
        logw.append(lw)
    logw = np.array(logw)
    exact = np.exp(logw - logw.max())
    exact /= exact.sum()

    @jax.jit
    def step(carry, k):
        p = update_sbm_types_collapsed(k, pop, carry)
        return p, p["y"]

    n = 8000
    _, ys = jax.lax.scan(step, params, jax.random.split(jax.random.PRNGKey(3), n))
    ys = np.asarray(ys)[2000:]
    idx = ys[:, 0] * 4 + ys[:, 1] * 2 + ys[:, 2]
    emp = np.bincount(idx, minlength=8).astype(float)
    emp /= emp.sum()
    assert _tv(emp, exact) < 0.05, (emp, exact)


def test_sbm_collapsed_escapes_adapted_B_mode():
    """Mobility regression for the acceptance config-4 stall: start from a
    PARTIAL assignment whose explicit B has conjugately adapted to it (the
    parked-chain state). The collapsed (y, then hypers) pair must still
    recover the planted partition."""
    from theano_pyglm_tpu.utils.diagnostics import adjusted_rand_index

    N = 16
    spec = make_model("sbm_weighted_model", N, bkgd={"type": "none"})
    pop = Population(spec)
    params = dict(pop.sample(jax.random.PRNGKey(0)))
    y_true = np.array([0] * (N // 2) + [1] * (N - N // 2))
    Bm = np.array([[0.7, 0.05], [0.05, 0.7]], dtype=np.float32)
    rng = np.random.RandomState(0)
    P = Bm[y_true[:, None], y_true[None, :]]
    A = (rng.rand(N, N) < P).astype(np.float32)
    np.fill_diagonal(A, 1.0)
    params["A"] = jnp.asarray(A)
    # parked state: 5 of 16 neurons misassigned, B adapted to that partition
    y_bad = y_true.copy()
    y_bad[[0, 3, 5, 9, 12]] = 1 - y_bad[[0, 3, 5, 9, 12]]
    params["y"] = jnp.asarray(y_bad)
    params = update_sbm_hypers(jax.random.PRNGKey(1), pop, params)

    @jax.jit
    def step(key, params):
        k1, k2 = jax.random.split(key)
        params = update_sbm_types_collapsed(k1, pop, params)
        return update_sbm_hypers(k2, pop, params)

    key = jax.random.PRNGKey(2)
    aris = []
    for it in range(40):
        key, k = jax.random.split(key)
        params = step(k, params)
        if it >= 20:
            aris.append(adjusted_rand_index(np.asarray(params["y"]), y_true))
    assert np.mean(aris) >= 0.9, np.mean(aris)


def test_er_rho_conjugate_posterior():
    spec = make_model("sparse_weighted_model", 4, bkgd={"type": "none"})
    spec["network"]["graph"].update({"infer_rho": True, "rho_prior": (2.0, 3.0)})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    A = np.asarray(params["A"])
    e, tot = A.sum(), A.size
    a_post, b_post = 2.0 + e, 3.0 + tot - e
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    rhos = np.array([float(update_er_rho(k, pop, params)["rho"]) for k in keys[:500]])
    want_mean = a_post / (a_post + b_post)
    assert abs(rhos.mean() - want_mean) < 0.02


def test_sbm_hyper_conjugate_posterior():
    spec = make_model("sbm_weighted_model", 4, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    A = np.asarray(params["A"])
    y = np.asarray(params["y"])
    K = 2
    onehot = np.eye(K)[y]
    edges = onehot.T @ A @ onehot
    pairs = np.outer(onehot.sum(0), onehot.sum(0))
    keys = jax.random.split(jax.random.PRNGKey(1), 500)
    Bs = np.stack([np.asarray(update_sbm_hypers(k, pop, params)["Bm"]) for k in keys])
    want = (1.0 + edges) / (2.0 + pairs)  # Beta(1+e, 1+pairs-e) mean
    np.testing.assert_allclose(Bs.mean(axis=0), want, atol=0.06)

    pis = np.stack([np.asarray(update_sbm_hypers(k, pop, params)["pi"]) for k in keys])
    counts = onehot.sum(0)
    want_pi = (1.0 + counts) / (2.0 + counts.sum())
    np.testing.assert_allclose(pis.mean(axis=0), want_pi, atol=0.06)


def test_weight_hyper_conjugate_posterior():
    """NIG update: with a dominant data term the sampled (mu, sigma) must
    match the empirical off-diagonal W moments."""
    from theano_pyglm_tpu.inference.gibbs import update_weight_hypers

    spec = make_model("sparse_weighted_model", 6, bkgd={"type": "none"})
    spec["network"]["weight"]["infer_hypers"] = True
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    W = rng.normal(1.3, 0.7, (6, 6))
    params["W"] = jnp.asarray(W)
    keys = jax.random.split(jax.random.PRNGKey(1), 400)
    mus = np.array([float(update_weight_hypers(k, pop, params)["W_mu"]) for k in keys])
    sigs = np.array([float(update_weight_hypers(k, pop, params)["W_sigma"]) for k in keys])
    off = ~np.eye(6, dtype=bool)
    assert abs(mus.mean() - W[off].mean()) < 0.15
    assert abs(sigs.mean() - W[off].std()) < 0.2


def test_mcmc_with_weight_hypers():
    from theano_pyglm_tpu.inference import gibbs_sample

    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    spec["network"]["weight"]["infer_hypers"] = True
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 300)
    data = pop.prepare_data(S)
    samples, diag, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2), n_samples=15, n_warmup=15, chunk_size=15
    )
    assert samples["W_mu"].shape == (15,)
    assert np.all(samples["W_sigma"] > 0)
    assert np.std(samples["W_sigma"]) > 1e-4  # hypers actually move


@pytest.mark.slow
def test_collapsed_acceptance_nonstationary_drive():
    """Regression guard for the birth–death proposal's time subsample: the
    Newton/Laplace fit runs on STRATIFIED blocks spread over [0, T), so a
    strongly nonstationary drive (rate ramp) must not crater acceptance the
    way a contiguous-prefix window could (round-1 VERDICT weak #8). T is
    chosen above the 16384-bin threshold so the subsample actually engages."""
    from theano_pyglm_tpu.inference.gibbs import update_adjacency_collapsed

    spec = make_model("sparse_weighted_model", 4, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    T = 40_960
    # 1 Hz -> 30 Hz ramp: the late window looks nothing like the early one
    rates = np.linspace(1.0, 30.0, T)[:, None] * np.ones((1, 4))
    S = rng.poisson(rates * pop.dt).astype(np.float32)
    data = pop.prepare_data(S)
    accs = []
    params_c = params
    for i in range(8):
        params_c, acc = update_adjacency_collapsed(
            jax.random.PRNGKey(i + 1), pop, params_c, data, return_accept=True
        )
        accs.append(float(acc))
    assert np.mean(accs) > 0.5, accs


def test_collapsed_row_batch_matches_vmap():
    """row_batch streams rows via lax.map instead of vmap (long-context
    mode): with the same key it must produce the identical update."""
    from theano_pyglm_tpu.inference.gibbs import update_adjacency_collapsed

    spec = make_model("sparse_weighted_model", 5, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 500)
    data = pop.prepare_data(S)
    k = jax.random.PRNGKey(3)
    full = update_adjacency_collapsed(k, pop, true, data)
    batched = update_adjacency_collapsed(k, pop, true, data, row_batch=2)
    np.testing.assert_array_equal(np.asarray(full["A"]), np.asarray(batched["A"]))
    np.testing.assert_allclose(
        np.asarray(full["W"]), np.asarray(batched["W"]), rtol=1e-12
    )


def test_glm_laplace_escapes_remote_state():
    """Regression (round-3 review): from a state hundreds of prior sds out
    (pathological init; softplus's stabilized LL stays FINITE and nearly
    flat there), a pure Laplace independence proposal has far lighter
    tails than the target — q(θ_cur) ~ e^{−10⁵} vs π(θ_cur) ~ e^{−10⁴} —
    so exact MH rejected every exit forever: a permanently frozen
    (bias, w_stim) chain. The defensive 10% prior mixture in
    _laplace_mh_block bounds the reverse density and must free the block
    within a few sweeps (the same cure as the birth–death weight
    proposal). The _bin_ll_derivs NaN sanitizer covers the companion
    failure where autodiff curvature is non-finite."""
    from theano_pyglm_tpu.inference.gibbs import update_glm_laplace

    spec = make_model(
        "sparse_weighted_model", 3, bkgd={"type": "none"},
        nlin={"type": "softplus"},
    )
    pop = Population(spec)
    params = dict(pop.sample(jax.random.PRNGKey(0)))
    S, _ = pop.simulate(jax.random.PRNGKey(1), params, 400)
    S = np.array(S)  # writable copy
    S[50, :] = 1.0  # guarantee spiking bins exist
    data = pop.prepare_data(jnp.asarray(S))
    # pathological state: rate underflows everywhere, incl. spike bins
    params["bias"] = jnp.full((3,), -200.0)

    theta0 = params["bias"][:, None] * 0 + 1.5  # sane state-independent seed
    p = params
    moved = False
    for i in range(5):
        p = update_glm_laplace(jax.random.PRNGKey(10 + i), pop, p, data, theta0)
        assert np.isfinite(np.asarray(p["bias"])).all()
        moved = moved or not np.allclose(np.asarray(p["bias"]), -200.0)
    assert moved, "glm Laplace block frozen at the underflow state"


def test_glm_laplace_shared_escapes_remote_state():
    """Regression (round-3 verdict #4): the global w_stim_shared MH in
    update_glm_laplace_shared proposed pure N(w*, (−H*)⁻¹) with no prior
    mixture — the same light-tailed independence proposal whose freeze
    mode the round-3 mixture fixed in _laplace_mh_block and the
    birth–death move. From a remote w_shared (hundreds of prior sds out,
    softplus keeping the LL finite) the reverse density underflows every
    sweep and the GLOBAL filter freezes forever, masked because the
    per-neuron (bias, gain) sub-block keeps moving. The 10% prior mixture
    must free it within a few sweeps."""
    from theano_pyglm_tpu.inference.gibbs import update_glm_laplace_shared

    spec = make_model(
        "sparse_weighted_model", 3, nlin={"type": "softplus"},
        bkgd={
            "type": "shared", "D_stim": 1, "dt_max": 0.3,
            "mu": 0.0, "sigma": 0.5,
            "basis": {"type": "cosine", "n_bas": 3, "a": 1.0, "b": 1.0,
                      "norm": True},
        },
    )
    pop = Population(spec)
    params = dict(pop.sample(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)
    stim = jnp.asarray(rng.randn(400, 1))
    S, _ = pop.simulate(jax.random.PRNGKey(1), params, 400, stim=stim)
    S = np.array(S)
    S[50, :] = 1.0  # guarantee spiking bins exist
    data = pop.prepare_data(jnp.asarray(S), stim=stim)
    DB = data["X_stim"].shape[1]
    # pathological state: the global filter parked ~200 prior sds out
    params["w_stim_shared"] = jnp.full((DB,), -100.0)

    theta0 = {  # sane state-independent Newton seed
        "bias": jnp.full((3,), 1.5),
        "gain": jnp.ones((3,)),
        "w_stim_shared": jnp.zeros((DB,)),
    }
    p = params
    moved = False
    for i in range(5):
        p = update_glm_laplace_shared(
            jax.random.PRNGKey(10 + i), pop, p, data, theta0
        )
        assert np.isfinite(np.asarray(p["w_stim_shared"])).all()
        moved = moved or not np.allclose(
            np.asarray(p["w_stim_shared"]), -100.0
        )
    assert moved, "global shared-filter MH frozen at the remote state"


def test_latent_rotation_is_exact_gauge_move():
    """The Haar orthogonal move on the latent locations must (a) leave every
    identifiable quantity untouched — pairwise distances, edge probabilities,
    the graph log-prior (the move's MH acceptance is exactly 1 because the
    distance posterior is rotation-invariant) — while (b) actually moving the
    raw coordinates, and (c) covering reflections (det Q = ±1 both occur)."""
    from theano_pyglm_tpu.inference.gibbs import update_latent_rotation

    spec = make_model("distance_weighted_model", 6, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    locs0 = np.asarray(params["locs"], np.float64)
    d0 = np.linalg.norm(locs0[:, None] - locs0[None, :], axis=-1)
    lp0 = float(pop.graph.log_prior(params))

    dets = []
    for seed in range(8):
        out = update_latent_rotation(jax.random.PRNGKey(seed), pop, params)
        locs1 = np.asarray(out["locs"], np.float64)
        d1 = np.linalg.norm(locs1[:, None] - locs1[None, :], axis=-1)
        np.testing.assert_allclose(d1, d0, rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            float(pop.graph.log_prior(out)), lp0, rtol=1e-6
        )
        assert not np.allclose(locs1, locs0, atol=1e-3), "rotation was a no-op"
        # recover the applied Q by least squares; must be orthogonal
        Q, *_ = np.linalg.lstsq(locs0, locs1, rcond=None)
        np.testing.assert_allclose(Q.T @ Q, np.eye(2), atol=1e-4)
        dets.append(np.linalg.det(Q))
    dets = np.asarray(dets)
    assert (dets > 0.5).any() and (dets < -0.5).any(), (
        f"Haar draw never produced a reflection across 8 seeds: dets={dets}"
    )

    # no-op on graphs without locations
    spec2 = make_model("sparse_weighted_model", 4, bkgd={"type": "none"})
    pop2 = Population(spec2)
    p2 = pop2.sample(jax.random.PRNGKey(1))
    out2 = update_latent_rotation(jax.random.PRNGKey(2), pop2, p2)
    assert out2 is p2


def test_procrustes_align_undoes_rotation():
    from theano_pyglm_tpu.plotting import procrustes_align

    rng = np.random.RandomState(0)
    X = rng.randn(9, 2)
    th = 1.1
    Q = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    Q = Q @ np.diag([1.0, -1.0])  # rotation + reflection
    np.testing.assert_allclose(procrustes_align(X @ Q, X), X, atol=1e-10)
