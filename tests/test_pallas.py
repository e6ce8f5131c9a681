"""Pallas fused-LL kernel tests (interpreter mode on CPU; the same kernel
compiles on TPU — SURVEY.md §7 step 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.ops.pallas_kernels import fused_poisson_ll


@pytest.fixture(autouse=True)
def f32_mode():
    """The Pallas path is float32; run these tests with x64 disabled."""
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def test_kernel_matches_xla(rng):
    T, NB, N = 700, 15, 3  # deliberately not tile-aligned
    x = jnp.asarray(rng.randn(T, NB).astype("f") * 0.1)
    u = jnp.asarray(rng.randn(NB, N).astype("f") * 0.3)
    ir = jnp.asarray(rng.randn(T, N).astype("f") + 1.0)
    s = jnp.asarray(rng.poisson(0.05, (T, N)).astype("f"))
    dt = 1e-3

    def ref(u, ir):
        I = ir + x @ u
        return jnp.sum(s * (I + np.log(dt)) - jnp.exp(I) * dt)

    want, (gu_w, gir_w) = jax.value_and_grad(ref, argnums=(0, 1))(u, ir)
    got, (gu, gir) = jax.value_and_grad(
        lambda u, ir: fused_poisson_ll(x, u, ir, s, dt, True), argnums=(0, 1)
    )(u, ir)
    assert abs(float(want - got)) < 1e-4 * abs(float(want))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_w), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gir), np.asarray(gir_w), rtol=1e-4, atol=1e-5)


def test_kernel_chain_vmap_matches_xla(rng):
    """Chain-vmapped fused op routes to the (T_tiles, chains) kernels and
    must match the vmapped XLA reference in value and gradient."""
    T, NB, N, C = 700, 15, 3, 4
    x = jnp.asarray(rng.randn(T, NB).astype("f") * 0.1)
    U = jnp.asarray(rng.randn(C, NB, N).astype("f") * 0.3)
    IR = jnp.asarray(rng.randn(C, T, N).astype("f") + 1.0)
    s = jnp.asarray(rng.poisson(0.05, (T, N)).astype("f"))
    dt = 1e-3

    def ref(u, ir):
        I = ir + x @ u
        return jnp.sum(s * (I + np.log(dt)) - jnp.exp(I) * dt)

    want = jax.vmap(ref)(U, IR)
    got = jax.vmap(lambda u, ir: fused_poisson_ll(x, u, ir, s, dt, True))(U, IR)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    gw = jax.vmap(jax.grad(ref, argnums=(0, 1)))(U, IR)
    gg = jax.vmap(
        jax.grad(lambda u, ir: fused_poisson_ll(x, u, ir, s, dt, True), argnums=(0, 1))
    )(U, IR)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_kernel_vmap_broadcast_u_only(rng):
    """Only u batched (i_rest shared): the rule must broadcast the unbatched
    operand rather than mis-indexing it."""
    T, NB, N, C = 600, 8, 2, 3
    x = jnp.asarray(rng.randn(T, NB).astype("f") * 0.1)
    U = jnp.asarray(rng.randn(C, NB, N).astype("f") * 0.3)
    ir = jnp.asarray(rng.randn(T, N).astype("f"))
    s = jnp.asarray(rng.poisson(0.05, (T, N)).astype("f"))
    dt = 1e-3

    def ref(u):
        I = ir + x @ u
        return jnp.sum(s * (I + np.log(dt)) - jnp.exp(I) * dt)

    want = jax.vmap(ref)(U)
    got = jax.vmap(lambda u: fused_poisson_ll(x, u, ir, s, dt, True))(U)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_population_chain_vmap_pallas_matches(rng):
    """Population.log_likelihood under chain-vmap (the multi-chain MCMC
    call pattern) takes the fused path and matches the XLA path."""
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop_ref = Population(spec, use_pallas=False)
    pop_pal = Population(spec, use_pallas=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    stack = jax.vmap(pop_ref.sample)(keys)
    S = rng.poisson(0.05, (600, 3)).astype("f")
    data = pop_ref.prepare_data(S)

    ll_ref = jax.vmap(lambda p: pop_ref.log_likelihood(p, data))(stack)
    ll_pal = jax.vmap(lambda p: pop_pal.log_likelihood(p, data))(stack)
    np.testing.assert_allclose(
        np.asarray(ll_pal), np.asarray(ll_ref), rtol=1e-5, atol=1e-3
    )

    from theano_pyglm_tpu.inference.map import split_params

    opt0, _ = split_params(jax.tree.map(lambda x: x[0], stack))

    def per_chain_grad(pop):
        def f(p):
            opt, frozen = split_params(p)
            return jax.grad(lambda o: pop.log_joint({**frozen, **o}, data))(opt)
        return jax.vmap(f)(stack)

    g_ref = per_chain_grad(pop_ref)
    g_pal = per_chain_grad(pop_pal)
    for k in opt0:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_ref[k]), rtol=2e-3, atol=2e-4
        )


def test_population_pallas_path_matches(rng):
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop_ref = Population(spec, use_pallas=False)
    pop_pal = Population(spec, use_pallas=True)
    params = pop_ref.sample(jax.random.PRNGKey(0))
    S = rng.poisson(0.05, (600, 3)).astype("f")
    data = pop_ref.prepare_data(S)

    ll_ref = float(pop_ref.log_likelihood(params, data))
    ll_pal = float(pop_pal.log_likelihood(params, data))
    assert abs(ll_ref - ll_pal) < 1e-3 * max(1.0, abs(ll_ref))

    from theano_pyglm_tpu.inference.map import split_params

    opt, frozen = split_params(params)
    g_ref = jax.grad(lambda o: pop_ref.log_joint({**frozen, **o}, data))(opt)
    g_pal = jax.grad(lambda o: pop_pal.log_joint({**frozen, **o}, data))(opt)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_ref[k]), rtol=2e-3, atol=2e-4
        )
