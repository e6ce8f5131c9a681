"""Checkpoint/resume tests: exact continuation of the sampler state."""

import os

import jax
import numpy as np

from theano_pyglm_tpu import Population, make_model
from theano_pyglm_tpu.inference.mcmc import init_mcmc_state
from theano_pyglm_tpu.utils.checkpoints import latest_step, restore_checkpoint, save_checkpoint


def test_roundtrip_exact(tmp_path):
    spec = make_model("sparse_weighted_model", 3, bkgd={"type": "none"})
    pop = Population(spec)
    params = pop.sample(jax.random.PRNGKey(0))
    state = init_mcmc_state(pop, params)
    key = jax.random.PRNGKey(123)

    d = os.path.join(tmp_path, "ckpt")
    save_checkpoint(d, 7, state, key)
    assert latest_step(d) == 7

    restored, key_r, step = restore_checkpoint(d, template=state)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key_r)), np.asarray(jax.random.key_data(key))
    )
    for k in state["params"]:
        np.testing.assert_array_equal(
            np.asarray(restored["params"][k]), np.asarray(state["params"][k])
        )
    np.testing.assert_allclose(
        float(restored["glm"].step_size), float(state["glm"].step_size)
    )


def test_gibbs_resume_continues_exactly(tmp_path):
    """A checkpointed run that stops early and resumes must reproduce the
    sample stream of an uninterrupted run (same chunk boundaries)."""
    from theano_pyglm_tpu.inference import gibbs_sample

    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    key = jax.random.PRNGKey(7)
    kw = dict(n_warmup=10, chunk_size=10, init_params=true)

    full, _, _ = gibbs_sample(pop, data, key, n_samples=30, **kw)

    d = os.path.join(tmp_path, "ck")
    gibbs_sample(pop, data, key, n_samples=10, checkpoint_dir=d, **kw)
    resumed, _, _ = gibbs_sample(
        pop, data, key, n_samples=30, checkpoint_dir=d, resume=True, **kw
    )
    np.testing.assert_allclose(resumed["W"], full["W"], rtol=1e-12)
    np.testing.assert_array_equal(resumed["A"], full["A"])


def test_gibbs_resume_unaligned_checkpoint_every(tmp_path):
    """checkpoint_every ∤ chunk_size (advisor round-1 medium finding): sample
    chunks between checkpoints must survive a resume — persistence is
    decoupled from checkpoint cadence, and checkpoints fire on boundary
    *crossings*, not exact modulo."""
    from theano_pyglm_tpu.inference import gibbs_sample

    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    key = jax.random.PRNGKey(7)
    kw = dict(n_warmup=10, chunk_size=10, init_params=true)

    full, _, _ = gibbs_sample(pop, data, key, n_samples=40, **kw)

    d = os.path.join(tmp_path, "ck")
    # 20 sampling iters in two chunks; checkpoint_every=100 never hits an
    # exact multiple mid-run — only the forced final checkpoint lands.
    gibbs_sample(pop, data, key, n_samples=20, checkpoint_dir=d,
                 checkpoint_every=100, **kw)
    resumed, _, _ = gibbs_sample(
        pop, data, key, n_samples=40, checkpoint_dir=d,
        checkpoint_every=100, resume=True, **kw
    )
    assert resumed["W"].shape[0] == 40
    np.testing.assert_allclose(resumed["W"], full["W"], rtol=1e-12)


def test_chains_resume_continues_exactly(tmp_path):
    """Multi-chain checkpoint/resume (round-1 gap): a chains run that stops
    early and resumes must reproduce the uninterrupted sample stream."""
    from theano_pyglm_tpu.parallel import gibbs_sample_chains

    spec = make_model("sparse_weighted_model", 2, bkgd={"type": "none"})
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(0))
    S, _ = pop.simulate(jax.random.PRNGKey(1), true, 200)
    data = pop.prepare_data(S)
    key = jax.random.PRNGKey(11)
    kw = dict(n_chains=2, n_warmup=10, chunk_size=10, init_params=true)

    full, _, _ = gibbs_sample_chains(pop, data, key, n_samples=30, **kw)

    d = os.path.join(tmp_path, "ckc")
    gibbs_sample_chains(pop, data, key, n_samples=10, checkpoint_dir=d, **kw)
    resumed, _, _ = gibbs_sample_chains(
        pop, data, key, n_samples=30, checkpoint_dir=d, resume=True, **kw
    )
    assert resumed["W"].shape[:2] == (30, 2)
    np.testing.assert_allclose(resumed["W"], full["W"], rtol=1e-12)
    np.testing.assert_array_equal(resumed["A"], full["A"])
