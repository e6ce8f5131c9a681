"""Log-density oracle tests vs scipy.stats (SURVEY.md §4)."""

import numpy as np
import scipy.stats as st

from theano_pyglm_tpu.ops import distributions as d


def test_gaussian(rng):
    x, mu, sig = rng.randn(10), 0.3, 1.7
    np.testing.assert_allclose(
        np.asarray(d.gaussian_logpdf(x, mu, sig)), st.norm.logpdf(x, mu, sig), atol=1e-10
    )


def test_gamma(rng):
    x = rng.gamma(2.0, 1.0, 10)
    a, b = 2.5, 1.3
    np.testing.assert_allclose(
        np.asarray(d.gamma_logpdf(x, a, b)), st.gamma.logpdf(x, a, scale=1 / b), atol=1e-10
    )


def test_beta(rng):
    x = rng.beta(2, 3, 10)
    np.testing.assert_allclose(
        np.asarray(d.beta_logpdf(x, 2.0, 3.0)), st.beta.logpdf(x, 2, 3), atol=1e-10
    )


def test_dirichlet(rng):
    alpha = np.array([1.5, 2.0, 0.7])
    x = rng.dirichlet(alpha)
    np.testing.assert_allclose(
        float(d.dirichlet_logpdf(x, alpha)), st.dirichlet.logpdf(x, alpha), atol=1e-8
    )


def test_poisson():
    k = np.arange(6).astype(float)
    rate = 2.3
    np.testing.assert_allclose(
        np.asarray(d.poisson_logpmf(k, rate)), st.poisson.logpmf(k.astype(int), rate), atol=1e-10
    )


def test_bernoulli():
    k = np.array([0.0, 1.0, 1.0, 0.0])
    p = np.array([0.2, 0.2, 0.9, 0.9])
    np.testing.assert_allclose(
        np.asarray(d.bernoulli_logpmf(k, p)), st.bernoulli.logpmf(k.astype(int), p), atol=1e-9
    )


def test_categorical():
    logp = np.log(np.array([[0.2, 0.3, 0.5], [0.6, 0.3, 0.1]]))
    k = np.array([2, 0])
    np.testing.assert_allclose(
        np.asarray(d.categorical_logpmf(k, logp)), [np.log(0.5), np.log(0.6)], atol=1e-12
    )


def test_samplers_moments(key):
    import jax

    n = 20000
    g = d.sample_gaussian(key, 1.0, 2.0, (n,))
    assert abs(float(np.mean(np.asarray(g))) - 1.0) < 0.05
    assert abs(float(np.std(np.asarray(g))) - 2.0) < 0.05
    gm = d.sample_gamma(jax.random.PRNGKey(1), 3.0, 2.0, (n,))
    assert abs(float(np.mean(np.asarray(gm))) - 1.5) < 0.05
