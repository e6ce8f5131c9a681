"""Causal convolution oracle tests vs a pure-numpy loop (SURVEY.md §4)."""

import numpy as np

from theano_pyglm_tpu.ops.basis import create_basis
from theano_pyglm_tpu.ops.convolve import convolve_with_basis, upsample_stim


def _oracle(x, basis):
    """out[t, b] = Σ_l basis[l, b] · x[t-1-l], zero-padded."""
    T = x.shape[0]
    L, B = basis.shape
    out = np.zeros((T, B))
    for t in range(T):
        for l in range(L):
            src = t - 1 - l
            if src >= 0:
                out[t] += basis[l] * x[src]
    return out


def test_against_numpy_oracle(rng):
    basis = create_basis({"type": "cosine", "n_bas": 3, "dt": 1e-3, "dt_max": 0.01})
    x = rng.poisson(0.5, size=50).astype(float)
    got = np.asarray(convolve_with_basis(x, basis))
    np.testing.assert_allclose(got, _oracle(x, basis), atol=1e-10)


def test_strict_causality(rng):
    """A spike at bin t must not influence bins ≤ t."""
    basis = create_basis({"type": "cosine", "n_bas": 3, "dt": 1e-3, "dt_max": 0.01})
    x = np.zeros(20)
    x[7] = 1.0
    out = np.asarray(convolve_with_basis(x, basis))
    assert np.all(out[: 7 + 1] == 0.0)
    assert np.any(out[8] != 0.0)


def test_multineuron_matches_per_neuron(rng):
    basis = create_basis({"type": "cosine", "n_bas": 4, "dt": 1e-3, "dt_max": 0.02})
    X = rng.poisson(0.3, size=(40, 3)).astype(float)
    got = np.asarray(convolve_with_basis(X, basis))
    assert got.shape == (40, 3, 4)
    for n in range(3):
        np.testing.assert_allclose(got[:, n, :], _oracle(X[:, n], basis), atol=1e-10)


def test_upsample_stim():
    stim = np.array([[0.0], [1.0], [2.0]])
    out = np.asarray(upsample_stim(stim, dt_stim=0.1, dt=0.05, T=5))
    np.testing.assert_allclose(out[:, 0], [0.0, 0.5, 1.0, 1.5, 2.0], atol=1e-12)
