"""ARS tests: exactness on known log-concave densities."""

import numpy as np
import pytest

from theano_pyglm_tpu.inference.ars import adaptive_rejection_sample


def test_standard_normal_moments():
    rng = np.random.RandomState(0)
    h = lambda x: -0.5 * x * x
    hp = lambda x: -x
    xs = np.array([
        adaptive_rejection_sample(h, hp, [-1.0, 1.0], rng=rng) for _ in range(4000)
    ])
    assert abs(xs.mean()) < 0.06
    assert abs(xs.std() - 1.0) < 0.05


def test_gamma_on_half_line():
    rng = np.random.RandomState(1)
    a, b = 3.0, 2.0  # Gamma(3, rate 2): mean 1.5
    h = lambda x: (a - 1) * np.log(x) - b * x
    hp = lambda x: (a - 1) / x - b
    xs = np.array([
        adaptive_rejection_sample(h, hp, [0.5, 3.0], domain=(1e-9, np.inf), rng=rng)
        for _ in range(4000)
    ])
    assert abs(xs.mean() - a / b) < 0.06
    assert abs(xs.var() - a / b**2) < 0.08


def test_requires_mode_bracketing():
    h = lambda x: -0.5 * x * x
    hp = lambda x: -x
    with pytest.raises(ValueError):
        adaptive_rejection_sample(h, hp, [1.0, 2.0])  # both right of mode
