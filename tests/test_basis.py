"""Basis construction tests (oracle strategy per SURVEY.md §4)."""

import numpy as np
import pytest

from theano_pyglm_tpu.ops.basis import create_basis, project_onto_basis


def _spec(**kw):
    base = {"type": "cosine", "n_bas": 5, "dt": 1e-3, "dt_max": 0.1}
    base.update(kw)
    return base


def test_cosine_shape_and_norm():
    b = create_basis(_spec())
    assert b.shape == (100, 5)
    # unit-sum normalization
    np.testing.assert_allclose(b.sum(axis=0), np.ones(5), atol=1e-12)
    assert np.all(b >= -1e-12)


def test_cosine_n_eye():
    b = create_basis(_spec(n_eye=2))
    assert b.shape == (100, 7)
    # identity columns are unit impulses at the first lags
    assert b[0, 0] == 1.0 and b[1, 1] == 1.0
    assert np.sum(b[:, 0]) == 1.0


def test_cosine_log_spacing_peaks_increase():
    b = create_basis(_spec(norm=False))
    peaks = np.argmax(b, axis=0)
    assert np.all(np.diff(peaks) >= 0)
    # later bumps are wider than earlier ones
    widths = (b > 0.5 * b.max(axis=0)).sum(axis=0)
    assert widths[-1] > widths[0]


def test_orthonormalization():
    b = create_basis(_spec(orth=True))
    np.testing.assert_allclose(b.T @ b, np.eye(5), atol=1e-10)


@pytest.mark.parametrize("typ", ["exp", "gaussian"])
def test_other_types(typ):
    b = create_basis(_spec(type=typ, n_bas=4))
    assert b.shape == (100, 4)
    np.testing.assert_allclose(b.sum(axis=0), np.ones(4), atol=1e-12)


def test_identity():
    b = create_basis({"type": "identity", "dt": 1e-3, "dt_max": 0.01})
    np.testing.assert_allclose(b, np.eye(10))


def test_exp_decays():
    b = create_basis(_spec(type="exp", n_bas=3, norm=False))
    assert np.all(np.diff(b, axis=0) < 0)  # strictly decaying


def test_project_onto_basis_roundtrip():
    b = create_basis(_spec())
    w = np.array([0.3, -1.2, 0.5, 2.0, -0.1])
    f = b @ w
    w_rec = project_onto_basis(f, b)
    np.testing.assert_allclose(w_rec, w, atol=1e-8)


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        create_basis({"type": "wavelet"})
