"""Causal basis convolution — design-tensor construction.

Behavioral equivalent of ``convolve_with_basis`` in the reference's
``pyglm/utils/basis.py`` (SURVEY.md §2, §3.2): spike trains / stimuli are
convolved with each basis column once, up front, to produce fixed design
tensors that the (jitted) likelihood then contracts with learned weights on
the MXU.

Convention (documented spec, see SURVEY.md §7 "Identifiability conventions"):
the convolution is **strictly causal** —

    out[t, ..., b] = sum_{l=0}^{L-1} basis[l, b] * x[t - 1 - l]

so a spike in bin t can influence the rate from bin t+1 onward, never its own
bin (prevents instantaneous self-excitation in simulation and matches the
reference's spike-history semantics).

Implemented with ``lax.conv_general_dilated`` (XLA lowers this to MXU
matmuls); the basis axis rides the conv feature dimension, the neuron axis the
batch dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from theano_pyglm_tpu.utils.dtypes import default_float

__all__ = ["convolve_with_basis", "upsample_stim"]


def convolve_with_basis(x: jax.Array, basis: jax.Array) -> jax.Array:
    """Strictly-causal convolution of signal(s) with basis columns.

    Args:
      x: signal, shape (T,) or (T, N) — e.g. spike counts or a 1-D stimulus.
      basis: (L, B) filter basis (rows = lags 1·dt … L·dt).

    Returns:
      (T, B) if x is (T,), else (T, N, B), with
      out[t, n, b] = Σ_l basis[l, b] · x[t-1-l, n] (zero-padded history).
    """
    x = jnp.asarray(x)
    basis = jnp.asarray(basis, dtype=x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else default_float())
    x = x.astype(basis.dtype)
    L, B = basis.shape
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    T, N = x.shape

    # Prepend L zeros so a VALID cross-correlation with the time-reversed
    # basis yields exactly the strictly-causal sum above.
    xp = jnp.concatenate([jnp.zeros((L, N), dtype=x.dtype), x], axis=0)  # (T+L, N)
    lhs = xp.T[:, None, :]  # (N, 1, T+L)   batch=N, chan=1, width
    rhs = jnp.flip(basis, axis=0).T[:, None, :]  # (B, 1, L)
    out = lax.conv_general_dilated(lhs, rhs, window_strides=(1,), padding="VALID")
    out = out[:, :, :T]  # (N, B, T)
    out = jnp.transpose(out, (2, 0, 1))  # (T, N, B)
    return out[:, 0, :] if squeeze else out


def upsample_stim(stim: jax.Array, dt_stim: float, dt: float, T: int) -> jax.Array:
    """Resample a stimulus from its own sampling interval to bin resolution.

    Reference parity: the reference's stimulus component interpolates the
    stimulus to spike-bin resolution in ``set_data`` (SURVEY.md §2
    "Background / stimulus"). Linear interpolation per stimulus dimension.

    Args:
      stim: (T_stim, D) or (T_stim,) stimulus at interval ``dt_stim``.
      dt_stim: stimulus frame interval (s).
      dt: spike-bin width (s).
      T: number of spike bins to produce.

    Returns:
      (T, D) (or (T,)) stimulus at bin resolution.
    """
    stim = jnp.asarray(stim)
    squeeze = stim.ndim == 1
    if squeeze:
        stim = stim[:, None]
    t_stim = jnp.arange(stim.shape[0]) * dt_stim
    t_bins = jnp.arange(T) * dt
    out = jax.vmap(lambda col: jnp.interp(t_bins, t_stim, col), in_axes=1, out_axes=1)(stim)
    return out[:, 0] if squeeze else out
