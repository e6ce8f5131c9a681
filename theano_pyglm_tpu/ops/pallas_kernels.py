"""Pallas TPU kernels — fused coupling-matmul + Poisson log-likelihood.

The innermost kernel of every inference path (SURVEY.md §3.4) is

    I   = I_rest + X_f @ U          X_f: (T, N·B) spike design, U: (N·B, N)
    LL  = Σ_{t,n} S·(I + log dt) − e^I · dt

XLA materializes I and the exp separately; this kernel streams X_f through
VMEM once per pass and reduces the log-likelihood on the fly, so forward
traffic is one read of (X_f, S, I_rest) and nothing else. The backward pass
recomputes I tile-by-tile (rematerialization — HBM bandwidth is the
bottleneck, FLOPs are free) and accumulates

    dU      = X_fᵀ @ (S − e^I·dt)·ḡ        (VMEM accumulator across the grid)
    dI_rest = (S − e^I·dt)·ḡ               (streamed back out)

wired up as a ``jax.custom_vjp`` so ``jax.grad`` through the population
log-joint uses it transparently. Grid iterations on TPU are sequential per
core, so cross-tile accumulation into VMEM/SMEM scratch is safe.

Time tiles are 512 bins; T is padded to a multiple (padded rows carry S=0 and
I_rest=−40, contributing e^{−40}·dt ≈ 0 to the reduction — numerically inert
in both passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_poisson_ll", "pallas_available"]

_TILE_T = 512
_PAD_I_REST = -40.0  # e^{-40}·dt ≈ 4e-21: padded bins are inert


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _fwd_kernel(x_ref, u_ref, irest_ref, s_ref, logdt_ref, out_ref, acc_ref):
    """One time-tile: accumulate the tile's LL into SMEM; emit at the end."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = jnp.float32(0.0)

    I = irest_ref[:] + jnp.dot(x_ref[:], u_ref[:], preferred_element_type=jnp.float32)
    ll = s_ref[:] * (I + logdt_ref[0]) - jnp.exp(I) * jnp.exp(logdt_ref[0])
    acc_ref[0] += jnp.sum(ll)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0]


def _bwd_kernel(x_ref, u_ref, irest_ref, s_ref, logdt_ref, g_ref, du_ref, direst_ref, acc_ref):
    """One time-tile: dI = (S − e^I·dt)·ḡ; stream dI_rest, accumulate dU."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    I = irest_ref[:] + jnp.dot(x_ref[:], u_ref[:], preferred_element_type=jnp.float32)
    dI = (s_ref[:] - jnp.exp(I) * jnp.exp(logdt_ref[0])) * g_ref[0]
    direst_ref[:] = dI
    acc_ref[:] += jnp.dot(x_ref[:].T, dI, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        du_ref[:] = acc_ref[:]


def _pad_t(x, T_pad, fill=0.0):
    T = x.shape[0]
    if T == T_pad:
        return x
    pad = jnp.full((T_pad - T,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_poisson_ll(x_f, u, i_rest, s, dt: float, interpret: bool = False):
    """Fused Σ [S·(I+log dt) − e^I·dt] with I = I_rest + X_f@U.

    Args:
      x_f: (T, NB) design (float32 or bfloat16).
      u: (NB, N) combined coupling weights.
      i_rest: (T, N) non-coupling currents.
      s: (T, N) spike counts.
      dt: bin width (static).
      interpret: run the Pallas interpreter (CPU testing).

    Returns the scalar log-likelihood (gammaln(S+1) constant excluded — add
    it outside if absolute values must match scipy).
    """
    return _fwd_call(x_f, u, i_rest, s, dt, interpret)


def _fwd_call(x_f, u, i_rest, s, dt, interpret):
    T, NB = x_f.shape
    N = u.shape[1]
    T_pad = int(np.ceil(T / _TILE_T) * _TILE_T)
    x_f = _pad_t(x_f, T_pad)
    i_rest = _pad_t(i_rest, T_pad, fill=_PAD_I_REST)
    s = _pad_t(s, T_pad)
    logdt = jnp.asarray([np.log(dt)], jnp.float32)

    grid = (T_pad // _TILE_T,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, NB), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(x_f, u, i_rest, s, logdt)
    return out[0]


def _vjp_fwd(x_f, u, i_rest, s, dt, interpret):
    return _fwd_call(x_f, u, i_rest, s, dt, interpret), (x_f, u, i_rest, s)


def _vjp_bwd(dt, interpret, res, g):
    x_f, u, i_rest, s = res
    T, NB = x_f.shape
    N = u.shape[1]
    T_pad = int(np.ceil(T / _TILE_T) * _TILE_T)
    x_p = _pad_t(x_f, T_pad)
    ir_p = _pad_t(i_rest, T_pad, fill=_PAD_I_REST)
    s_p = _pad_t(s, T_pad)
    logdt = jnp.asarray([np.log(dt)], jnp.float32)
    g_arr = jnp.asarray([g], jnp.float32)

    grid = (T_pad // _TILE_T,)
    du, direst = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, NB), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, N), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((NB, N), jnp.float32)],
        interpret=interpret,
    )(x_p, u, ir_p, s_p, logdt, g_arr)
    # cotangent order must match primals (x_f, u, i_rest, s); the design
    # tensor and spikes are data — their cotangents are symbolic zeros.
    return None, du.astype(u.dtype), direst[:T], None


fused_poisson_ll.defvjp(_vjp_fwd, _vjp_bwd)
