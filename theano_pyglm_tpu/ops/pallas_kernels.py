"""Pallas TPU kernels — fused coupling-matmul + Poisson log-likelihood.

The innermost kernel of every inference path (SURVEY.md §3.4) is

    I   = I_rest + X_f @ U          X_f: (T, N·B) spike design, U: (N·B, N)
    LL  = Σ_{t,n} S·(I + log dt) − e^I · dt

This kernel streams X_f through VMEM once and reduces the log-likelihood on
the fly. Because the output is a SCALAR, differentiation needs no separate
backward pass over the data: the unscaled (ḡ=1) cotangents

    dU      = X_fᵀ @ (S − e^I·dt)          (VMEM accumulator across the grid)
    dI_rest = (S − e^I·dt)                 (streamed back out)

ride the same X stream as the forward (``_vg_kernel``), so
``value_and_grad`` — the HMC-leapfrog workload — reads X from HBM ONCE,
where XLA's unfused path reads it twice (forward matmul + transposed
backward matmul). The ``jax.custom_vjp`` wrapper computes these residuals in
its fwd rule and merely rescales them by ḡ in bwd; value-only calls use the
lighter forward kernel. Grid iterations on TPU are sequential per core, so
cross-tile accumulation into VMEM/SMEM scratch is safe.

Chain batching (multi-chain MCMC, acceptance configs 3/5): the inner ops
carry ``jax.custom_batching.custom_vmap`` rules, so a chain-vmapped call is
routed explicitly instead of relying on pallas_call auto-batching. The
batched implementation is plain XLA (chain axis folded into the matmul's
output columns, X streamed once per pass): a dedicated Pallas chains-grid
kernel was built and measured on v5e at ~8× SLOWER than XLA's batched
matmuls — its per-chain dU output block is revisited at every time tile,
forcing a VMEM→HBM write-back per grid step — so the honest fast path won.

MEASURED STATUS (v5e, N=27/T=60k acceptance shape): XLA's compiler-fused
pipeline also beats the single-chain kernels below for value_and_grad
(0.185 ms vs 0.29–0.32 ms) — its matmul DMA pipelining outweighs this
kernel's single-X-read advantage at this arithmetic intensity. The
Population therefore defaults to the XLA path ('auto' ⇒ off); the kernels
remain available (use_pallas=True), correctness-tested, for shapes where
one-pass streaming wins.

Time tiles are 512 bins; T is padded to a multiple (padded rows carry S=0 and
I_rest=−40, contributing e^{−40}·dt ≈ 0 to the reduction — numerically inert
in both passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from theano_pyglm_tpu.ops.clipping import EXP_CLIP

__all__ = ["fused_poisson_ll", "pallas_available"]

_TILE_T = 512
_PAD_I_REST = -EXP_CLIP  # e^{-40}·dt ≈ 4e-21: padded bins are inert


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# single-sample kernels (one chain)
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, u_ref, irest_ref, s_ref, logdt_ref, out_ref, acc_ref):
    """One time-tile: accumulate the tile's LL into SMEM; emit at the end."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = jnp.float32(0.0)

    I = irest_ref[:] + jnp.dot(x_ref[:], u_ref[:], preferred_element_type=jnp.float32)
    I = jnp.clip(I, -EXP_CLIP, EXP_CLIP)  # clipped-exp spec: ops/clipping.py
    ll = s_ref[:] * (I + logdt_ref[0]) - jnp.exp(I) * jnp.exp(logdt_ref[0])
    acc_ref[0] += jnp.sum(ll)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0]


def _pad_t(x, T_pad, fill=0.0, axis=0):
    T = x.shape[axis]
    if T == T_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, T_pad - T)
    return jnp.pad(x, widths, constant_values=fill)


def _vg_kernel(x_ref, u_ref, irest_ref, s_ref, logdt_ref,
               ll_ref, du_ref, direst_ref, acc_ll, acc_du):
    """One-pass value+grad: the LL output is a scalar, so the UNSCALED
    cotangents (ḡ=1) can ride the same X stream as the forward —
    value_and_grad then costs ONE read of X instead of the two XLA pays
    (forward matmul + transposed backward matmul)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ll[0] = jnp.float32(0.0)
        acc_du[:] = jnp.zeros_like(acc_du)

    I_raw = irest_ref[:] + jnp.dot(x_ref[:], u_ref[:], preferred_element_type=jnp.float32)
    I = jnp.clip(I_raw, -EXP_CLIP, EXP_CLIP)  # clipped-exp spec: ops/clipping.py
    E = jnp.exp(I) * jnp.exp(logdt_ref[0])
    acc_ll[0] += jnp.sum(s_ref[:] * (I + logdt_ref[0]) - E)
    # the clip's gradient is 0 outside the active range
    dI = jnp.where(jnp.abs(I_raw) < EXP_CLIP, s_ref[:] - E, 0.0)
    direst_ref[:] = dI
    acc_du[:] += jnp.dot(x_ref[:].T, dI, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ll_ref[0] = acc_ll[0]
        du_ref[:] = acc_du[:]


def _vg_call(x_f, u, i_rest, s, dt, interpret):
    T, NB = x_f.shape
    N = u.shape[1]
    T_pad = int(np.ceil(T / _TILE_T) * _TILE_T)
    x_p = _pad_t(x_f, T_pad)
    ir_p = _pad_t(i_rest, T_pad, fill=_PAD_I_REST)
    s_p = _pad_t(s, T_pad)
    logdt = jnp.asarray([np.log(dt)], jnp.float32)

    grid = (T_pad // _TILE_T,)
    ll, du, direst = pl.pallas_call(
        _vg_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, NB), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((NB, N), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32), pltpu.VMEM((NB, N), jnp.float32)],
        interpret=interpret,
    )(x_p, u, ir_p, s_p, logdt)
    return ll[0], du, direst[:T]


def _vg_chains_xla(x_f, u, i_rest, s, dt):
    """Chain-batched (ll (C,), du (C,NB,N), direst (C,T,N)) with unit
    cotangent, in plain XLA: the chain axis folds into the matmul's output
    columns, so X streams once per pass. Measured on v5e this beats a
    dedicated Pallas chains-grid kernel by ~8x (the per-chain dU output
    block is revisited at every time tile there, forcing a VMEM->HBM
    write-back per grid step)."""
    u_c = u.astype(x_f.dtype) if x_f.dtype == jnp.bfloat16 else u
    I_raw = i_rest + jnp.einsum("tm,cmn->ctn", x_f, u_c,
                                preferred_element_type=jnp.float32)
    I = jnp.clip(I_raw, -EXP_CLIP, EXP_CLIP)  # clipped-exp spec: ops/clipping.py
    logdt = jnp.float32(np.log(dt))
    E = jnp.exp(I) * jnp.exp(logdt)
    ll = jnp.sum(s[None] * (I + logdt) - E, axis=(1, 2))
    dI = jnp.where(jnp.abs(I_raw) < EXP_CLIP, s[None] - E, 0.0)  # (C, T, N)
    dI_c = dI.astype(x_f.dtype) if x_f.dtype == jnp.bfloat16 else dI
    du = jnp.einsum("tm,ctn->cmn", x_f, dI_c,
                    preferred_element_type=jnp.float32)
    return ll, du, dI


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


def _ll_chains_xla(x_f, u, i_rest, s, dt):
    """Chain-batched (C,) log-likelihoods in plain XLA (see _vg_chains_xla
    for why XLA, not a Pallas chains grid, implements the batched path)."""
    u_c = u.astype(x_f.dtype) if x_f.dtype == jnp.bfloat16 else u
    I = i_rest + jnp.einsum("tm,cmn->ctn", x_f, u_c,
                            preferred_element_type=jnp.float32)
    I = jnp.clip(I, -EXP_CLIP, EXP_CLIP)  # clipped-exp spec: ops/clipping.py
    logdt = jnp.float32(np.log(dt))
    ll = s[None] * (I + logdt) - jnp.exp(I) * jnp.exp(logdt)
    return jnp.sum(ll, axis=(1, 2))


# ---------------------------------------------------------------------------
# public op: custom_vjp; the value-only and value+grad inner ops each carry a
# custom_vmap rule routing chain-vmapped calls to the batched XLA path
# ---------------------------------------------------------------------------


def _bcast(x, batched, axis_size):
    return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)


@functools.lru_cache(maxsize=None)
def _make_fused(dt: float, interpret: bool):
    @custom_vmap
    def fwd_op(x_f, u, i_rest, s):
        return _fwd_call(x_f, u, i_rest, s, dt, interpret)

    @fwd_op.def_vmap
    def _fwd_vmap(axis_size, in_batched, x_f, u, i_rest, s):
        xb, ub, irb, sb = in_batched
        if xb or sb:
            # design/spikes batched (unusual): correctness fallback — map
            # the unbatched op over the axis.
            out = jax.lax.map(
                lambda args: fwd_op(*args),
                (
                    _bcast(x_f, xb, axis_size),
                    _bcast(u, ub, axis_size),
                    _bcast(i_rest, irb, axis_size),
                    _bcast(s, sb, axis_size),
                ),
            )
            return out, True
        u_b = _bcast(u, ub, axis_size)
        ir_b = _bcast(i_rest, irb, axis_size)
        return _ll_chains_xla(x_f, u_b, ir_b, s, dt), True

    @custom_vmap
    def vg_op(x_f, u, i_rest, s):
        return _vg_call(x_f, u, i_rest, s, dt, interpret)

    @vg_op.def_vmap
    def _vg_vmap(axis_size, in_batched, x_f, u, i_rest, s):
        xb, ub, irb, sb = in_batched
        if xb or sb:
            out = jax.lax.map(
                lambda args: vg_op(*args),
                (
                    _bcast(x_f, xb, axis_size),
                    _bcast(u, ub, axis_size),
                    _bcast(i_rest, irb, axis_size),
                    _bcast(s, sb, axis_size),
                ),
            )
            return out, (True, True, True)
        u_b = _bcast(u, ub, axis_size)
        ir_b = _bcast(i_rest, irb, axis_size)
        ll, du, direst = _vg_chains_xla(x_f, u_b, ir_b, s, dt)
        return (ll, du, direst), (True, True, True)

    @jax.custom_vjp
    def fused(x_f, u, i_rest, s):
        return fwd_op(x_f, u, i_rest, s)

    def vjp_fwd(x_f, u, i_rest, s):
        # The one-pass kernel emits the UNSCALED (ḡ=1) cotangents alongside
        # the value: value_and_grad — the HMC leapfrog's workload — streams X
        # from HBM once total, vs twice for separate fwd/bwd matmuls.
        ll, du, direst = vg_op(x_f, u, i_rest, s)
        return ll, (du.astype(u.dtype), direst.astype(i_rest.dtype))

    def vjp_bwd(res, g):
        du, direst = res
        # cotangent order must match primals (x_f, u, i_rest, s); the design
        # tensor and spikes are data — their cotangents are symbolic zeros.
        return None, g * du, g * direst, None

    fused.defvjp(vjp_fwd, vjp_bwd)
    return fused


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

    vmap-safe over (u, i_rest) — a chain-vmapped call (multi-chain MCMC)
    routes to kernels that share the X_f stream across all chains.
    """
    return _make_fused(float(dt), bool(interpret))(x_f, u, i_rest, s)
