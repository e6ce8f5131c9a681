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

Chain batching (multi-chain MCMC, acceptance configs 3/5): the fwd/bwd ops
carry ``jax.custom_batching.custom_vmap`` rules that route a chain-vmapped
call to dedicated kernels with grid ``(T_tiles, chains)`` — chains innermost,
so consecutive grid steps share the same X_f block index and Pallas fetches
each X tile from HBM ONCE per time tile, amortizing the dominant stream
across all chains (an auto-batched kernel would re-stream X per chain). Per
(tile, chain) step the kernel does one (TILE,NB)@(NB,N) matmul against that
chain's U and accumulates that chain's scalar in SMEM.

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

__all__ = ["fused_poisson_ll", "pallas_available"]

_TILE_T = 512
_PAD_I_REST = -40.0  # e^{-40}·dt ≈ 4e-21: padded bins are inert


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


def _pad_t(x, T_pad, fill=0.0, axis=0):
    T = x.shape[axis]
    if T == T_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, T_pad - T)
    return jnp.pad(x, widths, constant_values=fill)


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


def _bwd_call(x_f, u, i_rest, s, g, dt, interpret):
    T, NB = x_f.shape
    N = u.shape[1]
    T_pad = int(np.ceil(T / _TILE_T) * _TILE_T)
    x_p = _pad_t(x_f, T_pad)
    ir_p = _pad_t(i_rest, T_pad, fill=_PAD_I_REST)
    s_p = _pad_t(s, T_pad)
    logdt = jnp.asarray([np.log(dt)], jnp.float32)
    g_arr = jnp.asarray(g, jnp.float32).reshape(1)

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
    return du.astype(u.dtype), direst[:T]


# ---------------------------------------------------------------------------
# chain-batched kernels — grid (T_tiles, chains), chains innermost so the X
# tile is fetched once per time tile and reused by every chain
# ---------------------------------------------------------------------------


def _fwd_chains_kernel(x_ref, u_ref, irest_ref, s_ref, logdt_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[c] = jnp.float32(0.0)

    I = irest_ref[0] + jnp.dot(x_ref[:], u_ref[0], preferred_element_type=jnp.float32)
    ll = s_ref[:] * (I + logdt_ref[0]) - jnp.exp(I) * jnp.exp(logdt_ref[0])
    acc_ref[c] += jnp.sum(ll)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[c] = acc_ref[c]


def _bwd_chains_kernel(
    x_ref, u_ref, irest_ref, s_ref, logdt_ref, g_ref, du_ref, direst_ref, acc_ref
):
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[c] = jnp.zeros_like(acc_ref[c])

    I = irest_ref[0] + jnp.dot(x_ref[:], u_ref[0], preferred_element_type=jnp.float32)
    dI = (s_ref[:] - jnp.exp(I) * jnp.exp(logdt_ref[0])) * g_ref[c]
    direst_ref[0] = dI
    acc_ref[c] += jnp.dot(x_ref[:].T, dI, preferred_element_type=jnp.float32)
    # Written every step (the du block index changes with c, so Pallas copies
    # the VMEM buffer back each step regardless — writing the running sum
    # makes those copies deterministic; the final visit at i = last carries
    # the complete accumulation).
    du_ref[0] = acc_ref[c]


def _fwd_chains_call(x_f, u, i_rest, s, dt, interpret):
    C, NB, N = u.shape
    T = x_f.shape[0]
    T_pad = int(np.ceil(T / _TILE_T) * _TILE_T)
    x_f = _pad_t(x_f, T_pad)
    i_rest = _pad_t(i_rest, T_pad, fill=_PAD_I_REST, axis=1)
    s = _pad_t(s, T_pad)
    logdt = jnp.asarray([np.log(dt)], jnp.float32)

    grid = (T_pad // _TILE_T, C)
    out = pl.pallas_call(
        _fwd_chains_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, NB), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, N), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_T, N), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((C,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((C,), jnp.float32)],
        interpret=interpret,
    )(x_f, u, i_rest, s, logdt)
    return out


def _bwd_chains_call(x_f, u, i_rest, s, g, dt, interpret):
    C, NB, N = u.shape
    T = x_f.shape[0]
    T_pad = int(np.ceil(T / _TILE_T) * _TILE_T)
    x_p = _pad_t(x_f, T_pad)
    ir_p = _pad_t(i_rest, T_pad, fill=_PAD_I_REST, axis=1)
    s_p = _pad_t(s, T_pad)
    logdt = jnp.asarray([np.log(dt)], jnp.float32)
    g_arr = jnp.asarray(g, jnp.float32).reshape(C)

    grid = (T_pad // _TILE_T, C)
    du, direst = pl.pallas_call(
        _bwd_chains_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, NB), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, N), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_T, N), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, N), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NB, N), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_T, N), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, NB, N), jnp.float32),
            jax.ShapeDtypeStruct((C, T_pad, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((C, NB, N), jnp.float32)],
        interpret=interpret,
    )(x_p, u, ir_p, s_p, logdt, g_arr)
    return du.astype(u.dtype), direst[:, :T]


# ---------------------------------------------------------------------------
# public op: custom_vjp whose fwd/bwd each carry a custom_vmap rule
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
        return _fwd_chains_call(x_f, u_b, ir_b, s, dt, interpret), True

    @custom_vmap
    def bwd_op(x_f, u, i_rest, s, g):
        return _bwd_call(x_f, u, i_rest, s, g, dt, interpret)

    @bwd_op.def_vmap
    def _bwd_vmap(axis_size, in_batched, x_f, u, i_rest, s, g):
        xb, ub, irb, sb, gb = in_batched
        if xb or sb:
            out = jax.lax.map(
                lambda args: bwd_op(*args),
                (
                    _bcast(x_f, xb, axis_size),
                    _bcast(u, ub, axis_size),
                    _bcast(i_rest, irb, axis_size),
                    _bcast(s, sb, axis_size),
                    _bcast(g, gb, axis_size),
                ),
            )
            return out, (True, True)
        u_b = _bcast(u, ub, axis_size)
        ir_b = _bcast(i_rest, irb, axis_size)
        g_b = _bcast(g, gb, axis_size)
        du, direst = _bwd_chains_call(x_f, u_b, ir_b, s, g_b, dt, interpret)
        return (du, direst), (True, True)

    @jax.custom_vjp
    def fused(x_f, u, i_rest, s):
        return fwd_op(x_f, u, i_rest, s)

    def vjp_fwd(x_f, u, i_rest, s):
        return fwd_op(x_f, u, i_rest, s), (x_f, u, i_rest, s)

    def vjp_bwd(res, g):
        x_f, u, i_rest, s = res
        du, direst = bwd_op(x_f, u, i_rest, s, g)
        # cotangent order must match primals (x_f, u, i_rest, s); the design
        # tensor and spikes are data — their cotangents are symbolic zeros.
        return None, du, direst, None

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
