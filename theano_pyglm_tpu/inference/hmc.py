"""Hamiltonian Monte Carlo — scan-compiled leapfrog, dual averaging, and
diagonal mass-matrix adaptation.

Rebuild of ``pyglm/inference/hmc.py`` (SURVEY.md §2 "HMC kernel"): the
reference runs a numpy leapfrog with adaptive step size targeting ~0.9
acceptance. Here the whole trajectory is a ``lax.scan`` inside the caller's
jit, the target is any pure ``logp(pytree) -> scalar``, and warmup adapts

  * the global step size ε by Nesterov dual averaging (Hoffman & Gelman 2014
    §3.2) toward the target acceptance, and
  * a per-coordinate scale (diagonal inverse mass) from Welford running
    variances of the position — essential when one block mixes razor-sharp
    coordinates (a bias with 10⁴ spikes behind it) with prior-scale ones
    (disconnected coupling logits); a single unpreconditioned ε would mix the
    diffuse directions glacially.

Leapfrog runs in the rescaled coordinates: kick p += ½·ε·s∘∇logp, drift
q += ε·s∘p with s the coordinate scales — exactly HMC with mass matrix
M = diag(1/s²). Works on arbitrary pytrees (vmap-able across chains).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from theano_pyglm_tpu.utils.dtypes import default_float

__all__ = ["HMCState", "hmc_init", "hmc", "hmc_adaptive_step", "reset_variance", "apply_mass_matrix"]


class HMCState(NamedTuple):
    """Carryable HMC state: position + step-size/mass adaptation statistics."""

    position: dict
    log_prob: jax.Array
    step_size: jax.Array
    # dual-averaging state (Hoffman & Gelman 2014 §3.2)
    log_eps_avg: jax.Array  # iterate-averaged log ε (used once adaptation stops)
    h_avg: jax.Array  # running average of (target − accept)
    t: jax.Array
    accept_rate: jax.Array
    mu: jax.Array = None  # dual-averaging shrinkage point log(10·ε₀)
    # diagonal mass adaptation (Welford over warmup positions)
    scale: dict = None  # per-coordinate std estimate (≡ sqrt of inv mass)
    pos_mean: dict = None
    pos_m2: dict = None
    n_var: jax.Array = None


def _ones_like_tree(position):
    return jax.tree.map(jnp.ones_like, position)


def _zeros_like_tree(position):
    return jax.tree.map(jnp.zeros_like, position)


def hmc_init(position, logp_fn: Callable, step_size: float = 0.01) -> HMCState:
    lp = logp_fn(position)
    f = default_float()
    eps = jnp.asarray(step_size, f)
    return HMCState(
        position=position,
        log_prob=lp.astype(f),
        step_size=eps,
        log_eps_avg=jnp.log(eps),
        h_avg=jnp.asarray(0.0, f),
        t=jnp.asarray(0.0, f),
        accept_rate=jnp.asarray(1.0, f),
        mu=jnp.log(10.0 * eps),
        scale=_ones_like_tree(position),
        pos_mean=_zeros_like_tree(position),
        pos_m2=_zeros_like_tree(position),
        n_var=jnp.asarray(0.0, f),
    )


def _leapfrog(logp_fn, q, p, eps, scale, n_steps):
    """n_steps preconditioned leapfrog steps; returns (q', p', logp(q'))."""
    grad_fn = jax.grad(logp_fn)

    def half_kick(p, g):
        return jax.tree.map(lambda p_, s_, g_: p_ + 0.5 * eps * s_ * g_, p, scale, g)

    def drift(q, p):
        return jax.tree.map(lambda q_, s_, p_: q_ + eps * s_ * p_, q, scale, p)

    def step(carry, _):
        q, p = carry
        p = half_kick(p, grad_fn(q))
        q = drift(q, p)
        p = half_kick(p, grad_fn(q))
        return (q, p), None

    (q, p), _ = jax.lax.scan(step, (q, p), None, length=n_steps)
    return q, p, logp_fn(q)


def _kinetic(p):
    return 0.5 * sum(jnp.sum(x * x) for x in jax.tree.leaves(p))


def hmc(
    key,
    logp_fn: Callable,
    q_curr,
    log_prob_curr,
    step_size,
    n_steps: int = 10,
    scale=None,
):
    """One HMC transition (≅ the reference's ``hmc(U, grad_U, ...)``).

    Args:
      logp_fn: pure log-density over the position pytree.
      q_curr / log_prob_curr: current position and cached log-density.
      step_size: leapfrog step size (traced scalar ok).
      n_steps: static number of leapfrog steps.
      scale: optional per-coordinate scale pytree (diagonal preconditioner).

    Returns:
      (q_new, log_prob_new, accept_prob)
    """
    if scale is None:
        scale = _ones_like_tree(q_curr)
    k_mom, k_acc = jax.random.split(key)
    leaves, treedef = jax.tree.flatten(q_curr)
    mom_keys = jax.random.split(k_mom, len(leaves))
    p0 = treedef.unflatten(
        [jax.random.normal(k, x.shape, x.dtype) for k, x in zip(mom_keys, leaves)]
    )

    q_new, p_new, lp_new = _leapfrog(logp_fn, q_curr, p0, step_size, scale, n_steps)
    h0 = -log_prob_curr + _kinetic(p0)
    h1 = -lp_new + _kinetic(p_new)
    log_accept = jnp.clip(h0 - h1, None, 0.0)
    # Guard NaN trajectories (divergences) — always reject.
    log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
    accept_prob = jnp.exp(log_accept)

    u = jax.random.uniform(k_acc)
    take = u < accept_prob
    q_out = jax.tree.map(lambda a, b: jnp.where(take, a, b), q_new, q_curr)
    lp_out = jnp.where(take, lp_new, log_prob_curr)
    return q_out, lp_out, accept_prob


def hmc_adaptive_step(
    key,
    logp_fn: Callable,
    state: HMCState,
    n_steps: int = 10,
    target_accept: float = 0.9,
    adapt: bool | jax.Array = True,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
):
    """HMC transition + dual-averaging ε + Welford statistics collection.

    While ``adapt`` is true (a traced bool, so warmup and sampling share one
    compiled step) ε follows dual averaging and the position stream updates
    Welford mean/variance per coordinate. The statistics are only *collected*
    here — the scale is applied explicitly between warmup windows via
    :func:`apply_mass_matrix` / :func:`reset_variance` (Stan-style windowed
    adaptation): applying a variance that still contains the initial
    transient's drift would freeze a badly wrong preconditioner.
    """
    scale = state.scale if state.scale is not None else _ones_like_tree(state.position)
    q, lp, acc = hmc(
        key, logp_fn, state.position, state.log_prob, state.step_size, n_steps, scale
    )

    t = state.t + 1.0
    w = 1.0 / (t + t0)
    h_avg = (1.0 - w) * state.h_avg + w * (target_accept - acc)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg

    adapt = jnp.asarray(adapt)
    new_eps = jnp.where(adapt, jnp.exp(log_eps), jnp.exp(state.log_eps_avg))
    new_avg = jnp.where(adapt, log_eps_avg, state.log_eps_avg)
    new_h = jnp.where(adapt, h_avg, state.h_avg)
    new_t = jnp.where(adapt, t, state.t)

    # --- Welford variance of the position stream (collected during warmup).
    # Residuals are winsorized at 6 running-σ: coordinates that occasionally
    # JUMP between a tight conditional and their prior (spike-and-slab
    # weights/logits flipped by the birth-death move) would otherwise inflate
    # the scale far beyond the conditional sd HMC actually navigates.
    n_var = jnp.where(adapt, state.n_var + 1.0, state.n_var)
    nv = jnp.maximum(n_var, 1.0)

    def winsorize(x, m, m2):
        std = jnp.sqrt(m2 / jnp.maximum(nv - 1.0, 1.0))
        lim = 6.0 * jnp.maximum(std, 1e-8)
        r = x - m
        r = jnp.where(nv > 10.0, jnp.clip(r, -lim, lim), r)
        return m + r

    q_w = jax.tree.map(winsorize, q, state.pos_mean, state.pos_m2)

    def upd_mean(m, x):
        return jnp.where(adapt, m + (x - m) / nv, m)

    def upd_m2(m2, m_old, m_new, x):
        return jnp.where(adapt, m2 + (x - m_old) * (x - m_new), m2)

    mean_new = jax.tree.map(upd_mean, state.pos_mean, q_w)
    m2_new = jax.tree.map(upd_m2, state.pos_m2, state.pos_mean, mean_new, q_w)

    rate = 0.99 * state.accept_rate + 0.01 * acc
    return HMCState(
        q, lp, new_eps, new_avg, new_h, new_t, rate, state.mu,
        scale, mean_new, m2_new, n_var,
    )


def reset_variance(state: HMCState) -> HMCState:
    """Zero the Welford statistics (start of a clean variance window)."""
    return state._replace(
        pos_mean=_zeros_like_tree(state.position),
        pos_m2=_zeros_like_tree(state.position),
        n_var=jnp.zeros_like(state.n_var),
    )


def apply_mass_matrix(
    state: HMCState, scale_floor: float = 1e-4, eps_restart: float = 0.1
) -> HMCState:
    """Set the leapfrog scale from the collected window variance and restart
    dual averaging (the preconditioner change invalidates the old ε
    statistics — Stan does the same between windows).

    ε restarts at ``eps_restart``, NOT at the pre-apply value: before
    preconditioning ε is pinned by the sharpest raw direction (often 1e-5),
    while in the rescaled space every direction is ~unit variance and the
    natural ε is O(0.1) — dual averaging could never climb 3–4 orders of
    magnitude within one warmup window, leaving the sampler frozen.
    Regularizes the variance toward a floor when the window is short."""
    n = jnp.maximum(state.n_var, 1.0)

    def mk(m2):
        # n_var may be per-chain (batched states): align its rank for
        # broadcasting against the (chain, ...) parameter leaves.
        nn = n.reshape(n.shape + (1,) * (m2.ndim - n.ndim))
        w = nn / (nn + 5.0)
        var = m2 / jnp.maximum(nn - 1.0, 1.0)
        var = w * var + (1.0 - w) * 1e-3  # shrink toward a small floor scale
        return jnp.sqrt(jnp.maximum(var, scale_floor**2))

    scale = jax.tree.map(mk, state.pos_m2)
    eps = jnp.full_like(state.step_size, eps_restart)
    return state._replace(
        scale=scale,
        step_size=eps,
        mu=jnp.log(10.0 * eps),
        log_eps_avg=jnp.log(eps),
        h_avg=jnp.zeros_like(state.h_avg),
        t=jnp.zeros_like(state.t),
    )
