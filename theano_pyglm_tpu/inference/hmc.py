"""Hamiltonian Monte Carlo — scan-compiled leapfrog with dual averaging.

Rebuild of ``pyglm/inference/hmc.py`` (SURVEY.md §2 "HMC kernel"): the
reference runs a numpy leapfrog with adaptive step size targeting ~0.9
acceptance. Here the whole trajectory is a ``lax.scan`` inside the caller's
jit, the target is any pure ``logp(pytree) -> scalar``, and step-size
adaptation uses Nesterov dual averaging (Hoffman & Gelman 2014) toward the
same high target acceptance rate. Works on arbitrary pytrees (vmap-able
across chains), so the same kernel serves per-neuron GLM weights, network
weights, and latent locations.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from theano_pyglm_tpu.utils.dtypes import default_float

__all__ = ["HMCState", "hmc_init", "hmc", "hmc_adaptive_step"]


class HMCState(NamedTuple):
    """Carryable HMC state: position + step-size adaptation statistics."""

    position: dict
    log_prob: jax.Array
    step_size: jax.Array
    # dual-averaging state (Hoffman & Gelman 2014 §3.2)
    log_eps_avg: jax.Array  # iterate-averaged log ε (used once adaptation stops)
    h_avg: jax.Array  # running average of (target − accept)
    t: jax.Array
    accept_rate: jax.Array
    mu: jax.Array = None  # dual-averaging shrinkage point log(10·ε₀)


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
    )


def _leapfrog(logp_fn, q, p, eps, n_steps):
    """n_steps leapfrog steps; returns (q', p', logp(q'))."""
    grad_fn = jax.grad(logp_fn)

    def half_kick(p, g):
        return jax.tree.map(lambda p_, g_: p_ + 0.5 * eps * g_, p, g)

    def drift(q, p):
        return jax.tree.map(lambda q_, p_: q_ + eps * p_, q, p)

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
):
    """One HMC transition (≅ the reference's ``hmc(U, grad_U, ...)``).

    Args:
      logp_fn: pure log-density over the position pytree.
      q_curr / log_prob_curr: current position and cached log-density.
      step_size: leapfrog step size (traced scalar ok).
      n_steps: static number of leapfrog steps.

    Returns:
      (q_new, log_prob_new, accept_prob)
    """
    k_mom, k_acc = jax.random.split(key)
    leaves, treedef = jax.tree.flatten(q_curr)
    mom_keys = jax.random.split(k_mom, len(leaves))
    p0 = treedef.unflatten(
        [jax.random.normal(k, x.shape, x.dtype) for k, x in zip(mom_keys, leaves)]
    )

    q_new, p_new, lp_new = _leapfrog(logp_fn, q_curr, p0, step_size, n_steps)
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
    """HMC transition + dual-averaging step-size adaptation.

    Nesterov dual averaging exactly as in Hoffman & Gelman (2014) §3.2,
    targeting the reference's high accept rate (~0.9, SURVEY.md §2 [M]):

        H̄_t   = (1 − 1/(t+t₀))·H̄_{t−1} + (target − accept)/(t+t₀)
        log ε_t = μ − √t/γ · H̄_t,     μ = log(10·ε₀)
        log ε̄_t = t^{−κ}·log ε_t + (1 − t^{−κ})·log ε̄_{t−1}

    ``adapt`` may be a traced bool so warmup and sampling share one compiled
    step; once it is False the iterate-averaged ε̄ is used and frozen.
    """
    q, lp, acc = hmc(key, logp_fn, state.position, state.log_prob, state.step_size, n_steps)

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

    rate = 0.99 * state.accept_rate + 0.01 * acc
    return HMCState(q, lp, new_eps, new_avg, new_h, new_t, rate, state.mu)
