"""MAP inference — L-BFGS on the jitted log-joint.

Rebuild of the reference's coordinate-descent MAP path
(``pyglm/inference/coord_descent.py``, SURVEY.md §2, §3.2). The reference
alternates scipy ``fmin_l_bfgs_b`` over (a) per-neuron GLM variables and (b)
global network variables, each through packed vectors and compiled Theano
thunks. On TPU both structures collapse: the likelihood factorizes over
postsynaptic neurons and the priors are separable, so one joint L-BFGS run on
the full continuous parameter block *is* the per-neuron coordinate sweep —
the gradient blocks are independent — and it runs as one fused XLA program
with no pack/unpack host round-trips (pytrees replace ``packvec``,
SURVEY.md §2 "Pack/unpack").

Sparse network MAP (acceptance config 2) follows the reference's
"sparse coupling + cross-validated λ" recipe: an L1 penalty on the off-
diagonal coupling weights (smoothed as √(w²+ε²) so L-BFGS applies), with λ
chosen by held-out predictive log-likelihood via :func:`cross_validate_lambda`.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "CONTINUOUS_KEYS",
    "map_fit",
    "sparse_map_fit",
    "cross_validate_lambda",
    "lbfgs_minimize",
]

# Continuous, unconstrained leaves MAP (and HMC) may move. Discrete latents
# (A, y) and conjugate hypers (pi, Bm, rho) are handled by the Gibbs machinery.
CONTINUOUS_KEYS = ("bias", "w_stim", "w_stim_s", "w_stim_t", "w_stim_shared", "gain", "w_ir", "W", "locs")


def split_params(params: dict, keys: Sequence[str] = CONTINUOUS_KEYS):
    """Partition a params dict into (optimized, frozen) sub-dicts by key."""
    opt = {k: v for k, v in params.items() if k in keys}
    frozen = {k: v for k, v in params.items() if k not in keys}
    return opt, frozen


def lbfgs_minimize(fun, x0, max_iter: int = 500, tol: float = 1e-6):
    """Minimize ``fun`` (pytree -> scalar) with optax L-BFGS + zoom linesearch.

    The whole optimization loop runs device-side under ``lax.while_loop`` —
    the TPU replacement for the reference's scipy ``fmin_l_bfgs_b`` calls.
    Returns (x_opt, final_value, n_iters).
    """
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        _, state, prev_val, it = carry
        val = optax.tree.get(state, "value")
        grad = optax.tree.get(state, "grad")
        gnorm = optax.tree.norm(grad)
        progress = jnp.abs(val - prev_val) > tol * (1.0 + jnp.abs(val))
        return (it < max_iter) & ((it < 2) | (progress & (gnorm > tol)))

    def body(carry):
        x, state, _, it = carry
        val, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=val, grad=grad, value_fn=fun)
        x = optax.apply_updates(x, updates)
        return x, state, val, it + 1

    state0 = opt.init(x0)
    x, state, _, iters = jax.lax.while_loop(
        cond, body, (x0, state0, jnp.asarray(jnp.inf), jnp.asarray(0))
    )
    return x, optax.tree.get(state, "value"), iters


@partial(jax.jit, static_argnums=(0, 3, 6))
def _map_fit_jit(pop, params0, data, max_iter, lam, l1_eps, penalize_W):
    opt0, frozen = split_params(params0)

    def objective(opt_params):
        p = {**frozen, **opt_params}
        nlp = -pop.log_joint(p, data)
        if penalize_W:
            W = opt_params["W"]
            off = W * (1.0 - jnp.eye(W.shape[0]))
            nlp = nlp + lam * jnp.sum(jnp.sqrt(off * off + l1_eps * l1_eps))
        return nlp

    opt, val, iters = lbfgs_minimize(objective, opt0, max_iter=max_iter)
    return {**frozen, **opt}, -val, iters


def map_fit(pop, data, init_params, max_iter: int = 500):
    """MAP-fit all continuous parameters (discrete latents held fixed).

    ≅ ``coord_descent(population, data, x0)`` for the dense-network case.
    Returns (params_map, log_joint_at_map, n_iterations).
    """
    params, logp, iters = _map_fit_jit(pop, init_params, data, max_iter, 0.0, 1e-6, False)
    return params, logp, iters


def sparse_map_fit(pop, data, init_params, lam: float, max_iter: int = 500, l1_eps: float = 1e-6):
    """MAP with an L1 (lasso) penalty λ·Σ|W_offdiag| for sparse coupling.

    ≅ the reference's sparse-network MAP (acceptance config 2). The penalty is
    smoothed (√(w²+ε²)) so the same L-BFGS path applies; with ε=1e-6 the
    minimizer's support is recovered by thresholding |W| at ~√ε.
    """
    from theano_pyglm_tpu.utils.dtypes import default_float as _df
    lam = jnp.asarray(lam, _df())
    params, logp, iters = _map_fit_jit(pop, init_params, data, max_iter, lam, l1_eps, True)
    return params, logp, iters


def heldout_log_likelihood(pop, params, data):
    return pop.log_likelihood(params, data)


def cross_validate_lambda(
    pop,
    S,
    stim,
    init_params,
    lambdas: Sequence[float],
    train_frac: float = 0.8,
    max_iter: int = 300,
):
    """Grid-search the sparsity penalty λ by held-out predictive log-lik.

    ≅ the reference's xv harness (SURVEY.md §3.5): split the time axis into
    train/validation segments, fit per λ on train, score on validation, return
    (best_lambda, fits, scores).
    """
    T = S.shape[0]
    T_train = int(T * train_frac)
    S_train, S_val = S[:T_train], S[T_train:]
    stim_train = stim[:T_train] if stim is not None else None
    stim_val = stim[T_train:] if stim is not None else None
    data_train = pop.prepare_data(S_train, stim=stim_train)
    data_val = pop.prepare_data(S_val, stim=stim_val)

    fits, scores = [], []
    for lam in lambdas:
        params, _, _ = sparse_map_fit(pop, data_train, init_params, lam, max_iter=max_iter)
        score = float(jax.jit(pop.log_likelihood, static_argnums=())(params, data_val))
        fits.append(params)
        scores.append(score)
    best = int(jnp.argmax(jnp.asarray(scores)))
    return lambdas[best], fits, scores
