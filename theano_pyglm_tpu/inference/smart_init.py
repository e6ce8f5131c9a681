"""Smart initialization for MAP/MCMC (≅ pyglm/inference/smart_init.py,
SURVEY.md §2 "Smart init").

- bias: log of the empirical firing rate (exact MAP for a bias-only exp-GLM);
- stimulus filters: spike-triggered average projected onto the stimulus basis
  (whitened by the basis design covariance);
- coupling: cross-correlogram-based guesses — the short-lag excess
  cross-correlation between neuron pairs seeds W (and the adjacency, for
  graph models).

All steps are batched jnp ops; no per-neuron Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["smart_initialize"]


def _xcorr_coupling(S: jax.Array, L: int) -> jax.Array:
    """(N_post, N_pre) short-lag excess cross-correlation: mean of
    (centered) S_post[t] · S_pre[t-1-l] over l < L, normalized per pair."""
    Sc = S - S.mean(axis=0, keepdims=True)
    T, N = S.shape
    acc = jnp.zeros((N, N))
    for lag in range(1, L + 1):
        acc = acc + Sc[lag:].T @ Sc[:-lag]  # (N_post, N_pre)
    denom = jnp.sqrt(jnp.outer(Sc.var(axis=0), Sc.var(axis=0))) * (T - L) * L
    return acc / jnp.maximum(denom, 1e-12)


def smart_initialize(pop, data, key=None) -> dict:
    """Data-driven initial parameter pytree for ``pop`` given ``data``."""
    if key is None:
        key = jax.random.PRNGKey(0)
    params = pop.sample(key)
    S = data["S"]
    T = S.shape[0]

    # --- bias: log mean rate (floor at ~0.1 Hz to avoid -inf for silent cells)
    mean_rate = jnp.maximum(S.mean(axis=0) / pop.dt, 0.1)
    params["bias"] = jnp.log(mean_rate)

    # --- stimulus weights from the STA
    if "w_stim" in params and "X_stim" in data:
        X = data["X_stim"]  # (T, D·B)
        # ridge-regularized least squares of centered spikes on the design —
        # a whitened-STA; cheap at these sizes and much better conditioned.
        Sc = S - S.mean(axis=0, keepdims=True)
        XtX = X.T @ X + 1e-3 * T * jnp.eye(X.shape[1])
        XtS = X.T @ Sc
        w = jnp.linalg.solve(XtX, XtS)  # (D·B, N)
        # scale into log-rate units: match a modest modulation depth
        scale = 1.0 / jnp.maximum(jnp.abs(w).max(), 1e-6)
        params["w_stim"] = (w * scale).T

    # --- coupling from cross-correlograms
    L = min(pop.L_imp, 20)
    xc = _xcorr_coupling(S, L)
    if "W" in params:
        scale = 1.0 / jnp.maximum(jnp.abs(xc).max(), 1e-6)
        params["W"] = xc * scale
        if not pop.graph.fixed_A:
            # Only seed A for graph models that infer it. Fixed-A graphs
            # (complete) never update A downstream — thresholding here would
            # silently and permanently sever ~75% of edges.
            thresh = jnp.percentile(jnp.abs(xc), 75.0)
            params["A"] = (jnp.abs(xc) >= thresh).astype(params["A"].dtype)
    elif pop.impulse.name == "impulse" and "w_ir" in params:
        # constant-weight models: put the correlation structure into the
        # impulse weights' overall scale (first basis column).
        w_ir = jnp.zeros_like(params["w_ir"])
        params["w_ir"] = w_ir.at[:, :, 0].set(xc)

    return params
