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


def _kmeans_labels(emb, K, n_iter: int = 50, seed: int = 0):
    """Tiny deterministic Lloyd's k-means on the spectral embedding
    (host-side init utility — numpy, no sklearn dependency)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    # k-means++-style seeding
    centers = [emb[rng.randint(len(emb))]]
    for _ in range(K - 1):
        d2 = np.min(
            [np.sum((emb - c) ** 2, axis=1) for c in centers], axis=0
        )
        p = d2 / max(d2.sum(), 1e-12)
        centers.append(emb[rng.choice(len(emb), p=p)])
    centers = np.stack(centers)
    labels = np.zeros(len(emb), dtype=np.int64)
    for _ in range(n_iter):
        d = ((emb[:, None, :] - centers[None]) ** 2).sum(-1)
        new = d.argmin(1)
        if np.array_equal(new, labels):
            break
        labels = new
        for k in range(K):
            if np.any(labels == k):
                centers[k] = emb[labels == k].mean(0)
    return labels


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

    # --- impulse filters: start at the PRIOR MEAN logits, not a random
    # draw. For normalized (unit-area softmax) impulses the weight W carries
    # the magnitude and w_ir only shapes the filter; a random per-pair shape
    # dilutes every edge's likelihood evidence at the start of MCMC, and
    # edges that stay off give the filter no gradient to recover by — the
    # mean (typical, early-peaked) shape correlates with every draw from
    # the prior and lets strong edges switch on immediately.
    if pop.impulse.name == "impulse" and "w_ir" in params and (
        pop.spec.get("impulse", {}).get("type") == "normalized"
    ):
        mu_ir = jnp.asarray(pop.spec["impulse"].get("mu", 0.0))
        params["w_ir"] = jnp.broadcast_to(
            mu_ir, params["w_ir"].shape
        ).astype(params["w_ir"].dtype)

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
        if pop.graph.name == "sbm" and "y" in params:
            # Seed the latent types by spectral clustering of the adjacency
            # guess, and the block matrix/mixing weights from the implied
            # counts. Random types make the early Gibbs sweeps
            # self-reinforcing in the WRONG direction: y junk ⇒ Bm resampled
            # from junk blocks ⇒ edge prior pushes A toward the junk pattern
            # ⇒ y junk again — a feedback mode the sampler escapes only by
            # luck. A block-aware seed points the same feedback loop at the
            # data's actual structure.
            import numpy as np

            K = int(pop.spec["network"]["graph"].get("K", 2))
            A_g = np.asarray(params["A"], dtype=np.float64)
            M = A_g + A_g.T
            M = M - M.mean()
            _, vecs = np.linalg.eigh(M)
            emb = vecs[:, -K:]  # top-K eigenvectors
            y = _kmeans_labels(emb, K)
            onehot = np.eye(K)[y]
            counts = onehot.sum(0)
            pi = (counts + 1.0) / (counts.sum() + K)
            edges = onehot.T @ A_g @ onehot
            pairs = np.outer(counts, counts)
            Bm = np.clip((edges + 1.0) / (pairs + 2.0), 1e-3, 1 - 1e-3)
            params["y"] = jnp.asarray(y, params["y"].dtype)
            params["pi"] = jnp.asarray(pi, params["pi"].dtype)
            params["Bm"] = jnp.asarray(Bm, params["Bm"].dtype)
    elif pop.impulse.name == "impulse" and "w_ir" in params:
        # constant-weight models: put the correlation structure into the
        # impulse weights' overall scale (first basis column).
        w_ir = jnp.zeros_like(params["w_ir"])
        params["w_ir"] = w_ir.at[:, :, 0].set(xc)

    return params
