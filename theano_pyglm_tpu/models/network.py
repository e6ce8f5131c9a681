"""Network component — graph (adjacency) and weight priors.

Functional rebuild of ``pyglm/components/{graph,weights,network,latent}.py``
(SURVEY.md §2). The network contributes the effective coupling matrix
G = A ∘ W used by the impulse component, plus log-priors over the binary
adjacency A, real weights W, and any latent variables the graph prior
introduces (SBM types/blocks, latent locations).

Orientation convention (documented spec): **A[n, m] is the edge m → n**, i.e.
row = postsynaptic, column = presynaptic, matching the (N_post, N_pre, B)
layout of the impulse weights. The GLM for neuron n reads row n of A and W.

Graph priors (≅ pyglm/components/graph.py):
  'complete'     A ≡ 1, no latents.
  'erdos_renyi'  A[n,m] ~ Bern(ρ); ρ fixed, or Beta(a,b)-distributed and
                 conjugately resampled when spec['infer_rho'] is true.
  'sbm'          y_n ~ Cat(π), π ~ Dir(α0·1_K), B[k,k'] ~ Beta(b0,b1) iid,
                 A[n,m] ~ Bern(B[y_n, y_m]).
  'distance'     ℓ_n ~ N(0, σ_ℓ² I_D); A[n,m] ~ Bern(σ(η0 − ‖ℓ_n−ℓ_m‖²/τ²)).

Weight priors (≅ pyglm/components/weights.py):
  'constant'     W ≡ value (default 1), no parameters.
  'gaussian'     W[n,m] ~ N(μ, σ²), with optional distinct diagonal
                 (refractory/self-coupling) mean/scale μ_self, σ_self.

Every graph prior exposes ``edge_prob(params) -> (N, N)`` — the conditional
Bernoulli probability p(A[n,m]=1 | latents) — which is exactly what the
collapsed-Gibbs adjacency update needs (SURVEY.md §3.3), and every weight
prior exposes per-entry prior (mu, sigma) matrices so disconnected weights can
be refreshed from their prior during MCMC.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from theano_pyglm_tpu.ops.distributions import (
    bernoulli_logpmf,
    beta_logpdf,
    categorical_logpmf,
    dirichlet_logpdf,
    gaussian_logpdf,
)

__all__ = ["GraphComponent", "WeightComponent", "make_graph", "make_weights"]


class GraphComponent(NamedTuple):
    name: str
    sample: Callable  # key -> dict of param leaves (incl. 'A')
    log_prior: Callable  # params -> scalar (latents + A | latents)
    edge_prob: Callable  # params -> (N, N) p(A=1 | latents)
    fixed_A: bool  # True ⇒ A is deterministically all-ones
    continuous_keys: tuple  # latent leaves HMC may update
    discrete_keys: tuple  # latent leaves Gibbs updates (besides 'A')


class WeightComponent(NamedTuple):
    name: str
    sample: Callable  # key -> dict of param leaves
    log_prior: Callable  # params -> scalar
    effective_W: Callable  # params -> (N, N)
    prior_mu_sigma: Callable  # (params) -> ((N,N) mu, (N,N) sigma) or None if constant
    has_W: bool


# --- graph priors ---------------------------------------------------------


def make_graph(spec: dict, N: int) -> GraphComponent:
    typ = spec.get("type", "complete")

    if typ == "complete":

        def sample(key):
            return {"A": jnp.ones((N, N))}

        def log_prior(params):
            return jnp.asarray(0.0)

        def edge_prob(params):
            return jnp.ones((N, N))

        return GraphComponent("complete", sample, log_prior, edge_prob, True, (), ())

    if typ == "erdos_renyi":
        rho0 = float(spec.get("rho", 0.2))
        infer_rho = bool(spec.get("infer_rho", False))
        a0, b0 = [float(v) for v in spec.get("rho_prior", (1.0, 1.0))]

        def sample(key):
            k1, k2 = jax.random.split(key)
            rho = jax.random.beta(k1, a0, b0) if infer_rho else jnp.asarray(rho0)
            A = jax.random.bernoulli(k2, rho, (N, N)).astype(jnp.float32)
            out = {"A": A}
            if infer_rho:
                out["rho"] = rho
            return out

        def edge_prob(params):
            rho = params.get("rho", rho0)
            return jnp.broadcast_to(jnp.asarray(rho), (N, N))

        def log_prior(params):
            lp = jnp.sum(bernoulli_logpmf(params["A"], edge_prob(params)))
            if infer_rho:
                lp = lp + beta_logpdf(params["rho"], a0, b0)
            return lp

        return GraphComponent("erdos_renyi", sample, log_prior, edge_prob, False, (), ())

    if typ == "sbm":
        K = int(spec.get("K", 2))
        alpha0 = float(spec.get("alpha0", 1.0))
        b0, b1 = [float(v) for v in spec.get("B_prior", (1.0, 1.0))]

        def sample(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            pi = jax.random.dirichlet(k1, alpha0 * jnp.ones(K))
            y = jax.random.categorical(k2, jnp.log(pi), shape=(N,))
            Bm = jax.random.beta(k3, b0, b1, (K, K))
            A = jax.random.bernoulli(k4, Bm[y[:, None], y[None, :]]).astype(jnp.float32)
            return {"A": A, "y": y, "pi": pi, "Bm": Bm}

        def edge_prob(params):
            y = params["y"]
            return params["Bm"][y[:, None], y[None, :]]

        def log_prior(params):
            pi, y, Bm = params["pi"], params["y"], params["Bm"]
            lp = dirichlet_logpdf(pi, alpha0 * jnp.ones(K))
            lp = lp + jnp.sum(categorical_logpmf(y, jnp.broadcast_to(jnp.log(pi), (N, K))))
            lp = lp + jnp.sum(beta_logpdf(Bm, b0, b1))
            lp = lp + jnp.sum(bernoulli_logpmf(params["A"], edge_prob(params)))
            return lp

        return GraphComponent("sbm", sample, log_prior, edge_prob, False, (), ("y",))

    if typ == "distance":
        D = int(spec.get("D", 2))
        sigma_l = float(spec.get("sigma_l", 1.0))
        tau = float(spec.get("tau", 1.0))
        eta0 = float(spec.get("eta0", 0.0))

        def _logits(locs):
            d2 = jnp.sum((locs[:, None, :] - locs[None, :, :]) ** 2, axis=-1)
            return eta0 - d2 / (tau * tau)

        def sample(key):
            k1, k2 = jax.random.split(key)
            locs = sigma_l * jax.random.normal(k1, (N, D))
            p = jax.nn.sigmoid(_logits(locs))
            A = jax.random.bernoulli(k2, p).astype(jnp.float32)
            return {"A": A, "locs": locs}

        def edge_prob(params):
            return jax.nn.sigmoid(_logits(params["locs"]))

        def log_prior(params):
            lp = jnp.sum(gaussian_logpdf(params["locs"], 0.0, sigma_l))
            lp = lp + jnp.sum(bernoulli_logpmf(params["A"], edge_prob(params)))
            return lp

        return GraphComponent("distance", sample, log_prior, edge_prob, False, ("locs",), ())

    raise ValueError(f"unknown graph type {typ!r}")


# --- weight priors --------------------------------------------------------


def make_weights(spec: dict, N: int) -> WeightComponent:
    typ = spec.get("type", "constant")

    if typ == "constant":
        value = float(spec.get("value", 1.0))

        def sample(key):
            return {}

        def log_prior(params):
            return jnp.asarray(0.0)

        def effective_W(params):
            return jnp.full((N, N), value)

        return WeightComponent("constant", sample, log_prior, effective_W, lambda params: None, False)

    if typ == "gaussian":
        mu = float(spec.get("mu", 0.0))
        sigma = float(spec.get("sigma", 1.0))
        mu_self = float(spec.get("mu_self", spec.get("mu_refractory", mu)))
        sigma_self = float(spec.get("sigma_self", spec.get("sigma_refractory", sigma)))
        infer_hypers = bool(spec.get("infer_hypers", False))
        # Normal–Inverse-Gamma hyperprior on the off-diagonal (μ_W, σ_W²):
        # μ_W | σ² ~ N(m0, σ²/k0), σ² ~ InvGamma(a0, b0). Conjugately
        # resampled by inference.gibbs.update_weight_hypers (SURVEY.md §2
        # "hyperparameter resampling via conjugacy").
        m0, k0 = float(spec.get("m0", 0.0)), float(spec.get("k0", 1.0))
        a0, b0 = float(spec.get("a0", 2.0)), float(spec.get("b0", 2.0))

        eye = jnp.eye(N)

        def mu_sig(params):
            mu_od = params.get("W_mu", mu) if infer_hypers else mu
            sig_od = params.get("W_sigma", sigma) if infer_hypers else sigma
            MU = mu_od * (1 - eye) + mu_self * eye
            SIG = sig_od * (1 - eye) + sigma_self * eye
            return MU, SIG

        def sample(key):
            k1, k2, k3 = jax.random.split(key, 3)
            out = {}
            if infer_hypers:
                var = b0 / jax.random.gamma(k2, a0)  # InvGamma(a0, b0)
                out["W_sigma"] = jnp.sqrt(var)
                out["W_mu"] = m0 + jnp.sqrt(var / k0) * jax.random.normal(k3)
            MU, SIG = mu_sig(out)
            out["W"] = MU + SIG * jax.random.normal(k1, (N, N))
            return out

        def log_prior(params):
            MU, SIG = mu_sig(params)
            lp = jnp.sum(gaussian_logpdf(params["W"], MU, SIG))
            if infer_hypers:
                var = params["W_sigma"] ** 2
                # InvGamma(a0,b0) density in σ² plus N(m0, σ²/k0) on μ
                lp = lp + (-(a0 + 1.0) * jnp.log(var) - b0 / var)
                lp = lp + gaussian_logpdf(params["W_mu"], m0, params["W_sigma"] / jnp.sqrt(k0))
            return lp

        def effective_W(params):
            return params["W"]

        comp = WeightComponent(
            "gaussian", sample, log_prior, effective_W, mu_sig, True
        )
        return comp

    raise ValueError(f"unknown weight type {typ!r}")
