"""Held-out predictive log-likelihood (SURVEY.md §4: the reference's
quantitative check — predictive log-lik on held-out data).

For MAP fits this is just ``pop.log_likelihood(params, data_heldout)``.
For MCMC, the posterior-predictive density averages the likelihood over
posterior samples in probability space:

    log p(S_ho | S_tr) ≈ logsumexp_k [ LL(S_ho | θ_k) ] − log K

evaluated by scanning the sample stack device-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["predictive_log_likelihood", "map_heldout_log_likelihood"]


def map_heldout_log_likelihood(pop, params, data_heldout):
    return pop.log_likelihood(params, data_heldout)


def predictive_log_likelihood(pop, samples: dict, data_heldout, batch: int = 32):
    """Posterior-predictive log-likelihood from a stacked sample pytree
    (leading axis = draws; chain axes may be folded in beforehand)."""
    samples = {k: jnp.asarray(v) for k, v in samples.items()}
    K = next(iter(samples.values())).shape[0]

    @jax.jit
    def lls(samples):
        def one(params):
            return pop.log_likelihood(params, data_heldout)

        return jax.lax.map(one, samples, batch_size=min(batch, K))

    vals = lls(samples)
    return jax.scipy.special.logsumexp(vals) - jnp.log(float(K))
