#!/usr/bin/env python
"""HMC ESS/sec on the 27-neuron network GLM — the second BASELINE.md metric.

Runs the full Gibbs/HMC sampler on synthetic data from the flagship
distance-dependent model (acceptance config 5's family) and reports effective
samples per second for the coupling weights W, plus the wall-clock for the
10k-iteration north-star extrapolated from the measured per-sweep time.

  python benchmarks/ess_per_sec.py [--N 27] [--T 60000] [--n_samples 500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=27)
    p.add_argument("--T", type=int, default=60_000)
    p.add_argument("--n_samples", type=int, default=500)
    p.add_argument("--n_warmup", type=int, default=200)
    args = p.parse_args()

    import jax

    from theano_pyglm_tpu import Population, make_model
    from theano_pyglm_tpu.inference import gibbs_sample
    from theano_pyglm_tpu.utils.diagnostics import ess

    pop = Population(make_model("distance_weighted_model", args.N))
    true = pop.sample(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    stim = rng.randn(args.T, 1).astype(np.float32)
    S, rates = pop.simulate(jax.random.PRNGKey(1), true, args.T, stim=stim)
    data = pop.prepare_data(S, stim=stim)
    print(
        f"data: N={args.N} T={args.T} spikes={float(np.asarray(S).sum()):.0f} "
        f"({float(np.asarray(rates).mean()):.1f} Hz)",
        file=sys.stderr,
    )

    # warmup chunk also triggers compilation; exclude it from timing
    t0 = time.perf_counter()
    samples, diag, _ = gibbs_sample(
        pop, data, jax.random.PRNGKey(2),
        n_samples=args.n_samples, n_warmup=args.n_warmup, chunk_size=100,
    )
    wall = time.perf_counter() - t0

    W = samples["W"][:, None, :, :]  # (draws, 1 chain, N, N)
    ess_W = ess(W)
    med_ess, min_ess = float(np.nanmedian(ess_W)), float(np.nanmin(ess_W))
    sweeps = args.n_samples + args.n_warmup
    per_sweep = wall / sweeps
    print(
        json.dumps(
            {
                "metric": f"hmc_gibbs_ess_per_sec_W_N{args.N}",
                "value": round(med_ess / wall, 3),
                "unit": "ESS/s (median over W entries)",
                "min_ess_per_sec": round(min_ess / wall, 4),
                "ms_per_sweep": round(per_sweep * 1e3, 2),
                "projected_10k_iters_minutes": round(per_sweep * 10_000 / 60, 2),
                "accept_rate": round(float(diag["accept_rate_glm"]), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
