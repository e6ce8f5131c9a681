#!/usr/bin/env python
"""Chip roofline probe: HBM streams + MXU rate through the axon tunnel.

Exists to reconcile the round-2 anomaly (BASELINE.md): raw stream probes
measured 45-137 GB/s on sum-reductions, 6-18x below the v5e's 819 GB/s
spec, and BASELINE.md declared that the "practical roofline". Round 3
re-measured with two fixes and the anomaly disappeared:

1. **Anti-DCE that survives f32.** The obvious per-iteration perturbation
   ``x * (1 + 1e-30 * i)`` constant-folds to identity in f32 (1 + 1e-30
   == 1.0), so XLA deletes the whole scan body and the "measured" numbers
   are pure fiction (first attempt printed 250 TB/s and 34,000 TFLOP/s).
   The scale must exceed f32 epsilon: ``1 + 1e-6 * i``.
2. **Amortize the tunnel RTT.** One dispatch+fetch through the axon
   tunnel costs ~30 ms (measured null-op below). A probe that streams
   512 MB once measures the tunnel, not the chip: 512 MB @ 819 GB/s is
   0.6 ms of device time inside a 30 ms round trip. REP=200 in-scan
   repetitions puts device time at ~10x RTT.

Measured round 3 (v5e one chip, this script):
  null RTT 31.5 ms; copy 608 GB/s, 1d-sum 700 GB/s (74-85% of 819 spec —
  normal); matmul bf16 4096^3 192.7 TFLOP/s (98% of the 197 spec), f32
  155 TFLOP/s. The chip is healthy; the round-2 numbers were the RTT.

  python benchmarks/roofline_probe.py [--rep 200] [--mb 512]
"""
import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rep", type=int, default=200)
    p.add_argument("--mb", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], file=sys.stderr)
    REP, mb = args.rep, args.mb

    def bench(fn, x):
        np.asarray(fn(x))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    nul = bench(jax.jit(lambda x: x + 1.0), jnp.float32(1.0))
    print(f"null dispatch+fetch RTT: {nul * 1e3:.1f} ms")

    n = mb * 1024 * 1024 // 4
    x = jnp.full((n,), 0.5, jnp.float32)

    @jax.jit
    def copyloop(x):
        def body(c, i):
            return c * (1.0 + 1e-6 * i.astype(jnp.float32)), None

        y, _ = jax.lax.scan(body, x, jnp.arange(REP))
        return jnp.sum(y[:8])

    dt = bench(copyloop, x)
    print(
        f"copy {mb}MB x{REP}: {2 * mb / 1024 * REP / dt:.0f} GB/s raw, "
        f"{2 * mb / 1024 * REP / (dt - nul):.0f} GB/s RTT-corrected"
    )

    @jax.jit
    def redloop(x):
        def body(c, i):
            return c + jnp.sum(x * (1.0 + 1e-6 * i.astype(jnp.float32))), None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
        return s

    dt = bench(redloop, x)
    print(
        f"1d-sum {mb}MB x{REP}: {mb / 1024 * REP / dt:.0f} GB/s raw, "
        f"{mb / 1024 * REP / (dt - nul):.0f} GB/s RTT-corrected"
    )

    m = 4096
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        a = (jnp.eye(m, dtype=jnp.float32) * 0.999).astype(dtype)

        @jax.jit
        def mmloop(a):
            def body(c, i):
                return jnp.dot(c, a, preferred_element_type=dtype), None

            y, _ = jax.lax.scan(body, a, jnp.arange(REP))
            return jnp.sum(y[:2, :2].astype(jnp.float32))

        dt = bench(mmloop, a)
        print(
            f"matmul {name} {m}^3 x{REP}: {2 * m**3 * REP / dt / 1e12:.1f} "
            f"TFLOP/s raw, {2 * m**3 * REP / (dt - nul) / 1e12:.1f} corrected"
        )


if __name__ == "__main__":
    main()
