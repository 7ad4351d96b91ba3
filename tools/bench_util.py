"""Measurement helpers for TPU micro-benchmarks behind the axon tunnel.

The tunnel adds a large, time-varying per-dispatch cost (~5-30 ms) and
memoizes identical dispatches, so single-dispatch timings are meaningless.
Methodology here:

- run the op body K times inside ONE jit via lax.scan, chained through a
  scalar carry (forces sequential execution, defeats memoization);
- measure at two different K and report the slope
  (t_K2 - t_K1) / (K2 - K1) = per-iteration device time, with the
  per-dispatch cost cancelled exactly.
"""

from __future__ import annotations

import time

import numpy as np


def scan_slope_time(body, args, k1=4, k2=12, iters=5):
    """Per-iteration device time of ``body(carry, *args) -> carry``.

    body must consume the scalar f32 carry (e.g. add carry * 1e-6 to an
    input) and return a scalar f32 carry, so iterations are data-dependent.
    """
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def run(c, *a):
            def step(c, _):
                return body(c, *a), None
            out, _ = jax.lax.scan(step, c, None, length=k)
            return out
        return run

    run1, run2 = make(k1), make(k2)
    float(run1(jnp.float32(0.0), *args))  # compile + warm
    float(run2(jnp.float32(0.0), *args))

    def med(run):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.0), *args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = med(run1), med(run2)
    return (t2 - t1) / (k2 - k1)
