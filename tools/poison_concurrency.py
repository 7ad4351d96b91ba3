"""Poisoned-mode (post-first-fetch) transfer behaviour.

After the first D2H materialization the tunnel leaves speculation mode and
every H2D costs real round trips (~30 ms/MB-chunk). Measures, in that REAL
mode: single-stream bandwidth, N-thread concurrency scaling, small-piece
splitting, and transfer-during-compute overlap.
"""

import concurrent.futures
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)

# enter real mode: execute + fetch once
f = jax.jit(lambda x: x * 2.0 + 1.0)
float(f(jnp.float32(1.0)))


def ship(arr):
    jnp.asarray(arr).block_until_ready()


def bench(label, nthreads, mb_each, reps=3):
    with concurrent.futures.ThreadPoolExecutor(max_workers=nthreads) as ex:
        ts = []
        for _ in range(reps):
            arrs = [rng.integers(0, 255, size=int(mb_each * (1 << 20)),
                                 dtype=np.uint8) for _ in range(nthreads)]
            t0 = time.perf_counter()
            list(ex.map(ship, arrs))
            ts.append(time.perf_counter() - t0)
    total_mb = nthreads * mb_each
    med = float(np.median(ts))
    print(f"{label}: {med*1e3:7.1f} ms for {total_mb:.0f} MB "
          f"({total_mb/med:6.1f} MB/s) {[round(t*1e3) for t in ts]}",
          flush=True)


bench("1 thread x 21MB ", 1, 21)
bench("2 threads x 10.5", 2, 10.5)
bench("4 threads x 5.25", 4, 5.25)
bench("8 threads x 2.6 ", 8, 2.625)
bench("16 threads x 1.3", 16, 1.3125)
bench("4 threads x 21  ", 4, 21)

# does a jitted no-op "touch" keep anything warm? compare first vs later
# also: serial small pieces from ONE thread (chunk-latency probe)
for mb in (1, 2, 4):
    arrs = [rng.integers(0, 255, size=int(mb << 20), dtype=np.uint8)
            for _ in range(4)]
    t0 = time.perf_counter()
    for a in arrs:
        ship(a)
    dt = time.perf_counter() - t0
    print(f"serial 4x{mb}MB: {dt*1e3:.1f} ms ({4*mb/dt:.1f} MB/s)",
          flush=True)
