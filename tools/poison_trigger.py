"""Which host-side operation flips the tunnel into the slow-H2D mode?

Run with an arg picking the candidate trigger; each run is a FRESH process:
  none      - no trigger, just repeated H2D (control)
  exec      - jit execution, result left on device (no fetch)
  fetch     - jit execution + np.asarray fetch of the result
  float     - jit execution + float() scalar fetch
  block     - jit execution + block_until_ready only
  get       - jit execution + jax.device_get
  fetch_h2d - device_put then np.asarray of THAT (fetch of a transferred buf)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

mode = sys.argv[1]
rng = np.random.default_rng(0)


def raw(tag, reps=3):
    ts = []
    for _ in range(reps):
        arr = rng.integers(0, 255, size=21 << 20, dtype=np.uint8)
        t0 = time.perf_counter()
        jnp.asarray(arr).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {[round(t*1e3,1) for t in ts]}", flush=True)


raw("before")
f = jax.jit(lambda x: x * 2.0 + 1.0)
if mode == "none":
    pass
elif mode == "exec":
    y = f(jnp.float32(1.0))
elif mode == "fetch":
    y = np.asarray(f(jnp.float32(1.0)))
elif mode == "float":
    y = float(f(jnp.float32(1.0)))
elif mode == "block":
    y = f(jnp.float32(1.0))
    y.block_until_ready()
elif mode == "get":
    y = jax.device_get(f(jnp.float32(1.0)))
elif mode == "fetch_h2d":
    d = jnp.asarray(rng.integers(0, 255, size=1024, dtype=np.uint8))
    y = np.asarray(d)
raw("after-" + mode)
raw("again-" + mode)
