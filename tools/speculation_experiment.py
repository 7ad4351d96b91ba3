"""Is speculation-mode H2D sent eagerly (async at wire speed) or lazily?

Record N big transfers + dependent dispatches WITHOUT any fetch, idle a
moment, then time the first materialization. If the bytes crossed eagerly
while recording, materialization costs ~compute only; if lazily, it pays
~total_bytes / real_wire_speed (~30 MB/s -> many seconds).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)

g = jax.jit(lambda x: jnp.float32(x.astype(jnp.float32).sum()))

N = 8
MB = 21
outs = []
t0 = time.perf_counter()
for i in range(N):
    arr = rng.integers(0, 255, size=MB << 20, dtype=np.uint8)
    d = jnp.asarray(arr)
    d.block_until_ready()
    outs.append(g(d))
t1 = time.perf_counter()
print(f"record {N}x{MB}MB + dispatch: {t1-t0:.2f} s", flush=True)

time.sleep(3.0)  # give an eager async sender time to drain

t0 = time.perf_counter()
first = float(outs[0])
t1 = time.perf_counter()
rest = [float(o) for o in outs[1:]]
t2 = time.perf_counter()
print(f"first materialization: {t1-t0:.2f} s; remaining {N-1} fetches: "
      f"{t2-t1:.2f} s", flush=True)
print("checksums ok:", all(np.isfinite(v) for v in [first] + rest), flush=True)

# post-materialization control: one more transfer+dispatch+fetch round
arr = rng.integers(0, 255, size=MB << 20, dtype=np.uint8)
t0 = time.perf_counter()
d = jnp.asarray(arr)
d.block_until_ready()
t1 = time.perf_counter()
v = float(g(d))
t2 = time.perf_counter()
print(f"poisoned control: transfer {t1-t0:.2f} s, dispatch+fetch "
      f"{t2-t1:.2f} s", flush=True)
