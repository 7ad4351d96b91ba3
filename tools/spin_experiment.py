"""Do the tunnel client's blocking waits burn host CPU (spin-poll)?

On a 1-core host a spinning block_until_ready / D2H wait would strangle
decode+collate on other threads — which would explain every inflated
stage in the sweeps. Method: time a fixed pure-numpy workload alone, then
again while another thread sits in (a) block_until_ready on a fresh H2D,
(b) np.asarray D2H of a just-dispatched big matmul chain.
"""

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def cpu_work(n=30):
    a = rng.normal(size=(400, 400)).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(n):
        a = np.tanh(a @ a.T * 1e-3)
    dt = time.perf_counter() - t0
    return dt


# poison first (real mode)
f = jax.jit(lambda x: x * 2.0 + 1.0)
print("poisoning (first fetch)...", flush=True)
float(f(jnp.float32(1.0)))
print("poisoned", flush=True)

base = min(cpu_work(), cpu_work())
print(f"cpu work alone: {base*1e3:.0f} ms", flush=True)

# (a) concurrent H2D block
res = {}


def h2d():
    arr = rng.integers(0, 255, size=42 << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    jnp.asarray(arr).block_until_ready()
    res["h2d"] = time.perf_counter() - t0


t = threading.Thread(target=h2d)
t.start()
time.sleep(0.05)
dt = cpu_work()
t.join()
print(f"cpu work during 42MB H2D block: {dt*1e3:.0f} ms "
      f"(x{dt/base:.1f}); h2d took {res['h2d']*1e3:.0f} ms", flush=True)

# (b) concurrent D2H wait on a compute result
g = jax.jit(lambda x: ((x @ x) @ x) @ x)
x = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
np.asarray(g(x))  # warm


def d2h():
    y = g(x * 1.0001)
    t0 = time.perf_counter()
    np.asarray(y)
    res["d2h"] = time.perf_counter() - t0


t = threading.Thread(target=d2h)
t.start()
time.sleep(0.05)
dt = cpu_work()
t.join()
print(f"cpu work during D2H wait: {dt*1e3:.0f} ms (x{dt/base:.1f}); "
      f"d2h took {res['d2h']*1e3:.0f} ms", flush=True)
