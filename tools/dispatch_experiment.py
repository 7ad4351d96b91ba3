"""Per-dispatch cost of the BIG forward executable on the tunnel.

Compares:
  a) closure-captured variables (current builder style)
  b) variables passed as jit args (device-resident)
  c) lax.scan over K in-graph batches (the scan-slope style bench uses)
to localise where the ~280 ms/dispatch observed in pipeline_experiment.py
comes from.
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench
from mapfree_tpu.models import build_regression_net


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = bench._flagship_cfg()
    net = build_regression_net(cfg)
    h, w = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    B = 32

    gen = jax.jit(lambda key: jax.random.normal(key, (B, h, w, 3), jnp.float32))
    img0 = gen(jax.random.PRNGKey(1))
    img1 = gen(jax.random.PRNGKey(2))
    variables = jax.jit(net.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), img0, img1, False)
    n_params = sum(x.size for x in jax.tree.leaves(variables))
    print(f"params: {n_params/1e6:.1f} M")

    @jax.jit
    def fwd_closure(a, b):
        R, t, _ = net.apply(variables, a, b, train=False)
        return jnp.concatenate([R, t.reshape(-1, 1, 3)], axis=1)

    @jax.jit
    def fwd_args(v, a, b):
        R, t, _ = net.apply(v, a, b, train=False)
        return jnp.concatenate([R, t.reshape(-1, 1, 3)], axis=1)

    # distinct inputs per call (tunnel memoizes identical dispatches)
    imgs = [(gen(jax.random.PRNGKey(10 + i)), gen(jax.random.PRNGKey(50 + i)))
            for i in range(6)]

    np.asarray(fwd_closure(*imgs[0]))  # warm
    np.asarray(fwd_args(variables, *imgs[0]))

    for name, call in [("closure", lambda a, b: fwd_closure(a, b)),
                       ("args   ", lambda a, b: fwd_args(variables, a, b))]:
        ts = []
        for a, b in imgs:
            t0 = time.perf_counter()
            np.asarray(call(a, b))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: per-dispatch {np.median(ts)*1e3:7.1f} ms "
              f"{[round(t*1e3) for t in ts]}")

    # async pipelining: dispatch all 6 then fetch all 6
    for name, call in [("closure", lambda a, b: fwd_closure(a, b)),
                       ("args   ", lambda a, b: fwd_args(variables, a, b))]:
        outs = []
        t0 = time.perf_counter()
        for a, b in imgs:
            outs.append(call(a, b))
        t1 = time.perf_counter()
        for o in outs:
            np.asarray(o)
        t2 = time.perf_counter()
        print(f"{name} async: dispatch-all {1e3*(t1-t0):.1f} ms, "
              f"drain {1e3*(t2-t0):.1f} ms total "
              f"-> {6*B/(t2-t0):.1f} pairs/s")


if __name__ == "__main__":
    main()
