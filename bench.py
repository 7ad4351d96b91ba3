"""Benchmark: end-to-end inference throughput of the flagship RPR model.

Measures query pairs/sec of the jitted forward (ResUNet + correlation volume
warping + Procrustes head) at the reference inference resolution (360x270,
reference config/regression/mapfree/3d3d.yaml) on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 2,000 query pairs/sec end-to-end on the
MapFree val sweep (BASELINE.md; the torch reference runs batch-1 on one GPU).
"""

import json
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 2000.0


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the fused-kernel model takes minutes to
    # compile cold; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapfree_tpu.config import cfg as default_cfg
    from mapfree_tpu.models import build_regression_net

    cfg = default_cfg.clone()
    cfg.merge_from_file("configs/mapfree.yaml")
    cfg.merge_from_file("configs/regression/mapfree/3d3d.yaml")

    net = build_regression_net(cfg)
    H, W = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    B = int(cfg.TPU.INFER_BATCH)

    rng = np.random.default_rng(0)
    image0 = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    image1 = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)

    variables = jax.jit(net.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), image0, image1, False
    )

    @jax.jit
    def step(carry, image0, image1):
        # chain iterations through a data dependency so remote/async backends
        # cannot cache or pipeline away the measured work
        R, t, _ = net.apply(
            variables, image0 + carry * 1e-6, image1, train=False
        )
        return jnp.sum(R) + jnp.sum(t)

    # warmup/compile (forcing a host transfer completes remote execution)
    carry = jnp.float32(0.0)
    carry = step(carry, image0, image1)
    float(carry)

    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        carry = step(carry, image0, image1)
    float(carry)  # forces the whole chain
    elapsed = time.perf_counter() - start

    pairs_per_sec = (B * n_iters) / elapsed
    print(
        json.dumps(
            {
                "metric": "rpr_inference_throughput",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
