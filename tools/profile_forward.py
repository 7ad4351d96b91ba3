"""Profile the flagship RPR forward on the real TPU.

Separates tunnel-dispatch overhead from device compute:

1. dispatch-chained throughput (what bench.py measures): one jit call per
   batch, chained through a scalar carry, fenced by a final host read;
2. scan throughput: K batches consumed by ONE dispatch via lax.scan — no
   per-batch dispatch cost, so this is the device-side speed of light for
   the model;
3. per-component timings (encoder / aggregator / head) with the same
   chained-carry methodology.

Usage: python tools/profile_forward.py [--batches 8 16 32 64] [--scan-k 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _flagship_cfg():
    from mapfree_tpu.config import cfg as default_cfg

    cfg = default_cfg.clone()
    cfg.merge_from_file("configs/mapfree.yaml")
    cfg.merge_from_file("configs/regression/mapfree/3d3d.yaml")
    return cfg


def _timeit(fn, *args, iters=8):
    """Median wall time of fn(*args) -> scalar jax value, host-read fenced."""
    ts = []
    for _ in range(iters):
        start = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - start)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--scan-k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapfree_tpu.models import build_regression_net

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = _flagship_cfg()
    net = build_regression_net(cfg)
    h, w = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    rng = np.random.default_rng(0)
    print(f"resolution {h}x{w}, backend {jax.default_backend()}")

    for B in args.batches:
        img0 = jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32)
        img1 = jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32)
        variables = jax.jit(net.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), img0, img1, False
        )

        # --- 1. dispatch-chained (bench.py methodology) ---
        @jax.jit
        def step(carry, a, b):
            R, t, _ = net.apply(variables, a + carry * 1e-6, b + carry * 1e-7,
                                train=False)
            return carry + jnp.sum(R) + jnp.sum(t)

        c = step(jnp.float32(0.0), img0, img1)
        float(c)  # compile + warm

        def chained(n):
            cc = jnp.float32(0.0)
            for _ in range(n):
                cc = step(cc, img0, img1)
            return cc

        n = max(4, 128 // B)
        t_chain = _timeit(chained, n, iters=5) / n

        # --- 2. scan: K batches in one dispatch ---
        K = args.scan_k
        xs0 = jnp.asarray(rng.normal(size=(K, B, h, w, 3)), jnp.float32)
        xs1 = jnp.asarray(rng.normal(size=(K, B, h, w, 3)), jnp.float32)

        @jax.jit
        def scan_steps(carry, xs0, xs1):
            def body(c, x):
                a, b = x
                R, t, _ = net.apply(variables, a + c * 1e-6, b + c * 1e-7,
                                    train=False)
                return c + jnp.sum(R) + jnp.sum(t), None
            out, _ = jax.lax.scan(body, carry, (xs0, xs1))
            return out

        float(scan_steps(jnp.float32(0.0), xs0, xs1))  # compile + warm
        t_scan = _timeit(scan_steps, jnp.float32(0.0), xs0, xs1, iters=5) / K

        print(
            f"B={B:3d}  chained {t_chain * 1e3:8.2f} ms/batch "
            f"({B / t_chain:8.1f} pairs/s)   "
            f"scan[{K}] {t_scan * 1e3:8.2f} ms/batch ({B / t_scan:8.1f} pairs/s)"
        )

    # --- 3. per-component timings at the best batch ---
    B = args.batches[-1]
    from mapfree_tpu.models.aggregators import build_aggregator
    from mapfree_tpu.models.encoders import build_encoder
    from mapfree_tpu.models.heads import build_head

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    enc = build_encoder(cfg.ENCODER, dtype=dtype, remat=bool(cfg.TPU.REMAT))
    agg = build_aggregator(cfg.AGGREGATOR, dtype=dtype,
                           fused=bool(cfg.TPU.FUSED_CORRELATION))
    head = build_head(cfg, dtype=dtype)

    stacked = jnp.asarray(rng.normal(size=(2 * B, h, w, 3)), dtype)
    ev = jax.jit(enc.init, static_argnums=(2,))(jax.random.PRNGKey(0), stacked, False)

    @jax.jit
    def enc_step(c, x):
        out = enc.apply(ev, x + c * 1e-6, False)
        return c + jnp.sum(out.astype(jnp.float32)), out

    c, vols = enc_step(jnp.float32(0.0), stacked)
    float(c)
    t_enc = _timeit(lambda: enc_step(jnp.float32(0.0), stacked)[0], iters=8)
    fh, fw, fc = vols.shape[1:]
    print(f"feature map {fh}x{fw}x{fc}")

    vol0, vol1 = vols[:B], vols[B:]
    av = jax.jit(agg.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), vol0, vol1, False)

    @jax.jit
    def agg_step(c, a, b):
        out = agg.apply(av, a + c.astype(a.dtype) * 1e-3, b, False)
        return c + jnp.sum(out.astype(jnp.float32)), out

    c, gv = agg_step(jnp.float32(0.0), vol0, vol1)
    float(c)
    t_agg = _timeit(lambda: agg_step(jnp.float32(0.0), vol0, vol1)[0], iters=8)

    hv = jax.jit(head.init, static_argnums=(2,))(jax.random.PRNGKey(0), gv, False)

    @jax.jit
    def head_step(c, g):
        R, t, _ = head.apply(hv, g + c.astype(g.dtype) * 1e-3, False)
        return c + jnp.sum(R) + jnp.sum(t)

    float(head_step(jnp.float32(0.0), gv))
    t_head = _timeit(lambda: head_step(jnp.float32(0.0), gv), iters=8)

    total = t_enc + t_agg + t_head
    print(f"components at B={B} (dispatch-chained, so each includes ~1 dispatch):")
    print(f"  encoder(2B={2*B}) {t_enc*1e3:8.2f} ms  ({100*t_enc/total:4.1f}%)")
    print(f"  aggregator       {t_agg*1e3:8.2f} ms  ({100*t_agg/total:4.1f}%)")
    print(f"  head             {t_head*1e3:8.2f} ms  ({100*t_head/total:4.1f}%)")


if __name__ == "__main__":
    main()
