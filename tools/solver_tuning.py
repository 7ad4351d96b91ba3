"""Sweep essential-solver internal budgets on real hardware.

Explores the (n_iters, n5, lo_topk) space against the benchmark regimes
(30%/0.5px, 50%/0.5px, 70%/2px) to pick the production defaults for
`estimate_essential` — accuracy first, then pairs/s. Unlike
tools/solver_benchmark.py this is a development tool; it prints a table and
writes nothing. Timing here is coarse (repeat host dispatches, median) —
use solver_benchmark.py for the publishable number.

Usage: python tools/solver_tuning.py [--pairs 64] [--quick]
       [--configs "512,128,16 512,2048,16"]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from solver_benchmark import make_pairs, rot_err_deg, tdir_err_deg  # noqa: E402


def run_cfg(kpts0, kpts1, K, pix_thr, n_iters, n5, lo_topk, iters=3):
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.ops.essential import (cheirality_pose,
                                           estimate_essential,
                                           normalize_keypoints)

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, N, _ = kpts0.shape
    Kb = jnp.tile(jnp.asarray(K, jnp.float32)[None], (B, 1, 1))
    k0 = jnp.asarray(kpts0, jnp.float32)
    k1 = jnp.asarray(kpts1, jnp.float32)
    mask = jnp.ones((B, N), bool)

    @jax.jit
    def solve(key, k0p, k1p):
        x0 = normalize_keypoints(k0p, Kb)
        x1 = normalize_keypoints(k1p, Kb)
        f = (Kb[:, 0, 0] + Kb[:, 1, 1]) / 2.0
        thr = pix_thr / f

        def per_pair(key, x0, x1, m, thr):
            E, inl, valid = estimate_essential(
                key, x0, x1, m, thr, n_iters=n_iters, n5=n5, lo_topk=lo_topk)
            R, t, n, _ = cheirality_pose(E, x0, x1, inl)
            return R, t
        keys = jax.random.split(key, B)
        return jax.vmap(per_pair)(keys, x0, x1, mask, thr)

    R, t = jax.tree_util.tree_map(
        lambda x: x.block_until_ready(), solve(jax.random.PRNGKey(0), k0, k1))

    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready(),
            solve(jax.random.PRNGKey(i + 1), k0 + i * 1e-6, k1))
        ts.append(time.perf_counter() - t0)
    per_batch = float(np.median(ts))
    return np.asarray(R), np.asarray(t), B / per_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--thr", type=float, default=2.0)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", type=str, default=None,
                    help='space-separated "n_iters,n5,lo_topk" triples')
    args = ap.parse_args()

    regimes = [(0.7, 2.0)] if args.quick else [
        (0.3, 0.5), (0.5, 0.5), (0.7, 2.0)]
    if args.configs:
        configs = [tuple(int(v) for v in c.split(","))
                   for c in args.configs.split()]
    else:
        configs = [
            (512, 128, 16),   # current default
            (512, 512, 16),   # 5-pt heavy
            (512, 1024, 16),  # 5-pt very heavy
            (512, 2048, 16),  # 5-pt extreme (chunked)
            (1024, 2048, 32),  # stress tier
        ]

    data = {}
    rng = np.random.default_rng(7)
    for rho, noise in regimes:
        data[(rho, noise)] = make_pairs(
            rng, args.pairs, args.n, noise, rho)

    for n_iters, n5, lo_topk in configs:
        line = f"n_iters={n_iters:5d} n5={n5:5d} topk={lo_topk:2d}: "
        for (rho, noise), (k0, k1, R_gt, t_gt, K) in data.items():
            R, t, pps = run_cfg(k0, k1, K, args.thr, n_iters, n5, lo_topk)
            re = rot_err_deg(R, R_gt)
            te = tdir_err_deg(t, t_gt)
            line += (f"[{rho:.0%}/{noise}px: rot {np.median(re):5.2f}/"
                     f"{np.percentile(re, 90):6.2f} tdir {np.median(te):5.2f}"
                     f" {pps:7.1f}p/s] ")
        print(line, flush=True)


if __name__ == "__main__":
    main()
