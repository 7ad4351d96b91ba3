"""Per-stage cost breakdown of the batched essential-matrix pipeline.

Times each stage of ``estimate_essential``/``essential_pose`` as its own
jitted dispatch on real hardware (scan-free; per-dispatch median over
repeats) so optimisation effort goes to the stage that actually dominates.
Development tool; prints a table, writes nothing.

Usage: python tools/solver_profile.py [--pairs 64] [--n 512] [--iters 512]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from solver_benchmark import make_pairs  # noqa: E402


def timed(fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.ops import essential as ess
    from mapfree_tpu.ops.ransac import magsac_score, masked_sample_indices

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--n5", type=int, default=128)
    ap.add_argument("--outliers", type=float, default=0.5)
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    k0, k1, R_gt, t_gt, K = make_pairs(rng, args.pairs, args.n, 0.5,
                                       args.outliers)
    B, N = args.pairs, args.n
    Kb = jnp.tile(jnp.asarray(K, jnp.float32)[None], (B, 1, 1))
    x0 = jax.jit(ess.normalize_keypoints)(jnp.asarray(k0, jnp.float32), Kb)
    x1 = jax.jit(ess.normalize_keypoints)(jnp.asarray(k1, jnp.float32), Kb)
    mask = jnp.ones((B, N), bool)
    f = float(K[0, 0])
    thr = jnp.full((B,), 2.0 / f, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    n_iters, n5 = args.iters, args.n5
    thr_sq = thr**2

    # --- stage jits (all vmapped over pairs, matching estimate_essential) ---
    @jax.jit
    def stage_sample8(keys):
        return jax.vmap(lambda k, m: masked_sample_indices(k, m, n_iters, 8))(
            keys, mask)

    @jax.jit
    def stage_solve8(idx):
        def per_pair(x0p, x1p, mp, idxp):
            def one(si):
                return ess._eight_point(x0p[si], x1p[si],
                                        mp[si].astype(jnp.float32))
            return jax.vmap(one)(idxp)
        return jax.vmap(per_pair)(x0, x1, mask, idx)

    @jax.jit
    def stage_sample5(keys):
        return jax.vmap(lambda k, m: masked_sample_indices(k, m, n5, 5))(
            keys, mask)

    @jax.jit
    def stage_solve5(idx5):
        def per_pair(x0p, x1p, idxp):
            def one(si):
                return ess._five_point_candidates(x0p[si], x1p[si])
            if n5 > 256 and n5 % 256 == 0:
                Es, ok = jax.lax.map(jax.vmap(one),
                                     idxp.reshape(n5 // 256, 256, 5))
            else:
                Es, ok = jax.vmap(one)(idxp)
            return Es.reshape(-1, 3, 3), ok.reshape(-1)
        return jax.vmap(per_pair)(x0, x1, idx5)

    @jax.jit
    def stage_score(Es, ok):
        def per_pair(Es_p, ok_p, x0p, x1p, mp, ts):
            return ess.score_hypotheses(Es_p, ok_p, x0p, x1p, mp, ts)
        return jax.vmap(per_pair)(Es, ok, x0, x1, mask, thr_sq)

    @jax.jit
    def stage_full(keys):
        def per_pair(k, x0p, x1p, mp, t):
            return ess.estimate_essential(k, x0p, x1p, mp, t,
                                          n_iters=n_iters, n5=n5)
        return jax.vmap(per_pair)(keys, x0, x1, mask, thr)

    @jax.jit
    def stage_homography(keys):
        def per_pair(k, x0p, x1p, mp, t):
            return ess.estimate_homography(k, x0p, x1p, mp, t,
                                           n_iters=max(n_iters // 2, 64))
        return jax.vmap(per_pair)(keys, x0, x1, mask, thr)

    rows = []
    t, idx8 = timed(stage_sample8, keys)
    rows.append(("sample8", t))
    t, Es8 = timed(stage_solve8, idx8)
    rows.append((f"solve8 x{n_iters}", t))
    t, idx5 = timed(stage_sample5, keys)
    rows.append(("sample5", t))
    t, (Es5, ok5) = timed(stage_solve5, idx5)
    rows.append((f"solve5 x{n5} (x10 cands)", t))
    Es = jnp.concatenate([Es8, Es5], axis=1)
    ok = jnp.concatenate([jnp.ones(Es8.shape[:2], bool), ok5], axis=1)
    t, scores = timed(stage_score, Es, ok)
    rows.append((f"score M={Es.shape[1]}", t))
    t, _ = timed(stage_homography, keys)
    rows.append((f"homography x{max(n_iters // 2, 64)}", t))
    t_full, _ = timed(stage_full, keys)

    print(f"B={B} N={N} n_iters={n_iters} n5={n5} "
          f"outliers={args.outliers:.0%}")
    accounted = 0.0
    for name, t in rows:
        print(f"  {name:<28} {t*1e3:8.1f} ms  {B/t:8.1f} pairs/s")
        accounted += t
    print(f"  {'estimate_essential (full)':<28} {t_full*1e3:8.1f} ms  "
          f"{B/t_full:8.1f} pairs/s")
    print(f"  (stages above sum to {accounted*1e3:.1f} ms; full adds "
          f"LO/EM/cheirality + fusion effects)")


if __name__ == "__main__":
    main()
