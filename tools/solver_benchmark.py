"""Essential-matrix solver: batched TPU pipeline vs OpenCV (reference path).

The reference estimates relative pose per pair with
cv.findEssentialMat(USAC_MAGSAC) + cv.recoverPose inside a Python loop
(reference lib/models/matching/pose_solver.py:46-61). This framework runs a
batched fixed-iteration RANSAC (5-point Nistér + 8-point hypotheses,
MAGSAC-style scoring, LO + GN polish) as ONE device dispatch per batch
(ops/essential.py essential_pose).

This tool measures both on identical synthetic data — accuracy (median /
p90 rotation and translation-direction error) and throughput (pairs/s) —
and writes the table to docs/SOLVER_THROUGHPUT.md.

Usage: python tools/solver_benchmark.py [--pairs 64] [--n 512]
       [--outliers 0.3 0.5] [--noise 0.5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_pairs(rng, n_pairs, n_pts, noise_px, outlier_ratio, f=500.0,
               w=540, h=360):
    """Synthetic two-view geometry: random R (<=40 deg), random t, points in
    a 6m-deep frustum; pixel noise + uniform outliers."""
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    kpts0 = np.zeros((n_pairs, n_pts, 2))
    kpts1 = np.zeros((n_pairs, n_pts, 2))
    R_gt = np.zeros((n_pairs, 3, 3))
    t_gt = np.zeros((n_pairs, 3))
    for b in range(n_pairs):
        # rotation: random axis, angle up to 40 deg
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.05, 0.7)
        Kx = np.array([[0, -axis[2], axis[1]],
                       [axis[2], 0, -axis[0]],
                       [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        t *= rng.uniform(0.3, 1.5)

        # 3D points visible in view 0
        z = rng.uniform(2.0, 8.0, size=n_pts)
        x = (rng.uniform(0, w, size=n_pts) - K[0, 2]) / f * z
        y = (rng.uniform(0, h, size=n_pts) - K[1, 2]) / f * z
        P0 = np.stack([x, y, z], axis=-1)
        P1 = P0 @ R.T + t

        uv0 = (P0 / P0[:, 2:])[:, :2] * f + [K[0, 2], K[1, 2]]
        uv1 = (P1 / P1[:, 2:])[:, :2] * f + [K[0, 2], K[1, 2]]
        uv0 += rng.normal(scale=noise_px, size=uv0.shape)
        uv1 += rng.normal(scale=noise_px, size=uv1.shape)

        n_out = int(outlier_ratio * n_pts)
        idx = rng.choice(n_pts, n_out, replace=False)
        uv1[idx] = rng.uniform([0, 0], [w, h], size=(n_out, 2))

        kpts0[b], kpts1[b] = uv0, uv1
        R_gt[b], t_gt[b] = R, t
    return kpts0, kpts1, R_gt, t_gt, K


def rot_err_deg(R_est, R_gt):
    tr = np.clip((np.trace(R_est.transpose(0, 2, 1) @ R_gt, axis1=1, axis2=2)
                  - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr))


def tdir_err_deg(t_est, t_gt):
    a = t_est / np.linalg.norm(t_est, axis=-1, keepdims=True)
    b = t_gt / np.linalg.norm(t_gt, axis=-1, keepdims=True)
    return np.degrees(np.arccos(np.clip(np.sum(a * b, -1), -1, 1)))


def run_tpu(kpts0, kpts1, K, pix_thr, iters=3):
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.ops.essential import essential_pose

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, N, _ = kpts0.shape
    Kb = jnp.tile(jnp.asarray(K, jnp.float32)[None], (B, 1, 1))
    k0 = jnp.asarray(kpts0, jnp.float32)
    k1 = jnp.asarray(kpts1, jnp.float32)
    mask = jnp.ones((B, N), bool)

    @jax.jit
    def solve(key, k0, k1):
        out = essential_pose(key, k0, k1, mask, Kb, Kb, pix_thr)
        return out["R"], out["t"], out["inliers"]

    key = jax.random.PRNGKey(0)
    R, t, _ = jax.tree_util.tree_map(
        lambda x: x.block_until_ready(), solve(key, k0, k1))

    # timing: scan-slope (K solves inside one dispatch, slope between two K)
    # — the tunnel's per-dispatch latency varies 5 ms..4 s and a per-dispatch
    # loop measures the tunnel, not the solver (docs/NOTES.md gotchas)
    def make(n_reps):
        @jax.jit
        def run(c, k0, k1):
            def body(c, _):
                key = jax.random.fold_in(
                    jax.random.PRNGKey(0), (c * 1e6).astype(jnp.int32))
                out = essential_pose(
                    key, k0 + c * 1e-6, k1, mask, Kb, Kb, pix_thr)
                return c + jnp.sum(out["R"]) + jnp.sum(out["inliers"]), None
            out, _ = jax.lax.scan(body, c, None, length=n_reps)
            return out
        return run

    run1, run2 = make(1), make(3)
    float(run1(jnp.float32(0.0), k0, k1))
    float(run2(jnp.float32(0.0), k0, k1))

    def med(run):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.0), k0, k1))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    per_batch = (med(run2) - med(run1)) / 2
    return np.asarray(R), np.asarray(t), B / per_batch


def run_tpu_adaptive(kpts0, kpts1, K, pix_thr, n_iters=512, reps=5):
    """Two-tier adaptive budget (ops/essential.py essential_pose_adaptive).

    Timed as an honest host loop (perturbed inputs each rep, full D2H fetch):
    the adaptive path has a host decision between tiers, so scan-slope does
    not apply — the measured number INCLUDES the tunnel dispatch cost, like
    OpenCV's number includes its Python loop.
    """
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.ops.essential import essential_pose_adaptive

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, N, _ = kpts0.shape
    Kb = jnp.tile(jnp.asarray(K, jnp.float32)[None], (B, 1, 1))
    k0 = jnp.asarray(kpts0, jnp.float32)
    k1 = jnp.asarray(kpts1, jnp.float32)
    mask = jnp.ones((B, N), bool)

    def solve(seed, eps):
        out = essential_pose_adaptive(
            jax.random.PRNGKey(seed), k0 + eps, k1, mask, Kb, Kb, pix_thr,
            n_iters=n_iters)
        # the adaptive driver's tier decision already fetched the packed
        # [R|t|inliers|adapt] result — pose extraction costs no second D2H
        # (exactly what the production sweep does, models/matching.py)
        p = out["_host_packed"]
        return (p[:, :9].reshape(-1, 3, 3), p[:, 9:12],
                p[:, 12])

    R, t, _ = solve(0, 0.0)  # warm/compile tier 1 (+ tier 2 if triggered)
    solve(1, 1e-6)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        solve(2 + r, (r + 1) * 1e-6)
        ts.append(time.perf_counter() - t0)
    return R, t, B / float(np.median(ts))


def run_opencv(kpts0, kpts1, K, pix_thr):
    import cv2

    B = kpts0.shape[0]
    R_est = np.full((B, 3, 3), np.nan)
    t_est = np.full((B, 3), np.nan)
    t0 = time.perf_counter()
    for b in range(B):
        E, mask = cv2.findEssentialMat(
            kpts0[b], kpts1[b], K, method=cv2.USAC_MAGSAC,
            prob=0.9999, threshold=pix_thr)
        if E is None:
            continue
        if E.shape[0] > 3:  # multiple candidates stacked
            E = E[:3]
        _, R, t, _ = cv2.recoverPose(E, kpts0[b], kpts1[b], K, mask=mask)
        R_est[b] = R
        t_est[b] = t.reshape(-1)
    elapsed = time.perf_counter() - t0
    return R_est, t_est, B / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument(
        "--rows", type=str, default="0.3:0.5,0.5:0.5,0.7:2.0,0.85:2.0:128",
        help="comma-separated outlier_ratio:noise_px[:n_corr] conditions "
             "(defaults include the 70%%-outlier/2px MAGSAC stress regime "
             "and the 85%%/128-correspondence extreme tier bench.py scores)")
    ap.add_argument("--thr", type=float, default=2.0)
    ap.add_argument("--skip-adaptive", action="store_true")
    ap.add_argument("--write-doc", action="store_true")
    args = ap.parse_args()

    conds = []
    for r in args.rows.split(","):
        parts = r.split(":")
        conds.append((float(parts[0]), float(parts[1]),
                      int(parts[2]) if len(parts) > 2 else args.n))
    rng = np.random.default_rng(7)
    rows = []
    for rho, noise, n_corr in conds:
        kpts0, kpts1, R_gt, t_gt, K = make_pairs(
            rng, args.pairs, n_corr, noise, rho)

        R_cv, t_cv, pps_cv = run_opencv(kpts0, kpts1, K, args.thr)
        R_tpu, t_tpu, pps_tpu = run_tpu(kpts0, kpts1, K, args.thr)
        if args.skip_adaptive:
            R_ad = t_ad = None
            pps_ad = float("nan")
        else:
            R_ad, t_ad, pps_ad = run_tpu_adaptive(kpts0, kpts1, K, args.thr)

        def stats(R, t):
            re = rot_err_deg(R, R_gt)
            te = tdir_err_deg(t, t_gt)
            ok = ~np.isnan(re)
            return (np.median(re[ok]), np.percentile(re[ok], 90),
                    np.median(te[ok]), np.percentile(te[ok], 90))

        s_cv, s_tpu = stats(R_cv, t_cv), stats(R_tpu, t_tpu)
        s_ad = stats(R_ad, t_ad) if R_ad is not None else None
        rows.append((rho, noise, n_corr, s_cv, pps_cv, s_tpu, pps_tpu,
                     s_ad, pps_ad))
        print(f"outliers {rho:.0%}, noise {noise} px, {n_corr} corr:")
        print(f"  OpenCV MAGSAC : rot med/p90 {s_cv[0]:6.2f}/{s_cv[1]:6.2f} deg"
              f"  tdir {s_cv[2]:6.2f}/{s_cv[3]:6.2f} deg  {pps_cv:8.1f} pairs/s")
        print(f"  TPU fixed     : rot med/p90 {s_tpu[0]:6.2f}/{s_tpu[1]:6.2f} deg"
              f"  tdir {s_tpu[2]:6.2f}/{s_tpu[3]:6.2f} deg  {pps_tpu:8.1f} pairs/s")
        if s_ad is not None:
            print(f"  TPU adaptive  : rot med/p90 {s_ad[0]:6.2f}/{s_ad[1]:6.2f} deg"
                  f"  tdir {s_ad[2]:6.2f}/{s_ad[3]:6.2f} deg  {pps_ad:8.1f} pairs/s")

    if args.write_doc:
        doc = Path(__file__).resolve().parent.parent / "docs" / "SOLVER_THROUGHPUT.md"
        begin, end = "<!-- BEGIN GENERATED TABLE -->", "<!-- END GENERATED TABLE -->"
        lines = [
            begin,
            f"Synthetic two-view pairs ({args.pairs} pairs, correspondence",
            f"count per row, threshold {args.thr} px). OpenCV = the",
            "reference's exact path:",
            "`cv.findEssentialMat(USAC_MAGSAC)` + `cv.recoverPose` per pair",
            "(reference pose_solver.py:46-61), single CPU core (this host has one).",
            "TPU fixed = `ops/essential.py essential_pose` (one jitted dispatch per",
            "batch, scan-slope timing, dispatch cost excluded); TPU adaptive =",
            "`essential_pose_adaptive` two-tier budget ladder with a 5-point-heavy",
            "escalation tier (host-loop timing, dispatch cost INCLUDED — the honest",
            "like-for-like vs OpenCV's loop).",
            "Table generated by `python tools/solver_benchmark.py --write-doc`",
            "(regeneration replaces only this marked block; the analysis below",
            "it is hand-written).",
            "",
            "| outliers | noise px | corr | solver | rot med (deg) | rot p90 | t-dir med | t-dir p90 | pairs/s |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for rho, noise, n_corr, s_cv, pps_cv, s_tpu, pps_tpu, s_ad, pps_ad in rows:
            lines.append(
                f"| {rho:.0%} | {noise} | {n_corr} | OpenCV MAGSAC (1 CPU core) | {s_cv[0]:.2f} "
                f"| {s_cv[1]:.2f} | {s_cv[2]:.2f} | {s_cv[3]:.2f} | {pps_cv:.1f} |")
            lines.append(
                f"| {rho:.0%} | {noise} | {n_corr} | TPU fixed (1 chip) | {s_tpu[0]:.2f} "
                f"| {s_tpu[1]:.2f} | {s_tpu[2]:.2f} | {s_tpu[3]:.2f} | {pps_tpu:.1f} |")
            if s_ad is not None:
                lines.append(
                    f"| {rho:.0%} | {noise} | {n_corr} | TPU adaptive (1 chip) | {s_ad[0]:.2f} "
                    f"| {s_ad[1]:.2f} | {s_ad[2]:.2f} | {s_ad[3]:.2f} | {pps_ad:.1f} |")
        lines.append(end)
        block = "\n".join(lines)
        if doc.exists() and begin in doc.read_text():
            old = doc.read_text()
            pre = old[: old.index(begin)]
            post = old[old.index(end) + len(end):]
            doc.write_text(pre + block + post)
        else:
            doc.write_text(
                "# Essential-matrix solver: TPU batched pipeline vs OpenCV\n\n"
                + block + "\n")
        print(f"wrote {doc}")


if __name__ == "__main__":
    main()
