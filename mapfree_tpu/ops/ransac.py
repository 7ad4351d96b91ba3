"""Fixed-shape batched RANSAC building blocks.

The reference drives per-pair native RANSAC loops (OpenCV USAC/MAGSAC,
Open3D registration — reference lib/models/matching/pose_solver.py) from
Python, one pair at a time. The TPU design replaces adaptive iteration counts
and early exits with a *fixed* hypothesis budget evaluated as one batched
program: sample -> minimal-solve (vmap) -> score all correspondences ->
argmax. Padded correspondences carry a validity mask end-to-end so no dynamic
shapes reach XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_sample_indices(key, mask, n_iters: int, sample_size: int):
    """Draw RANSAC minimal-set indices restricted to valid correspondences.

    Args:
        key: PRNG key.
        mask: [N] boolean validity of each correspondence.
        n_iters: number of hypotheses.
        sample_size: points per minimal set.
    Returns:
        idx: [n_iters, sample_size] int32 indices into the N axis. When fewer
        than ``sample_size`` valid points exist the indices repeat (the caller
        must gate on its own minimum-count check, mirroring the reference's
        "fewer than 5 correspondences -> NaN" guards).
    """
    N = mask.shape[0]
    # top-k of iid uniform keys = a uniformly random distinct subset of the
    # valid points, with no sequential structure: one [n_iters, N] uniform
    # draw + one top_k, both fully vectorised. (The previous per-pick
    # shift-past-chosen scheme was also exact but its per-pick sort chain
    # cost ~29 ms per 512-draw call on TPU — it was the single hottest op
    # of the essential-solver pipeline after the minimal-solver rebuild.)
    chunk = 256

    def draw(k, rows):
        u = jax.random.uniform(k, (rows, N))
        u = jnp.where(mask[None, :], u, -1.0)
        _, idx = jax.lax.top_k(u, sample_size)  # [rows, sample_size]
        return idx

    if n_iters > chunk and n_iters % chunk == 0:
        # bound the [rows, N] uniform transient: at the 5-point-heavy
        # budgets (n_iters=2048, N=2048, vmapped over B=64 pairs) the flat
        # draw would materialise a ~1 GB tensor for 8 B of output per row
        idx = jax.lax.map(
            lambda k: draw(k, chunk),
            jax.random.split(key, n_iters // chunk)).reshape(n_iters, -1)
    else:
        idx = draw(key, n_iters)
    # fewer valid points than the minimal set: top_k falls through to
    # invalid (-1-keyed) slots; remap those picks to the first valid index.
    # Repeats are then unavoidable — the caller's min-count gate rejects the
    # hypothesis anyway, this only keeps the gather on real data.
    first_valid = jnp.argmax(mask).astype(idx.dtype)
    idx = jnp.where(mask[idx], idx, first_valid)
    return idx.astype(jnp.int32)


def msac_score(residual_sq, mask, thr_sq):
    """Truncated-quadratic (MSAC) hypothesis score — lower is better.

    Robust-scoring stand-in for MAGSAC's sigma marginalisation: each
    correspondence contributes min(r^2, thr^2); invalid entries contribute the
    truncation constant so they never discriminate hypotheses.
    """
    capped = jnp.minimum(residual_sq, thr_sq)
    capped = jnp.where(mask, capped, thr_sq)
    return jnp.sum(capped, axis=-1)


def magsac_score(residual_sq, mask, thr_sq, n_sigmas: int = 5):
    """Sigma-marginalised robust score (MAGSAC-style) — lower is better.

    OpenCV's USAC_MAGSAC scores hypotheses marginalised over the unknown
    inlier noise scale instead of committing to one threshold (reference
    pose_solver.py:46-48). This is the discrete form: the truncated-quadratic
    score is averaged over a geometric ladder of scales sigma_k = 2 thr /
    2^k, each normalised to [0, 1] per point, so a hypothesis is rewarded for
    fitting its inliers *tightly*, not merely for clearing one threshold —
    the property that separates competing epipolar basins under noise. The
    ladder extends one step ABOVE the nominal threshold (MAGSAC marginalises
    up to sigma_max > threshold): when the true noise exceeds the user
    threshold, the wide scale still sees the inlier structure that the
    truncated scales cut off.
    """
    total = 0.0
    for k in range(n_sigmas):
        s = 4.0 * thr_sq / (4.0**k)
        capped = jnp.where(mask, jnp.minimum(residual_sq, s), s)
        total = total + jnp.sum(capped, axis=-1) / s
    return total / n_sigmas


def inlier_mask(residual_sq, mask, thr_sq):
    return jnp.logical_and(mask, residual_sq < thr_sq)


def best_hypothesis(scores):
    """argmin over the hypothesis axis."""
    return jnp.argmin(scores, axis=-1)
