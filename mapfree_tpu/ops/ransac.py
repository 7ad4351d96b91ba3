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
    # stable partition: valid indices first
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    n_valid = jnp.sum(mask.astype(jnp.int32))
    u = jax.random.uniform(key, (n_iters, sample_size))
    j = jnp.floor(u * jnp.maximum(n_valid, 1).astype(u.dtype)).astype(jnp.int32)
    j = jnp.clip(j, 0, N - 1)
    return order[j]


def msac_score(residual_sq, mask, thr_sq):
    """Truncated-quadratic (MSAC) hypothesis score — lower is better.

    Robust-scoring stand-in for MAGSAC's sigma marginalisation: each
    correspondence contributes min(r^2, thr^2); invalid entries contribute the
    truncation constant so they never discriminate hypotheses.
    """
    capped = jnp.minimum(residual_sq, thr_sq)
    capped = jnp.where(mask, capped, thr_sq)
    return jnp.sum(capped, axis=-1)


def inlier_mask(residual_sq, mask, thr_sq):
    return jnp.logical_and(mask, residual_sq < thr_sq)


def best_hypothesis(scores):
    """argmin over the hypothesis axis."""
    return jnp.argmin(scores, axis=-1)
