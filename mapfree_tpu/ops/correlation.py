"""Fused correlation-volume softmax-warp Pallas kernel.

The paper's core op (reference lib/models/regression/aggregator.py:55-106)
materialises a [B, HW, HW] float32 correlation volume and reads it back for
softmax, warp, soft-argmax position and max-score — ~10 GB of HBM traffic per
batch-16 step at MapFree resolution. This kernel never materialises the
volume: each (batch, row-block) program computes its score block against the
full key set in VMEM (keys/values for HW≈6k, C≈32 are <1 MB), applies
softmax, and contracts with the concatenated [values | uv-grid] matrix on the
MXU, emitting

    warped [rM, Cv], soft-argmax position [rM, 2], max-score [rM, 1]

in one pass. max_j softmax_j == exp(s_max - m) / denom == 1 / denom, so the
max-score channel is free.

Used by both CorrelationVolumeWarping (q = k = features) and the QKV variant
(projected q/k/v). Falls back to interpreter mode off-TPU (tests); the
aggregators keep the plain-XLA path for variants the kernel doesn't cover
(dustbin rows/cols, compressed-CV output channels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, out_ref, *, hw: int):
    """One (batch, row-block) program.

    q_ref: [1, rM, Cq] query rows; k_ref: [1, HWp, Cq] all keys;
    v_ref: [1, HWp, Cv] values (features | uv grid);
    out_ref: [1, rM, Cv + 1] -> [warped+position | max-score].
    """
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rM, HWp]
    # mask padded columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < hw, s, _NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)

    contracted = jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rM, Cv]
    inv_d = 1.0 / denom
    out_ref[0, :, :-1] = contracted * inv_d
    out_ref[0, :, -1:] = inv_d  # peak softmax probability of each row


@partial(jax.jit, static_argnames=("interpret", "row_block"))
def fused_correlation_warp(q, k, v, grid, interpret: bool = False,
                           row_block: int = 256):
    """Softmax cross-view warp without materialising the correlation volume.

    Args:
        q: [B, HW, Cq] query features (view 0).
        k: [B, HW, Cq] key features (view 1).
        v: [B, HW, Cv] value features warped into view 0's frame.
        grid: [HW, 2] uv grid appended to the values (soft-argmax position).
        interpret: run the Pallas interpreter (CPU tests).
    Returns:
        warped [B, HW, Cv], pos [B, HW, 2], max_score [B, HW, 1], all float32.
    """
    B, HW, Cq = q.shape
    Cv = v.shape[-1]
    rM = row_block
    HWp = _round_up(HW, rM)

    pad_rows = HWp - HW
    qp = jnp.pad(q, ((0, 0), (0, pad_rows), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad_rows), (0, 0)))
    gridp = jnp.broadcast_to(
        jnp.pad(grid, ((0, pad_rows), (0, 0))).astype(v.dtype)[None],
        (B, HWp, 2),
    )
    vp = jnp.concatenate([jnp.pad(v, ((0, 0), (0, pad_rows), (0, 0))), gridp],
                         axis=-1)  # [B, HWp, Cv + 2]

    out = pl.pallas_call(
        partial(_kernel, hw=HW),
        grid=(B, HWp // rM),
        in_specs=[
            pl.BlockSpec((1, rM, Cq), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HWp, Cq), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HWp, Cv + 2), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rM, Cv + 3), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HWp, Cv + 3), jnp.float32),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :HW]
    warped = out[..., :Cv]
    pos = out[..., Cv: Cv + 2]
    max_score = out[..., Cv + 2: Cv + 3]
    return warped, pos, max_score


def fused_path_available() -> bool:
    """The compiled kernel needs a real TPU; tests use interpret=True."""
    return jax.default_backend() == "tpu"
