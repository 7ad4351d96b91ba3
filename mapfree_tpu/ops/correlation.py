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


def _bwd_kernel(q_ref, k_ref, v_ref, dmain_ref, ds_ref, dq_ref, dk_ref, dv_ref,
                *, hw: int):
    """Backward for one (batch, row-block) program: recompute the softmax
    block, apply the softmax VJP (including the 1/denominator max-score
    output), emit dq for this row block and accumulate dk/dv across row
    blocks (the TPU grid iterates sequentially, so revisiting the same output
    block is a safe read-modify-write)."""
    i = pl.program_id(1)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < hw, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    d = jnp.sum(e, axis=1, keepdims=True)
    inv_d = 1.0 / d
    p = e * inv_d  # [rM, HWp]

    dmain = dmain_ref[0].astype(jnp.float32)  # [rM, Cv] cotangent of P @ V
    ds_out = ds_ref[0].astype(jnp.float32)    # [rM, 1] cotangent of 1/d

    dP = jax.lax.dot_general(
        dmain, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [rM, HWp]
    # the max-score output is the softmax value at the argmax column, so its
    # cotangent enters the softmax VJP as a one-hot row at the argmax
    amax = jnp.argmax(s, axis=1, keepdims=True)  # [rM, 1]
    dP = dP + jnp.where(col == amax, ds_out, 0.0)
    # softmax VJP: dS = P * (dP - sum(dP * P))
    c = jnp.sum(dP * p, axis=1, keepdims=True)
    dS = p * (dP - c)
    dS = jnp.where(col < hw, dS, 0.0)

    dq_ref[0] = jax.lax.dot_general(
        dS, k.astype(jnp.float32), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dk_update = jax.lax.dot_general(
        dS, q.astype(jnp.float32), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [HWp, Cq]
    dv_update = jax.lax.dot_general(
        p, dmain, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [HWp, Cv]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = dk_update
        dv_ref[0] = dv_update

    @pl.when(i > 0)
    def _():
        dk_ref[0] += dk_update
        dv_ref[0] += dv_update


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
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


def _fcw_fwd(q, k, v, grid, interpret, row_block):
    out = fused_correlation_warp(q, k, v, grid, interpret, row_block)
    return out, (q, k, v, grid)


def _fcw_bwd(interpret, row_block, residuals, cotangents):
    q, k, v, grid = residuals
    d_warped, d_pos, d_ms = cotangents

    B, HW, Cq = q.shape
    Cv = v.shape[-1]
    rM = 128  # smaller rows: the backward holds two [rM, HWp] f32 blocks
    HWp = _round_up(HW, rM)
    pad = HWp - HW

    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    gridp = jnp.broadcast_to(
        jnp.pad(grid, ((0, pad), (0, 0))).astype(v.dtype)[None], (B, HWp, 2))
    vp = jnp.concatenate([jnp.pad(v, ((0, 0), (0, pad), (0, 0))), gridp], axis=-1)
    dmain = jnp.pad(
        jnp.concatenate([d_warped, d_pos], axis=-1), ((0, 0), (0, pad), (0, 0)))
    ds = jnp.pad(d_ms, ((0, 0), (0, pad), (0, 0)))

    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, hw=HW),
        grid=(B, HWp // rM),
        in_specs=[
            pl.BlockSpec((1, rM, Cq), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HWp, Cq), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HWp, Cv + 2), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rM, Cv + 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rM, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rM, Cq), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HWp, Cq), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HWp, Cv + 2), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, HWp, Cq), jnp.float32),
            jax.ShapeDtypeStruct((B, HWp, Cq), jnp.float32),
            jax.ShapeDtypeStruct((B, HWp, Cv + 2), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp, dmain, ds)

    dq = dq[:, :HW].astype(q.dtype)
    dk = dk[:, :HW].astype(k.dtype)
    dv = dv[:, :HW, :Cv].astype(v.dtype)  # grid columns are constants
    return dq, dk, dv, jnp.zeros_like(grid)


fused_correlation_warp.defvjp(_fcw_fwd, _fcw_bwd)


def fused_path_available() -> bool:
    """The compiled kernel needs a real TPU; tests use interpret=True."""
    return jax.default_backend() == "tpu"
