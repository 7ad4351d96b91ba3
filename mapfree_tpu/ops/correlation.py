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

# Backward tile sizes (row-pass block, col-pass column block, col-pass row
# chunk). Row-pass VMEM: ~6 [rM, HWp] f32 temporaries, so rM is capped by
# HWp (rM=64 fits HW≈6k in 16 MB); col-pass HBM traffic scales with HWp/cN
# re-reads of each row chunk, so cN/r_chunk as large as VMEM allows. Swept
# on a v5-lite at HW=6120/B=16 (scan-slope): (64,512,1024) = 11.0 ms vs
# 16.3 ms for (64,128,512); (64,1024,1024) is marginally faster standalone
# but overflows scoped VMEM by 288 kB inside the full training graph.
BWD_TILES = (64, 512, 1024)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# When True, the fused path is reported available off-TPU and the kernels run
# under the Pallas interpreter. This exists so the PRODUCTION graph shape
# (aggregator -> fused kernel) can be exercised on the CPU mesh — sharded
# tests and the driver's multi-chip dryrun — not just the XLA fallback the
# aggregators would otherwise select off-TPU.
INTERPRET_FALLBACK = False


def _use_interpret(interpret: bool) -> bool:
    return interpret or (INTERPRET_FALLBACK and jax.default_backend() != "tpu")


def _kernel(q_ref, k_ref, v_ref, out_ref, m_s, d_s, acc_s, *, hw: int,
            col_chunk: int, n_chunks: int):
    """One (batch, row-block, key-chunk) program — flash-attention layout.

    q_ref: [1, rM, Cq] query rows (resident across the key-chunk axis);
    k_ref/v_ref: [1, cK, C] this key chunk; out_ref: [1, rM, Cv + 1]
    (written on the final chunk). Running softmax state (max, denom,
    accumulator) lives in VMEM scratch, which persists across the
    sequentially-iterated chunk axis. Every block is small, so the kernel
    fits the 16 MB scoped-VMEM limit at ANY image resolution and batch size
    (Mosaic stack-allocates all temporaries and multi-buffers whole-HW
    operand blocks — the single-program-per-row variant OOMed at 540x720).
    """
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        d_s[...] = jnp.zeros_like(d_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rM, cK]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c * col_chunk
    s = jnp.where(col < hw, s, _NEG_INF)

    m_prev = m_s[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    m_s[...] = m_new
    d_s[...] = d_s[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == n_chunks - 1)
    def _():
        inv_d = 1.0 / d_s[...]
        out_ref[0, :, :-1] = acc_s[...] * inv_d
        # peak softmax probability: exp(s_max - m_final) / d == 1 / d
        out_ref[0, :, -1:] = inv_d


def _bwd_rows_kernel(q_ref, k_ref, v_ref, dmain_ref, ds_ref,
                     dq_ref, stats_ref, *, hw: int):
    """Backward row pass for one (batch, row-block) program: recompute the
    softmax block, apply the softmax VJP (the max-score output's cotangent
    enters as a one-hot at the argmax column), emit dq for this row block and
    the per-row statistics (max m, denom d, vjp constant c, argmax index) the
    column pass needs."""
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
    p = e / d  # [rM, HWp]

    dmain = dmain_ref[0].astype(jnp.float32)  # [rM, Cv] cotangent of P @ V
    ds_out = ds_ref[0].astype(jnp.float32)    # [rM, 1] cotangent of max-score

    dP = jax.lax.dot_general(
        dmain, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [rM, HWp]
    amax = jnp.argmax(s, axis=1, keepdims=True)
    dP = dP + jnp.where(col == amax, ds_out, 0.0)
    c = jnp.sum(dP * p, axis=1, keepdims=True)
    dS = p * (dP - c)
    dS = jnp.where(col < hw, dS, 0.0)

    dq_ref[0] = jax.lax.dot_general(
        dS, k.astype(jnp.float32), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    stats_ref[0] = jnp.concatenate(
        [m, d, c, amax.astype(jnp.float32)], axis=-1)  # [rM, 4]


def _bwd_cols_kernel(q_ref, k_ref, v_ref, dmain_ref, ds_ref, stats_ref,
                     dk_ref, dv_ref, *, hw: int, r_chunk: int):
    """Backward column pass for one (batch, col-block, row-chunk) program:
    rebuild the transposed softmax tile [cN, rChunk] from the row statistics,
    form dS for the tile, and accumulate this row chunk's contribution to the
    column block's dk/dv (the TPU grid iterates the row-chunk axis
    sequentially, so revisiting the dk/dv block is a safe read-modify-write).
    All tiles are [cN, rChunk] — VMEM stays small regardless of HW."""
    r = pl.program_id(2)

    q = q_ref[0]                       # [rChunk, Cq] this row chunk
    k = k_ref[0]                       # [cN, Cq]     this column block
    v = v_ref[0].astype(jnp.float32)   # [cN, Cv]
    dmain = dmain_ref[0].astype(jnp.float32)  # [rChunk, Cv]
    ds_out = ds_ref[0].astype(jnp.float32)    # [rChunk, 1]
    stats = stats_ref[0]               # [rChunk, 4] -> m, d, c, amax
    m = stats[:, 0][None, :]           # [1, rChunk]
    d = stats[:, 1][None, :]
    c = stats[:, 2][None, :]
    amax = stats[:, 3][None, :].astype(jnp.int32)
    ds_row = ds_out[:, 0][None, :]     # [1, rChunk]

    s_t = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [cN, rChunk]: s_t[j, i]
    j0 = pl.program_id(1) * s_t.shape[0]
    i0 = r * r_chunk
    jidx = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, dimension=0) + j0
    iidx = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, dimension=1) + i0
    valid = (jidx < hw) & (iidx < hw)
    p_t = jnp.where(valid, jnp.exp(s_t - m) / d, 0.0)

    dP_t = jax.lax.dot_general(
        v, dmain, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [cN, rChunk]
    dP_t = dP_t + jnp.where(jidx == amax, ds_row, 0.0)
    dS_t = jnp.where(valid, p_t * (dP_t - c), 0.0)

    dk_update = jax.lax.dot_general(
        dS_t, q.astype(jnp.float32), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [cN, Cq]
    dv_update = jax.lax.dot_general(
        p_t, dmain, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [cN, Cv]

    @pl.when(r == 0)
    def _():
        dk_ref[0] = dk_update
        dv_ref[0] = dv_update

    @pl.when(r > 0)
    def _():
        dk_ref[0] += dk_update
        dv_ref[0] += dv_update


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_correlation_warp(q, k, v, grid, interpret: bool = False,
                           row_block: int = 256, key_chunk: int = 6144):
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
    interpret = _use_interpret(interpret)
    B, HW, Cq = q.shape
    Cv = v.shape[-1]
    rM = row_block
    # The chunk-count maths below assumes key_chunk is rM-aligned; a
    # non-aligned cap could push col_chunk up to rM-1 columns over budget.
    key_chunk = max(rM, (key_chunk // rM) * rM)
    # Chunking: fewer, larger key chunks are faster (less running-softmax
    # rescale traffic; measured 4.6 vs 5.4 ms at HW=6120/B=32 for one 6144
    # chunk vs three 2048 chunks), but the key axis must stay under the VMEM
    # budget, so cap the chunk at `key_chunk` and pick the chunk count that
    # minimises padding (HWp is a multiple of both rM and col_chunk).
    HWp0 = _round_up(HW, rM)
    if HWp0 <= key_chunk:
        HWp = HWp0
        col_chunk, n_chunks = HWp, 1
    else:
        n_chunks = -(-HWp0 // key_chunk)
        col_chunk = _round_up(-(-HWp0 // n_chunks), rM)
        HWp = col_chunk * n_chunks

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
        partial(_kernel, hw=HW, col_chunk=col_chunk, n_chunks=n_chunks),
        grid=(B, HWp // rM, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rM, Cq), lambda b, i, c: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, col_chunk, Cq), lambda b, i, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, col_chunk, Cv + 2), lambda b, i, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rM, Cv + 3), lambda b, i, c: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HWp, Cv + 3), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rM, 1), jnp.float32),       # running max
            pltpu.VMEM((rM, 1), jnp.float32),       # running denom
            pltpu.VMEM((rM, Cv + 2), jnp.float32),  # running accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :HW]
    warped = out[..., :Cv]
    pos = out[..., Cv: Cv + 2]
    max_score = out[..., Cv + 2: Cv + 3]
    return warped, pos, max_score


def _fcw_fwd(q, k, v, grid, interpret, row_block, key_chunk):
    out = fused_correlation_warp(q, k, v, grid, interpret, row_block, key_chunk)
    return out, (q, k, v, grid)


def _fcw_bwd(interpret, row_block, key_chunk, residuals, cotangents):
    interpret = _use_interpret(interpret)
    q, k, v, grid = residuals
    d_warped, d_pos, d_ms = cotangents

    B, HW, Cq = q.shape
    Cv = v.shape[-1]
    # Mosaic stack-allocates every temporary, so tile sizes are set by the
    # VMEM budget (16 MB), not MXU preference; cap blocks at the padded
    # problem size so small inputs don't tile up to the sweep optimum.
    # Caps halve (tiles are powers of two ≥ rM), so rM | cN | r_chunk in the
    # divisibility sense and every tile divides HWp = round_up(HW, max tile)
    # — min()-capping instead broke the grid for HW in (512, 960] (cN=512
    # did not divide HWp, and dk/dv rows past the first column block were
    # never written).
    rM, cN, r_chunk = BWD_TILES
    hw_cap = _round_up(HW, rM)
    while cN > max(hw_cap, rM):
        cN //= 2
    while r_chunk > max(hw_cap, rM):
        r_chunk //= 2
    HWp = _round_up(HW, max(rM, cN, r_chunk))
    pad = HWp - HW

    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    gridp = jnp.broadcast_to(
        jnp.pad(grid, ((0, pad), (0, 0))).astype(v.dtype)[None], (B, HWp, 2))
    vp = jnp.concatenate([jnp.pad(v, ((0, 0), (0, pad), (0, 0))), gridp], axis=-1)
    dmain = jnp.pad(
        jnp.concatenate([d_warped, d_pos], axis=-1), ((0, 0), (0, pad), (0, 0)))
    ds = jnp.pad(d_ms, ((0, 0), (0, pad), (0, 0)))

    # pass 1 (rows): dq + per-row softmax statistics
    dq, stats = pl.pallas_call(
        partial(_bwd_rows_kernel, hw=HW),
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
            pl.BlockSpec((1, rM, 4), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, HWp, Cq), jnp.float32),
            jax.ShapeDtypeStruct((B, HWp, 4), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp, dmain, ds)

    # pass 2 (columns x row-chunks): dk/dv per column block, accumulated over
    # the sequential row-chunk grid axis
    dk, dv = pl.pallas_call(
        partial(_bwd_cols_kernel, hw=HW, r_chunk=r_chunk),
        grid=(B, HWp // cN, HWp // r_chunk),
        in_specs=[
            pl.BlockSpec((1, r_chunk, Cq), lambda b, j, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cN, Cq), lambda b, j, r: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cN, Cv + 2), lambda b, j, r: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_chunk, Cv + 2), lambda b, j, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_chunk, 1), lambda b, j, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_chunk, 4), lambda b, j, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cN, Cq), lambda b, j, r: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cN, Cv + 2), lambda b, j, r: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, HWp, Cq), jnp.float32),
            jax.ShapeDtypeStruct((B, HWp, Cv + 2), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp, dmain, ds, stats)

    dq = dq[:, :HW].astype(q.dtype)
    dk = dk[:, :HW].astype(k.dtype)
    dv = dv[:, :HW, :Cv].astype(v.dtype)  # grid columns are constants
    return dq, dk, dv, jnp.zeros_like(grid)


fused_correlation_warp.defvjp(_fcw_fwd, _fcw_bwd)


def fused_path_available() -> bool:
    """The compiled kernel needs a real TPU; off-TPU the fused path is only
    taken when INTERPRET_FALLBACK routes it through the interpreter."""
    return jax.default_backend() == "tpu" or INTERPRET_FALLBACK
