"""Single-buffer host->device transfer packing.

On this environment's remote-TPU link every `jnp.asarray` pays a full
round trip (measured ~5-30 ms regardless of payload, docs/NOTES.md
gotchas), so a batch shipped as six small arrays costs 6x the latency of
the same bytes in one buffer. The round-4 sweep moved ~45 MB/s effective
against a probed 1,343 MB/s for exactly this reason (VERDICT r4 #1).

Protocol: the host packs every per-batch array into ONE contiguous uint8
buffer (`pack_arrays`); the jitted consumer slices it back with
`unpack` — static offsets, `lax.bitcast_convert_type` for non-byte
dtypes (endianness is little on both host and TPU; pinned by
tests/test_data.py::TestPacking). The reference has no analog: it ships
torch tensors over PCIe one `.cuda()` at a time (reference
lib/utils/data.py:4-17).
"""

from __future__ import annotations

import numpy as np


def pack_arrays(arrays) -> np.ndarray:
    """Concatenate arrays byte-wise into one contiguous uint8 buffer."""
    total = sum(int(a.nbytes) for a in arrays)
    buf = np.empty(total, np.uint8)
    off = 0
    for a in arrays:
        flat = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
        buf[off: off + flat.nbytes] = flat
        off += flat.nbytes
    return buf


def spec_of(named) -> tuple:
    """Hashable layout spec for a list of (name, array): the jit cache key."""
    return tuple((n, tuple(a.shape), str(np.asarray(a).dtype)) for n, a in named)


def unpack(buf, spec) -> dict:
    """Traced inverse of :func:`pack_arrays`: slice `buf` per `spec`.

    Returns {name: array} with the original shapes/dtypes. Must run under
    jit (one dispatch for the whole batch); calling it eagerly would pay
    one device round trip per slice.
    """
    import jax.numpy as jnp
    from jax import lax

    out = {}
    off = 0
    for name, shape, dt in spec:
        dtype = jnp.dtype(dt)
        n = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize if shape \
            else dtype.itemsize
        seg = buf[off: off + n]
        if dtype.itemsize > 1:
            seg = lax.bitcast_convert_type(
                seg.reshape(-1, dtype.itemsize), dtype)
        elif dtype == jnp.bool_:
            seg = seg.astype(jnp.bool_)
        out[name] = seg.reshape(shape)
        off += n
    return out
