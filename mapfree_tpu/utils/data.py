"""Host batch -> device helpers (API parity with reference lib/utils/data.py:4-17,
which moves torch tensors to the model's device; here numeric leaves go to
the default JAX device or a sharded mesh placement)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_NUMERIC = (np.ndarray, np.generic, int, float)


def prefetch_to_device(batches, transfer, lookahead: int = 2,
                       pool_workers: int = 2):
    """Overlap host->device transfer of upcoming batches with the consumer's
    current step.

    ``transfer(batch)`` runs on a worker thread and must FENCE its device
    arrays before returning (dispatching against an in-flight transfer hits
    the tunnel's ~10x slower inline path — tools/dispatch_experiment2.py);
    with ``pool_workers`` > 1 the round-trip-bound post-materialisation H2D
    mode overlaps across batches. Yields transferred batches in order.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    q: deque = deque()
    it = iter(batches)
    exhausted = False
    with ThreadPoolExecutor(max_workers=pool_workers) as ex:
        while q or not exhausted:
            while not exhausted and len(q) <= lookahead:
                b = next(it, None)
                if b is None:
                    exhausted = True
                else:
                    q.append(ex.submit(transfer, b))
            if q:
                yield q.popleft().result()


def data_to_device(batch: dict, mesh=None) -> dict:
    """Move numeric batch entries to device (sharded over the mesh's data
    axis when a mesh is given); metadata (strings, lists of names) stays on
    host."""
    from mapfree_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None

    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.Array):
            out[k] = v if sharding is None else jax.device_put(v, sharding)
        elif isinstance(v, _NUMERIC):
            arr = jnp.asarray(v)
            out[k] = arr if sharding is None else jax.device_put(arr, sharding)
        else:
            out[k] = v
    return out
