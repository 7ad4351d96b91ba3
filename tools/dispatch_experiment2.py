"""Per-call overhead of the WARM packed forward with pre-transferred inputs.

pipeline_experiment.py showed ~300 ms/batch on the device side even with
all dispatches issued up front — 7x the scan-slope compute time. This
isolates: (a) per-call cost with inputs already device-resident,
(b) a K-aggregated dispatch (K packed buffers -> one jit that scans over
them), which divides any per-call overhead by K.
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench
from mapfree_tpu.data import DataLoader, MapFreeDataset
from mapfree_tpu.models.builder import build_model


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bench._ensure_native()
    bench._make_bench_scenes()
    cfg = bench._flagship_cfg()
    cfg.DATASET.DATA_ROOT = str(bench.SCENES_DIR)
    cfg.DATASET.SCENES = None
    B = 32
    cfg.TPU.INFER_BATCH = B

    dataset = MapFreeDataset(cfg, "val")
    model = build_model(cfg)
    loader = DataLoader(dataset, batch_size=B, num_workers=2,
                        prefetch=4, unique_refs=True)
    batches = list(loader)[:6]

    # pre-transfer (and warm the packed fn)
    tr = [model.transfer_batch(b) for b in batches]
    spec = tr[0][3]
    fn = model._packed_fn(spec)
    for t in tr:
        np.asarray(fn(t[1]))

    # (a) per-call with device-resident inputs, fresh bytes each round
    for round_ in range(2):
        tr = [model.transfer_batch(_fresh(b)) for b in batches]
        for t in tr:
            t[1].block_until_ready()
        t0 = time.perf_counter()
        outs = [fn(t[1]) for t in tr]
        t1 = time.perf_counter()
        res = [np.asarray(o) for o in outs]
        t2 = time.perf_counter()
        n = len(batches) * B
        print(f"warm per-call: dispatch-all {1e3*(t1-t0):.1f} ms, "
              f"drain {1e3*(t2-t1):.1f} ms, per-batch {1e3*(t2-t0)/6:.1f} ms"
              f" -> {n/(t2-t0):.1f} pairs/s")

    # (b) K-aggregated: one jit consumes K stacked buffers via lax.scan
    K = 6
    stacked_spec = spec

    def agg(bufs):  # bufs: [K, nbytes] uint8
        def body(c, buf):
            out = fn.__wrapped__(buf)  # the traced forward
            return c, out
        _, outs = jax.lax.scan(body, 0, bufs)
        return outs

    agg_jit = jax.jit(agg)

    from mapfree_tpu.utils.packing import pack_arrays

    def host_buf(model, b):
        u = np.asarray(b["image0_unique"])
        ridx = np.asarray(b["ref_idx"], np.int32)
        img1 = np.asarray(b["image1"])
        if u.shape[0] < model.u_max:
            u = np.concatenate([
                u, np.zeros((model.u_max - u.shape[0],) + u.shape[1:],
                            u.dtype)])
        return pack_arrays([ridx, u, img1])

    bufs_np = np.stack([host_buf(model, _fresh(b)) for b in batches])
    t0 = time.perf_counter()
    out = np.asarray(agg_jit(jnp.asarray(bufs_np)))
    t1 = time.perf_counter()
    print(f"aggregated K={K} first call (compile?): {1e3*(t1-t0):.1f} ms")
    for round_ in range(2):
        bufs_np = np.stack([host_buf(model, _fresh(b)) for b in batches])
        t0 = time.perf_counter()
        dev = jnp.asarray(bufs_np)
        out = np.asarray(agg_jit(dev))
        t1 = time.perf_counter()
        n = len(batches) * B
        print(f"aggregated K={K}: {1e3*(t1-t0):.1f} ms total "
              f"({1e3*(t1-t0)/K:.1f} ms/batch) -> {n/(t1-t0):.1f} pairs/s")


def _fresh(b):
    b["image1"][0, 0, 0] ^= 1
    return b


if __name__ == "__main__":
    main()
