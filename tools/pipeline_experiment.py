"""Isolate the device-side pipeline: pre-packed buffers -> transfer ->
forward dispatch -> depth-k deferred fetch, no loader/decode in the loop.

Measures the tunnel's achievable pairs/s for the packed e2e sweep and how
it scales with pipeline depth and batch size.
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench
from mapfree_tpu.models.builder import build_model
from mapfree_tpu.data import MapFreeDataset, DataLoader


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bench._ensure_native()
    bench._make_bench_scenes()
    cfg = bench._flagship_cfg()
    cfg.DATASET.DATA_ROOT = str(bench.SCENES_DIR)
    cfg.DATASET.SCENES = None

    for batch in (32, 64):
        cfg.TPU.INFER_BATCH = batch
        dataset = MapFreeDataset(cfg, "val")
        model = build_model(cfg)
        loader = DataLoader(dataset, batch_size=batch, num_workers=2,
                            prefetch=4, unique_refs=True)
        batches = list(loader)
        n_pairs = sum(b["image1"].shape[0] for b in batches)

        # pre-transfer everything once to warm compiles
        tr = [model.transfer_batch(b) for b in batches]
        for t in tr:
            model.dispatch_device(t)()

        for depth in (2, 4, 8):
            # fresh data each run (tunnel memoizes identical work)
            for b in batches:
                b["image1"][0, 0, 0] ^= 1
            t0 = time.perf_counter()
            transferred = [model.transfer_batch(b) for b in batches]
            t1 = time.perf_counter()
            pend = []
            for t in transferred:
                pend.append(model.dispatch_device(t))
                while len(pend) > depth:
                    pend.pop(0)()
            t2 = time.perf_counter()
            for f in pend:
                f()
            t3 = time.perf_counter()
            total = t3 - t0
            print(f"B={batch} depth={depth}: {n_pairs/total:7.1f} pairs/s "
                  f"(transfer {t1-t0:.3f}s, dispatch+interleaved-fetch "
                  f"{t2-t1:.3f}s, drain {t3-t2:.3f}s)")

        # fully serial reference: transfer+dispatch+fetch per batch
        for b in batches:
            b["image1"][0, 0, 0] ^= 1
        t0 = time.perf_counter()
        for b in batches:
            model.dispatch_device(model.transfer_batch(b))()
        total = time.perf_counter() - t0
        print(f"B={batch} serial : {n_pairs/total:7.1f} pairs/s")


if __name__ == "__main__":
    main()
