import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
from mapfree_tpu.data import DataLoader, MapFreeDataset
from mapfree_tpu.models.builder import build_model

bench._ensure_native()
bench._make_bench_scenes()
cfg = bench._flagship_cfg()
cfg.DATASET.DATA_ROOT = str(bench.SCENES_DIR)
cfg.DATASET.SCENES = None
cfg.TPU.INFER_BATCH = 32
ds = MapFreeDataset(cfg, "val")
rng = np.random.default_rng(0)


def raw(tag):
    ts = []
    for _ in range(4):
        arr = rng.integers(0, 255, size=21 * (1 << 20), dtype=np.uint8)
        t0 = time.perf_counter()
        jnp.asarray(arr).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(tag, "raw 21MB asarray:", [round(t * 1e3, 1) for t in ts],
          flush=True)


raw("before model build:")
model = build_model(cfg)
raw("after model build:")
loader = DataLoader(ds, batch_size=32, num_workers=2, prefetch=4,
                    unique_refs=True)
batches = list(loader)
t0 = time.perf_counter()
tr = [model.transfer_batch(b) for b in batches]
t1 = time.perf_counter()
print("8x transfer_batch (no model run yet):", round((t1 - t0) * 1e3, 1),
      "ms", flush=True)
t0 = time.perf_counter()
fins = [model.dispatch_device(t) for t in tr]
[f() for f in fins]
print("first dispatch+drain (exec load/compile):",
      round(time.perf_counter() - t0, 1), "s", flush=True)
raw("after model run:")
for rep in range(3):
    for b in batches:
        b["image1"][0, 0, 0] ^= 1
    t0 = time.perf_counter()
    tr = [model.transfer_batch(b) for b in batches]
    t1 = time.perf_counter()
    fins = [model.dispatch_device(t) for t in tr]
    [f() for f in fins]
    t2 = time.perf_counter()
    print(f"rep{rep}: 8x transfer {1e3*(t1-t0):.0f} ms, "
          f"dispatch+drain {1e3*(t2-t1):.0f} ms -> "
          f"{256/(t2-t0):.1f} pairs/s", flush=True)
raw("after reps:")
