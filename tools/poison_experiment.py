"""Characterise the post-execution H2D slowdown.

bisect_transfer.py showed: raw 21 MB H2D ~5-15 ms before the big forward
executable runs, ~600-1300 ms persistently after. Questions:
  1. Does a TINY executable also poison transfers, or only the big one?
  2. Latency or bandwidth? (sweep 0.5/4/21/64 MB in poisoned state)
  3. Does it decay with idle time?
  4. Does deleting device buffers / gc restore it?
"""

import gc
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)


def raw(tag, mb=21, reps=3):
    ts = []
    for _ in range(reps):
        arr = rng.integers(0, 255, size=int(mb * (1 << 20)), dtype=np.uint8)
        t0 = time.perf_counter()
        jnp.asarray(arr).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{tag} raw {mb}MB:", [round(t * 1e3, 1) for t in ts], flush=True)
    return ts


raw("fresh:")

# tiny executable
f = jax.jit(lambda x: x * 2.0 + 1.0)
for i in range(3):
    float(f(jnp.float32(i)))
raw("after tiny exec:")

# medium executable: a conv-ish matmul chain
g = jax.jit(lambda x: ((x @ x) @ x).sum())
x = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32))
for i in range(2):
    float(g(x + i))
raw("after 2k matmul chain:")

# the big forward
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
model = build_model(cfg)
loader = DataLoader(ds, batch_size=32, num_workers=2, prefetch=4,
                    unique_refs=True)
batches = list(loader)[:2]
t0 = time.perf_counter()
tr = [model.transfer_batch(b) for b in batches]
fins = [model.dispatch_device(t) for t in tr]
[fin() for fin in fins]
print(f"big exec warm (load+run): {time.perf_counter()-t0:.1f} s", flush=True)

raw("after big exec:")
for mb in (0.5, 4, 64):
    raw("  poisoned size sweep:", mb=mb, reps=2)

del tr, fins
gc.collect()
raw("after del buffers:")

time.sleep(20)
raw("after 20s idle:")

# does running the tiny exec again reset anything?
for i in range(3):
    float(f(jnp.float32(100 + i)))
raw("after tiny exec again:")
