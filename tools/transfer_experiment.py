"""Measure the tunnel's per-transfer cost structure for the e2e sweep.

The round-4 sweep moved ~45 MB/s effective against a probed 1,343 MB/s —
VERDICT r4 localises the fault to per-array round trips in transfer_batch.
This experiment times each candidate transfer strategy for a realistic
batch (B=32 YUV420 queries at 720x540 + u_max refs + ridx):

  a) current: per-ref asarray + device stack + ridx + image1, block each
  b) three asarrays (refs pre-stacked on host), block each
  c) ONE packed contiguous uint8 buffer, one asarray, one block
  d) same as (c) but no block (async)
plus a transfer-size sweep to expose the fixed per-transfer cost.

Run ON the real TPU: python tools/transfer_experiment.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 720, 540
HY = H * 3 // 2
B = 32
U = 4

rng = np.random.default_rng(0)


def timed(fn, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), [round(t * 1e3, 1) for t in ts]


def main():
    print("devices:", jax.devices())
    # warm the path
    jnp.asarray(rng.integers(0, 255, size=1 << 20, dtype=np.uint8)).block_until_ready()

    img1 = rng.integers(0, 255, size=(B, HY, W), dtype=np.uint8)
    refs = rng.integers(0, 255, size=(U, HY, W), dtype=np.uint8)
    ridx = rng.integers(0, U, size=B).astype(np.int32)
    mb = (img1.nbytes + refs.nbytes + ridx.nbytes) / (1 << 20)
    print(f"batch bytes: {mb:.1f} MB")

    def fresh():
        # fresh data each rep: the tunnel memoizes identical transfers
        img1[0, 0, 0] = rng.integers(0, 255)
        refs[0, 0, 0] = rng.integers(0, 255)

    def a_current():
        fresh()
        rows = [jnp.asarray(refs[j]) for j in range(U)]
        dev_u = jnp.stack(rows)
        dev = [dev_u, jnp.asarray(ridx), jnp.asarray(img1)]
        for a in dev:
            a.block_until_ready()

    def b_three():
        fresh()
        dev = [jnp.asarray(refs), jnp.asarray(ridx), jnp.asarray(img1)]
        for a in dev:
            a.block_until_ready()

    packed = np.empty(ridx.nbytes + refs.nbytes + img1.nbytes, np.uint8)

    def pack():
        fresh()
        off = 0
        for arr in (ridx.view(np.uint8), refs, img1):
            flat = arr.reshape(-1).view(np.uint8)
            packed[off: off + flat.nbytes] = flat
            off += flat.nbytes

    def c_packed():
        pack()
        jnp.asarray(packed).block_until_ready()

    def d_packed_noblock():
        pack()
        jnp.asarray(packed)

    t_pack, _ = timed(lambda: pack())
    print(f"host pack cost: {t_pack*1e3:.1f} ms")

    for name, fn in [("a_current", a_current), ("b_three", b_three),
                     ("c_packed", c_packed), ("d_packed_noblock", d_packed_noblock)]:
        med, ts = timed(fn)
        print(f"{name:18s} {med*1e3:7.1f} ms  ({mb/med:7.1f} MB/s)  reps={ts}")

    # fixed-cost sweep: per-transfer overhead vs payload size
    print("\nsize sweep (single asarray+block):")
    for size_mb in (0.125, 0.5, 2, 8, 18, 32):
        n = int(size_mb * (1 << 20))
        arr = rng.integers(0, 255, size=n, dtype=np.uint8)

        def ship():
            arr[0] = rng.integers(0, 255)
            jnp.asarray(arr).block_until_ready()

        med, ts = timed(ship)
        print(f"  {size_mb:6.3f} MB: {med*1e3:7.1f} ms ({size_mb/med:7.1f} MB/s) {ts}")

    # concurrent transfers from 2 and 3 threads (the sweep's worker config)
    import concurrent.futures
    print("\nconcurrency sweep (18 MB each):")
    n = 18 * (1 << 20)
    for workers in (1, 2, 3):
        arrs = [rng.integers(0, 255, size=n, dtype=np.uint8) for _ in range(workers)]

        def ship(a):
            a[0] = rng.integers(0, 255)
            jnp.asarray(a).block_until_ready()

        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            def run():
                list(ex.map(ship, arrs))
            med, ts = timed(run, reps=4)
        print(f"  {workers} threads: {med*1e3:7.1f} ms aggregate "
              f"({workers*18/med:7.1f} MB/s) {ts}")

    # dispatch-cost probe: tiny jitted op, distinct scalars (no memoization)
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    f(jnp.float32(0.0)).block_until_ready()
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        float(f(jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    print(f"\nper-dispatch (tiny jit, incl. scalar fetch): "
          f"median {np.median(ts)*1e3:.1f} ms {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
