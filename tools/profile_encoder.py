"""Stage-level timing bisection of the ResUNet encoder on the real TPU.

Times truncated encoder prefixes (stem, +encoder1..3, +decoder stages) with
the chained-carry methodology so the per-stage cost is the difference between
consecutive prefixes. Identifies which stage eats the cycles relative to its
FLOPs (the decoder convs at H/4 carry most of the arithmetic; if a
small-spatial stage shows up disproportionately it is layout-bound, not
FLOP-bound).

Usage: python tools/profile_encoder.py [--batch 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, iters=8):
    ts = []
    for _ in range(iters):
        start = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - start)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mapfree_tpu.config import cfg as default_cfg
    from mapfree_tpu.models.blocks import ConvBnElu, UpConv
    from mapfree_tpu.models.encoders import (
        BLOCK_TYPES,
        _skip_concat,
        _Stage,
        parse_num_blocks,
    )

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = default_cfg.clone()
    cfg.merge_from_file("configs/mapfree.yaml")
    cfg.merge_from_file("configs/regression/mapfree/3d3d.yaml")
    h, w = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    B = args.batch
    dtype = jnp.bfloat16
    block = BLOCK_TYPES[cfg.ENCODER.BLOCK_TYPE]
    nb = parse_num_blocks(cfg.ENCODER.NUM_BLOCKS)

    class Prefix(nn.Module):
        """ResUNet truncated after `upto` stages (mirrors encoders.ResUNet)."""

        upto: int

        @nn.compact
        def __call__(self, x):
            train = False
            x1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                         dtype=dtype, name="firstconv")(x)
            x1 = nn.BatchNorm(use_running_average=True, momentum=0.9,
                              epsilon=1e-5, dtype=dtype, name="firstbn")(x1)
            x1 = nn.relu(x1)
            x1 = nn.max_pool(x1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            if self.upto == 0:
                return x1
            x2 = _Stage(block, 64, nb[0], 1, dtype, name="encoder1")(x1, train)
            if self.upto == 1:
                return x2
            x3 = _Stage(block, 128, nb[1], 2, dtype, name="encoder2")(x2, train)
            if self.upto == 2:
                return x3
            x4 = _Stage(block, 256, nb[2], 2, dtype, name="encoder3")(x3, train)
            if self.upto == 3:
                return x4
            y = UpConv(512, 3, 2, dtype=dtype, name="upconv4")(x4, train)
            y = _skip_concat(y, x3)
            y = ConvBnElu(512, 3, 1, dtype=dtype, name="iconv4")(y, train)
            if self.upto == 4:
                return y
            y = UpConv(256, 3, 2, dtype=dtype, name="upconv3")(y, train)
            y = _skip_concat(y, x2)
            y = ConvBnElu(256, 3, 1, dtype=dtype, name="iconv3")(y, train)
            if self.upto == 5:
                return y
            y = ConvBnElu(cfg.ENCODER.NUM_OUT_LAYERS, 1, 1, dtype=dtype,
                          name="outconv")(y, train)
            return y

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, w, 3)), dtype)
    names = ["stem", "encoder1", "encoder2", "encoder3",
             "upconv4+iconv4", "upconv3+iconv3", "outconv"]
    prev = 0.0
    print(f"batch {B} images at {h}x{w}, bf16")
    for upto in range(7):
        mod = Prefix(upto=upto)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def step(c, xx, mod=mod, v=v):
            out = mod.apply(v, xx + c.astype(dtype) * 1e-6)
            return c + jnp.sum(out.astype(jnp.float32))

        float(step(jnp.float32(0.0), x))  # compile
        t = _timeit(lambda: step(jnp.float32(0.0), x))
        print(f"prefix upto {names[upto]:16s} {t * 1e3:8.2f} ms "
              f"(stage delta {(t - prev) * 1e3:+8.2f} ms)")
        prev = t


if __name__ == "__main__":
    main()
