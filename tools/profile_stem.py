"""Micro-benchmark of first-conv variants on the real TPU.

The stem (7x7 stride-2 conv on 3-channel input) measures ~45% of encoder
time at ~1% of its FLOPs. Candidates:

a) baseline: conv 7x7 s2 on [B, H, W, 3]
b) components: conv alone / maxpool alone
c) space-to-depth: pack 2x2 pixel blocks into channels ([B, H/2, W/2, 12]),
   run the EXACT-equivalent 4x4 stride-1 conv (weights rearranged; one
   kernel tap falls off the grid and is zero). Same math, MXU-friendlier
   K dim and 4x smaller spatial extent.

Usage: python tools/profile_stem.py [--batch 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, iters=10):
    ts = []
    for _ in range(iters):
        start = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - start)
    return float(np.median(ts))


def s2d_weights(w7):
    """Rearrange [7, 7, 3, 64] stride-2 weights into the equivalent
    [4, 4, 12, 64] stride-1 weights on 2x2 space-to-depth input.

    Output position i reads original rows 2i + (ky - 3), ky in 0..6.
    Block row b = i + oy (oy in -2..1) supplies rows 2i + 2*oy + dy,
    so ky = 3 + 2*oy + dy; ky = -1 (oy=-2, dy=0) has no source tap -> 0.
    Channel packing order: c_packed = (dy * 2 + dx) * C + c.
    """
    import numpy as np

    K, _, C, O = w7.shape
    assert K == 7 and C == 3
    w4 = np.zeros((4, 4, 4 * C, O), w7.dtype)
    for by in range(4):
        for dy in range(2):
            ky = 3 + 2 * (by - 2) + dy
            if not 0 <= ky < 7:
                continue
            for bx in range(4):
                for dx in range(2):
                    kx = 3 + 2 * (bx - 2) + dx
                    if not 0 <= kx < 7:
                        continue
                    w4[by, bx, (dy * 2 + dx) * C:(dy * 2 + dx) * C + C, :] = (
                        w7[ky, kx]
                    )
    return w4


def space_to_depth(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W = args.batch, 360, 270
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
    w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.05
    w7j = jnp.asarray(w7, jnp.bfloat16)
    w4j = jnp.asarray(s2d_weights(w7), jnp.bfloat16)

    def conv(x, w, stride, pad):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def stem_base(c, x):
        y = conv(x + c.astype(x.dtype) * 1e-6, w7j, 2, [(3, 3), (3, 3)])
        y = jax.nn.relu(y)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return c + jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def conv_only(c, x):
        y = conv(x + c.astype(x.dtype) * 1e-6, w7j, 2, [(3, 3), (3, 3)])
        return c + jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def stem_s2d(c, x):
        xs = space_to_depth(x + c.astype(x.dtype) * 1e-6)
        y = conv(xs, w4j, 1, [(2, 1), (2, 1)])
        y = jax.nn.relu(y)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return c + jnp.sum(y.astype(jnp.float32))

    # correctness: s2d conv == baseline conv
    y_base = conv(x.astype(jnp.float32), jnp.asarray(w7, jnp.float32), 2,
                  [(3, 3), (3, 3)])
    y_s2d = conv(space_to_depth(x.astype(jnp.float32)),
                 jnp.asarray(s2d_weights(w7), jnp.float32), 1, [(2, 1), (2, 1)])
    err = float(jnp.max(jnp.abs(y_base - y_s2d)))
    print(f"s2d equivalence max|diff| = {err:.2e} "
          f"(shapes {y_base.shape} vs {y_s2d.shape})")

    for name, fn in [("stem baseline (conv+relu+pool)", stem_base),
                     ("conv 7x7 only", conv_only),
                     ("stem s2d (pack+conv4x4+relu+pool)", stem_s2d)]:
        float(fn(jnp.float32(0.0), x))  # compile
        t = _timeit(lambda fn=fn: fn(jnp.float32(0.0), x))
        print(f"{name:36s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()


def extra(batch=64):
    """Decompose: packing transpose vs packed conv vs wider-channel convs."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    B, H, W = batch, 360, 270
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
    xp = jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 12)), jnp.bfloat16)
    w4 = jnp.asarray(rng.normal(size=(4, 4, 12, 64)), jnp.bfloat16) * 0.05
    w1 = jnp.asarray(rng.normal(size=(1, 1, 12, 64)), jnp.bfloat16) * 0.05
    w3_64 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)), jnp.bfloat16) * 0.05
    x64 = jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 64)), jnp.bfloat16)

    def conv(x, w, stride, pad):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = {
        "pack only (s2d transpose)": jax.jit(
            lambda c, x: c + jnp.sum(space_to_depth(x + c.astype(x.dtype) * 1e-6).astype(jnp.float32))),
        "conv4x4s1 12->64 (pre-packed)": jax.jit(
            lambda c, xp: c + jnp.sum(conv(xp + c.astype(xp.dtype) * 1e-6, w4, 1, [(2, 1), (2, 1)]).astype(jnp.float32))),
        "conv1x1 12->64 (pre-packed)": jax.jit(
            lambda c, xp: c + jnp.sum(conv(xp + c.astype(xp.dtype) * 1e-6, w1, 1, [(0, 0), (0, 0)]).astype(jnp.float32))),
        "conv3x3 64->64 @180x135 (ref)": jax.jit(
            lambda c, x64: c + jnp.sum(conv(x64 + c.astype(x64.dtype) * 1e-6, w3_64, 1, [(1, 1), (1, 1)]).astype(jnp.float32))),
    }
    args = {"pack only (s2d transpose)": x,
            "conv4x4s1 12->64 (pre-packed)": xp,
            "conv1x1 12->64 (pre-packed)": xp,
            "conv3x3 64->64 @180x135 (ref)": x64}
    for name, fn in cases.items():
        a = args[name]
        float(fn(jnp.float32(0.0), a))
        t = _timeit(lambda fn=fn, a=a: fn(jnp.float32(0.0), a))
        print(f"{name:36s} {t * 1e3:8.2f} ms")


