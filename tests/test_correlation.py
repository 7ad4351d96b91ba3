"""Fused correlation-warp Pallas kernel: numerics vs the XLA reference path
(interpreter mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from mapfree_tpu.models.aggregators import _uv_grid
from mapfree_tpu.ops.correlation import fused_correlation_warp


def reference_math(q, k, v, grid):
    corr = jnp.einsum("bic,bjc->bij", q, k)
    p = jax.nn.softmax(corr, axis=2)
    warped = jnp.einsum("bij,bjc->bic", p, v)
    pos = jnp.einsum("bij,jk->bik", p, grid)
    max_score = jnp.max(p, axis=2, keepdims=True)
    return warped, pos, max_score


class TestFusedCorrelation:
    def _data(self, B=2, H=10, W=13, C=32, seed=0):
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
        HW = H * W
        q = jax.random.normal(k0, (B, HW, C))
        k = jax.random.normal(k1, (B, HW, C))
        v = jax.random.normal(k2, (B, HW, C))
        grid = _uv_grid(H, W, jnp.float32)
        return q, k, v, grid

    def test_matches_xla_path(self):
        q, k, v, grid = self._data()
        warped, pos, ms = fused_correlation_warp(q, k, v, grid, interpret=True)
        warped_r, pos_r, ms_r = reference_math(q, k, v, grid)
        assert np.allclose(np.asarray(warped), np.asarray(warped_r), atol=1e-5)
        assert np.allclose(np.asarray(pos), np.asarray(pos_r), atol=1e-5)
        assert np.allclose(np.asarray(ms), np.asarray(ms_r), atol=1e-5)

    def test_non_multiple_of_block(self):
        """HW=130 is not a multiple of the 256 row block: padding must not
        leak into the outputs."""
        q, k, v, grid = self._data(H=10, W=13)
        warped, pos, ms = fused_correlation_warp(q, k, v, grid, interpret=True)
        assert warped.shape == q.shape
        # softmax rows sum to 1, so max score in (0, 1]
        assert float(jnp.min(ms)) > 0.0
        assert float(jnp.max(ms)) <= 1.0 + 1e-6

    def test_asymmetric_qk_channels(self):
        """Half-channel correlation: q/k use fewer channels than v."""
        q, k, v, grid = self._data()
        qh, kh = q[..., :16], k[..., :16]
        warped, pos, ms = fused_correlation_warp(qh, kh, v, grid, interpret=True)
        warped_r, pos_r, ms_r = reference_math(qh, kh, v, grid)
        assert np.allclose(np.asarray(warped), np.asarray(warped_r), atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        """The backward Pallas kernel must reproduce XLA autodiff gradients,
        including the max-score output's argmax-routed gradient."""
        q, k, v, grid = self._data(H=6, W=8, C=16)

        def loss_fused(q, k, v):
            w, p, m = fused_correlation_warp(q, k, v, grid, True, 256)
            return jnp.sum(w**2) + jnp.sum(p * 0.3) + jnp.sum(m**2)

        def loss_ref(q, k, v):
            w, p, m = reference_math(q, k, v, grid)
            return jnp.sum(w**2) + jnp.sum(p * 0.3) + jnp.sum(m**2)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_custom_vjp_mid_window_hw(self):
        """HW=576 (24x24) sits in (512, 960]: the backward column/row tiles
        must still tile the padded problem exactly (a min()-capped cN=512
        once left dk/dv rows 512.. unwritten here)."""
        q, k, v, grid = self._data(B=1, H=24, W=24, C=8)

        def loss_fused(q, k, v):
            w, p, m = fused_correlation_warp(q, k, v, grid, True)
            return jnp.sum(w**2) + jnp.sum(p * 0.3) + jnp.sum(m**2)

        def loss_ref(q, k, v):
            w, p, m = reference_math(q, k, v, grid)
            return jnp.sum(w**2) + jnp.sum(p * 0.3) + jnp.sum(m**2)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            arr = np.asarray(a)
            assert np.all(np.isfinite(arr))
            assert np.allclose(arr, np.asarray(b), atol=1e-3)

    def test_bf16_inputs(self):
        q, k, v, grid = self._data()
        warped, pos, ms = fused_correlation_warp(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), grid, interpret=True,
        )
        # the kernel accumulates in f32; compare against an f32 reference of
        # the bf16-rounded inputs (scores differ by bf16 matmul precision)
        warped_r, _, _ = reference_math(
            q.astype(jnp.bfloat16).astype(jnp.float32),
            k.astype(jnp.bfloat16).astype(jnp.float32),
            v.astype(jnp.bfloat16).astype(jnp.float32), grid,
        )
        assert warped.dtype == jnp.float32
        assert np.allclose(np.asarray(warped), np.asarray(warped_r, np.float32),
                           atol=0.05)
