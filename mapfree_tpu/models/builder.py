"""Model builder: uniform batched-inference interface over both families.

Equivalent of reference lib/models/builder.py:8-26. Every built model exposes
``predict_batch(batch) -> (R [B,3,3], t [B,1,3], inliers [B])`` numpy, where
``batch`` is a collated loader batch. Regression models jit-compile one fixed
batch shape and pad smaller (final) batches up to it.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from mapfree_tpu.models.matching import FeatureMatchingModel
from mapfree_tpu.models.regression import build_regression_net


class RegressionPredictor:
    """Jitted batched inference; with more than one device the batch is
    sharded over the data mesh (one SPMD dispatch per batch)."""

    def __init__(self, cfg, checkpoint: str = ""):
        from mapfree_tpu.parallel.mesh import DATA_AXIS, make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.cfg = cfg
        self.net = build_regression_net(cfg)
        H, W = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH

        n_dev = len(jax.devices())
        self.mesh = make_mesh(cfg) if n_dev > 1 else None
        batch = int(cfg.TPU.INFER_BATCH)
        if self.mesh is not None:
            n = self.mesh.devices.size
            batch = ((batch + n - 1) // n) * n
        self.batch_size = batch

        F = int(cfg.DATASET.QUERY_FRAME_COUNT)
        if cfg.MODEL in ("RegressionMultiFrame", "RegressionMultiFrameFusion"):
            img1_shape = (self.batch_size, F, H, W, 3)
        else:
            img1_shape = (self.batch_size, H, W, 3)
        img0 = jnp.zeros((self.batch_size, H, W, 3), jnp.float32)
        img1 = jnp.zeros(img1_shape, jnp.float32)

        self.needs_device_poses = getattr(self.net, "needs_device_poses", False)
        init_kwargs = {}
        if self.needs_device_poses:
            q0 = jnp.zeros((self.batch_size, F, 4), jnp.float32).at[..., 0].set(1.0)
            init_kwargs = {
                "q_device": q0,
                "t_device": jnp.zeros((self.batch_size, F, 3), jnp.float32),
            }

        if checkpoint:
            import orbax.checkpoint as ocp

            abstract = jax.eval_shape(
                lambda: self.net.init(jax.random.PRNGKey(0), img0, img1,
                                      train=False, **init_kwargs)
            )
            self.variables = ocp.StandardCheckpointer().restore(checkpoint, abstract)
        else:
            self.variables = jax.jit(
                partial(self.net.init, train=False, **init_kwargs)
            )(jax.random.PRNGKey(0), img0, img1)

        def _pack(R, t):
            # one [B, 4, 3] output: a single D2H fetch per batch (each fetch
            # pays a full round trip on remote-TPU links)
            return jnp.concatenate([R, t.reshape(-1, 1, 3)], axis=1)

        if self.needs_device_poses:
            def _forward(image0, image1, q_device, t_device):
                R, t, _ = self.net.apply(
                    self.variables, image0, image1, train=False,
                    q_device=q_device, t_device=t_device)
                return _pack(R, t)
            n_in = 4
        else:
            def _forward(image0, image1):
                R, t, _ = self.net.apply(self.variables, image0, image1,
                                         train=False)
                return _pack(R, t)
            n_in = 2

        if self.mesh is None:
            self._predict = jax.jit(_forward)
        else:
            sharded = NamedSharding(self.mesh, P(DATA_AXIS))
            self._predict = jax.jit(
                _forward,
                in_shardings=(sharded,) * n_in,
                out_shardings=sharded,
            )

        # deduped-reference path: encode U unique refs + B queries instead of
        # 2B images, gathering ref features by index after the encoder (an
        # eval batch shares 1-2 refs across its pairs; see RegressionNet)
        self.u_max = (
            min(self.batch_size, int(cfg.TPU.UNIQUE_REFS))
            if cfg.MODEL == "Regression" else 0
        )
        self._dev_refs: dict = {}   # ref name -> device-resident frame
        self._dev_zero: dict = {}   # (shape, dtype) -> device zeros pad row
        if self.u_max:
            def _forward_unique(image0u, ref_idx, image1):
                R, t, _ = self.net.apply(self.variables, image0u, image1,
                                         train=False, ref_idx=ref_idx)
                return _pack(R, t)

            if self.mesh is None:
                self._predict_unique = jax.jit(_forward_unique)
            else:
                repl = NamedSharding(self.mesh, P())
                self._predict_unique = jax.jit(
                    _forward_unique,
                    in_shardings=(repl, sharded, sharded),
                    out_shardings=sharded,
                )

    def _ship_refs(self, u, names):
        """Assemble the [u_max, ...] unique-ref device stack, shipping only
        rows the device does not already hold. Each scene's reference frame
        crosses the tunnel ONCE per sweep (names key it), and the pad rows
        up to u_max are materialised on device instead of shipped as zeros —
        on a bandwidth-bound link both savings are direct throughput."""
        shape, dtype = u.shape[1:], u.dtype
        if names is None or len(names) != u.shape[0]:
            if u.shape[0] < self.u_max:
                u = np.concatenate([
                    u, np.zeros((self.u_max - u.shape[0],) + shape, dtype)])
            return jnp.asarray(u)
        rows = []
        for j, nm in enumerate(names):
            a = self._dev_refs.get(nm)
            if a is None:
                a = jnp.asarray(u[j])
                self._dev_refs[nm] = a
                while len(self._dev_refs) > 16:
                    self._dev_refs.pop(next(iter(self._dev_refs)))
            rows.append(a)
        zkey = (shape, str(dtype))
        zero = self._dev_zero.get(zkey)
        if zero is None and len(rows) < self.u_max:
            zero = self._dev_zero[zkey] = jnp.zeros(shape, dtype)
        rows += [zero] * (self.u_max - len(rows))
        return jnp.stack(rows)  # device-side concat, no host bytes

    def transfer_batch(self, batch, times=None):
        """Host->device stage: pad the final partial batch and ship the
        arrays. Returns (device_args, B). Runs safely on a worker thread, so
        the sweep can overlap batch i+1's H2D (the dominant cost on a
        remote-tunnel link) with batch i's compute dispatch."""
        from mapfree_tpu.utils.timing import NULL_TIMES

        times = times or NULL_TIMES
        if "image0_unique" in batch:
            u = np.asarray(batch["image0_unique"])
            ridx = np.asarray(batch["ref_idx"], np.int32)
            if self.u_max and u.shape[0] <= self.u_max:
                image1 = np.asarray(batch["image1"])
                B = image1.shape[0]
                if B < self.batch_size:
                    pad = self.batch_size - B
                    image1 = np.concatenate([
                        image1,
                        np.zeros((pad,) + image1.shape[1:], image1.dtype)])
                    ridx = np.concatenate([ridx, np.zeros(pad, np.int32)])
                with times.stage("h2d"):
                    dev_u = self._ship_refs(u, batch.get("ref_names"))
                    dev = [dev_u, jnp.asarray(ridx), jnp.asarray(image1)]
                    for a in dev:
                        a.block_until_ready()
                return ("unique", dev, B)
            # too many unique refs for the compiled shape: materialise the
            # per-pair ref stack and use the standard path
            batch = dict(batch)
            batch["image0"] = u[ridx]
        image0 = np.asarray(batch["image0"])
        image1 = np.asarray(batch["image1"])
        if image0.dtype != np.uint8:  # uint8 ships as-is (4x fewer bytes)
            image0 = image0.astype(np.float32, copy=False)
            image1 = image1.astype(np.float32, copy=False)
        args = [image0, image1]
        if self.needs_device_poses:
            q = np.asarray(batch["abs_q_1_w2c_device"], np.float32)
            t = np.asarray(batch["abs_c_1_c2w_device"], np.float32)
            args += [q, t]
        B = image0.shape[0]
        if B < self.batch_size:  # pad the final partial batch
            pad = self.batch_size - B
            for i, a in enumerate(args):
                filler = np.zeros((pad,) + a.shape[1:], a.dtype)
                if i == 2:  # device quaternions must stay unit-norm
                    filler[..., 0] = 1.0
                args[i] = np.concatenate([a, filler])
        with times.stage("h2d"):
            dev = [jnp.asarray(a) for a in args]
            for a in dev:
                a.block_until_ready()
        return ("std", dev, B)

    def dispatch_device(self, transferred, times=None):
        """Compute stage: jitted forward on device-resident args; returns
        finalize() -> (R, t, inliers) numpy (the only D2H fetch)."""
        from mapfree_tpu.utils.timing import NULL_TIMES

        times = times or NULL_TIMES
        kind, dev, B = transferred
        fn = self._predict_unique if kind == "unique" else self._predict
        with times.stage("dispatch"):
            out = fn(*dev)

        def finalize():
            with times.stage("d2h_wait"):
                host = np.asarray(out)[:B]
            R = host[:, :3]
            t = host[:, 3:].reshape(B, 1, 3)
            return R, t, np.zeros((B,), np.float32)

        return finalize

    def predict_batch_async(self, batch, times=None):
        """Dispatch one batch; returns finalize() -> (R, t, inliers) numpy.

        The device work (H2D, forward) proceeds in the background, so a
        caller holding a small queue of finalizers overlaps transfer/compute
        of batch i+1 with host processing of batch i."""
        return self.dispatch_device(self.transfer_batch(batch, times), times)

    def predict_batch(self, batch):
        return self.predict_batch_async(batch)()


class MatchingPredictor:
    """Exposes the same transfer/dispatch split as RegressionPredictor, so
    the submission sweep pipelines correspondence fetch + H2D of batch i+1
    under the solver dispatch of batch i."""

    def __init__(self, cfg):
        self.model = FeatureMatchingModel(cfg)

    def transfer_batch(self, batch, times=None):
        return self.model.transfer_batch(batch, times)

    def dispatch_device(self, transferred, times=None):
        return self.model.dispatch_device(transferred, times)

    def predict_batch(self, batch):
        return self.model(batch)


def build_model(cfg, checkpoint: str = ""):
    if cfg.MODEL == "FeatureMatching":
        return MatchingPredictor(cfg)
    if cfg.MODEL in ("Regression", "RegressionMultiFrame",
                     "RegressionMultiFrameFusion"):
        return RegressionPredictor(cfg, checkpoint)
    raise NotImplementedError(f"Invalid model {cfg.MODEL}")
