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


def _pack_rt(R, t):
    # one [B, 4, 3] output: a single D2H fetch per batch (each fetch
    # pays a full round trip on remote-TPU links)
    return jnp.concatenate([R, t.reshape(-1, 1, 3)], axis=1)


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
        if self.mesh is not None and self.mesh.devices.size == 1:
            self.mesh = None  # a 1-device mesh shards nothing: packed path
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
            # the jitted forwards close over the params: committed device
            # arrays trace as runtime constants, but restored NUMPY arrays
            # would constant-fold the whole network at compile time
            # (minutes — docs/NOTES.md gotchas)
            self.variables = jax.device_put(self.variables)
        else:
            self.variables = jax.jit(
                partial(self.net.init, train=False, **init_kwargs)
            )(jax.random.PRNGKey(0), img0, img1)

        if self.needs_device_poses:
            def _forward(image0, image1, q_device, t_device):
                R, t, _ = self.net.apply(
                    self.variables, image0, image1, train=False,
                    q_device=q_device, t_device=t_device)
                return _pack_rt(R, t)
            n_in = 4
        else:
            def _forward(image0, image1):
                R, t, _ = self.net.apply(self.variables, image0, image1,
                                         train=False)
                return _pack_rt(R, t)
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
        if self.u_max and self.mesh is not None:
            repl = NamedSharding(self.mesh, P())

            def _forward_unique(image0u, ref_idx, image1):
                R, t, _ = self.net.apply(self.variables, image0u, image1,
                                         train=False, ref_idx=ref_idx)
                return _pack_rt(R, t)

            self._predict_unique = jax.jit(
                _forward_unique,
                in_shardings=(repl, sharded, sharded),
                out_shardings=sharded,
            )
        # single-device packed-buffer forwards, one jit per batch layout
        # (YUV420 vs RGB, unique vs std — at most a handful per sweep)
        self._packed_fns: dict = {}

    def _packed_fn(self, spec):
        """Jitted forward over ONE packed uint8 buffer (utils/packing.py):
        the whole batch crosses the tunnel as a single transfer and the
        unpack slices fuse into the forward — one transfer + one dispatch
        per batch instead of one round trip per array (VERDICT r4 #1: the
        per-array path measured ~45 MB/s effective against a 1,343 MB/s
        link because latency, not bytes, dominated)."""
        fn = self._packed_fns.get(spec)
        if fn is None:
            from mapfree_tpu.utils.packing import unpack

            def _forward_packed(buf):
                parts = unpack(buf, spec)
                kwargs = {}
                if "q_device" in parts:
                    kwargs = {"q_device": parts["q_device"],
                              "t_device": parts["t_device"]}
                if "ref_idx" in parts:
                    R, t, _ = self.net.apply(
                        self.variables, parts["image0u"], parts["image1"],
                        train=False, ref_idx=parts["ref_idx"])
                else:
                    R, t, _ = self.net.apply(
                        self.variables, parts["image0"], parts["image1"],
                        train=False, **kwargs)
                return _pack_rt(R, t)

            fn = self._packed_fns[spec] = jax.jit(_forward_packed)
        return fn

    def transfer_batch(self, batch, times=None):
        """Host->device stage: pad the final partial batch, pack every array
        into one contiguous uint8 buffer, and ship it with a single
        ``jnp.asarray`` (no per-array fences: the transfer is ordered before
        the forward that consumes it, and blocking here was measured to wait
        behind queued COMPUTE on the tunnel stream, serialising the
        pipeline). Returns the spec dispatch_device compiles against. Runs
        safely on a worker thread, so the sweep overlaps batch i+1's H2D
        with batch i's compute dispatch."""
        from mapfree_tpu.utils.packing import pack_arrays, spec_of
        from mapfree_tpu.utils.timing import NULL_TIMES

        times = times or NULL_TIMES
        named = None
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
                # bucket the ref rows to the next power of two instead of
                # always padding to u_max: a typical eval batch has ONE
                # unique ref, and on the wire-bound tunnel the zero pad rows
                # were ~9% of the sweep's bytes (one compiled variant per
                # bucket, 1/2/4/...; mesh path keeps the fixed u_max shape)
                if self.mesh is None:
                    bucket = 1 << max(0, (u.shape[0] - 1).bit_length())
                    bucket = min(bucket, self.u_max)
                else:
                    bucket = self.u_max
                if u.shape[0] < bucket:
                    u = np.concatenate([
                        u, np.zeros((bucket - u.shape[0],) + u.shape[1:],
                                    u.dtype)])
                named = [("ref_idx", ridx), ("image0u", u),
                         ("image1", image1)]
            else:
                # too many unique refs for the compiled shape: materialise
                # the per-pair ref stack and use the standard path
                batch = dict(batch)
                batch["image0"] = u[ridx]
        if named is None:
            image0 = np.asarray(batch["image0"])
            image1 = np.asarray(batch["image1"])
            if image0.dtype != np.uint8:  # uint8 ships as-is (4x fewer bytes)
                image0 = image0.astype(np.float32, copy=False)
                image1 = image1.astype(np.float32, copy=False)
            named = [("image0", image0), ("image1", image1)]
            if self.needs_device_poses:
                named += [
                    ("q_device",
                     np.asarray(batch["abs_q_1_w2c_device"], np.float32)),
                    ("t_device",
                     np.asarray(batch["abs_c_1_c2w_device"], np.float32)),
                ]
            B = image0.shape[0]
            if B < self.batch_size:  # pad the final partial batch
                pad = self.batch_size - B
                for i, (name, a) in enumerate(named):
                    filler = np.zeros((pad,) + a.shape[1:], a.dtype)
                    if name == "q_device":  # quaternions must stay unit-norm
                        filler[..., 0] = 1.0
                    named[i] = (name, np.concatenate([a, filler]))

        if self.mesh is not None:
            # SPMD path: per-array device_put so in_shardings apply
            arrs = dict(named)
            with times.stage("h2d"):
                if "ref_idx" in arrs:  # _forward_unique(image0u, ridx, img1)
                    dev = [jnp.asarray(arrs["image0u"]),
                           jnp.asarray(arrs["ref_idx"]),
                           jnp.asarray(arrs["image1"])]
                    return ("unique", dev, B, None)
                dev = [jnp.asarray(a) for _, a in named]
            return ("std", dev, B, None)
        spec = spec_of(named)
        with times.stage("h2d"):
            buf = pack_arrays([a for _, a in named])
            dev = jnp.asarray(buf)
            # fence the ONE buffer: dispatching against an in-flight
            # transfer drops this tunnel into a ~10x slower inline-copy
            # path (measured 300 ms/batch vs 32 ms with the input resident
            # — tools/dispatch_experiment2.py)
            dev.block_until_ready()
        return ("packed", dev, B, spec)

    def dispatch_device(self, transferred, times=None):
        """Compute stage: jitted forward on device-resident args; returns
        finalize() -> (R, t, inliers) numpy (the only D2H fetch)."""
        from mapfree_tpu.utils.timing import NULL_TIMES

        times = times or NULL_TIMES
        kind, dev, B, spec = transferred
        with times.stage("dispatch"):
            if kind == "packed":
                out = self._packed_fn(spec)(dev)
            elif kind == "unique":
                out = self._predict_unique(*dev)
            else:
                out = self._predict(*dev)

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
