"""Feature-matching pose model: correspondences -> batched RANSAC solvers.

Behavioural equivalent of reference lib/models/matching/model.py:7-40 and
feature_matching.py:5-118, re-designed TPU-first: where the reference asserts
batch size 1 and loops Python-over-OpenCV per pair, this model consumes
*batches* of padded correspondences and dispatches ONE jitted program for the
whole batch (solve + score + refine for every pair simultaneously).

Correspondence sources:
- ``PrecomputedMatching``: NaN-padded npz produced offline (LoFTR/SuperGlue/
  SIFT), per-scene lazy reload via the ``{scene_root}`` path template;
- ``SIFTMatching``: host-side detector/descriptor (OpenCV, exactly what the
  reference drives) + TPU exact 2-NN ratio matching.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mapfree_tpu.ops.essential import (essential_pose,
                                       essential_pose_adaptive,
                                       essential_pose_adaptive_async,
                                       essential_pose_metric,
                                       metric_scale_from_depth)
from mapfree_tpu.ops.matching import mutual_2nn_ratio_match
from mapfree_tpu.ops.pnp import pnp_pose
from mapfree_tpu.ops.procrustes_ransac import dense_cloud_from_depth, procrustes_pose


@jax.jit
def _pack_pose(R, t, inl):
    """Pack (R [B,3,3], t [B,3], inliers [B]) into one [B, 13] f32 array so
    the sweep pays a SINGLE D2H round trip per batch (each separate fetch
    costs a full tunnel round trip — docs/NOTES.md gotchas)."""
    B = R.shape[0]
    return jnp.concatenate(
        [R.reshape(B, 9), t.reshape(B, 3),
         inl.reshape(B, 1).astype(jnp.float32)], axis=1)


def pad_correspondences(corr_list, max_n: int):
    """Stack variable-length [Ni, 4] correspondence arrays into fixed-shape
    (pts0 [B, max_n, 2], pts1 [B, max_n, 2], mask [B, max_n])."""
    B = len(corr_list)
    pts0 = np.zeros((B, max_n, 2), np.float32)
    pts1 = np.zeros((B, max_n, 2), np.float32)
    mask = np.zeros((B, max_n), bool)
    for i, corr in enumerate(corr_list):
        n = min(len(corr), max_n)
        if n > 0:
            pts0[i, :n] = corr[:n, :2]
            pts1[i, :n] = corr[:n, 2:]
            mask[i, :n] = True
    return pts0, pts1, mask


class PrecomputedMatching:
    """Correspondences from a precomputed npz (reference
    feature_matching.py:5-50)."""

    # a sweep visits scenes sequentially, but a batch may straddle a scene
    # boundary; a small LRU keeps both sides loaded (one npz load per scene
    # per sweep instead of one per boundary-crossing item)
    CACHE_SCENES = 4

    def __init__(self, cfg):
        self.max_n = int(cfg.TPU.MAX_CORRESPONDENCES)
        self._cache: dict = {}  # scene_id -> correspondences array
        if "{" in cfg.MATCHES_FILE_PATH:
            self.matches_file_path = cfg.MATCHES_FILE_PATH
            self.pairs_txt = cfg.DATASET.PAIRS_TXT.TEST
            self.fixed = None
        else:
            self.matches_file_path = None
            self.fixed = self._load(cfg.MATCHES_FILE_PATH)

    @staticmethod
    def _load(file_path):
        data = np.load(file_path, allow_pickle=True)
        return data["correspondences"].astype(np.float32)

    def _scene_correspondences(self, scene_id, scene_root):
        if self.fixed is not None:
            return self.fixed
        if scene_id not in self._cache:
            path = self.matches_file_path.format(
                scene_root=scene_root, pairs_txt=self.pairs_txt
            )
            self._cache[scene_id] = self._load(path)
            while len(self._cache) > self.CACHE_SCENES:
                self._cache.pop(next(iter(self._cache)))
        return self._cache[scene_id]

    def get_correspondences(self, batch):
        corr_list = []
        for i in range(len(batch["pair_id"])):
            table = self._scene_correspondences(
                batch["scene_id"][i], batch["scene_root"][i]
            )
            corr = table[int(batch["pair_id"][i])]
            corr = corr[~np.isnan(corr)].reshape(-1, 4)
            corr_list.append(corr)
        return pad_correspondences(corr_list, self.max_n)


class SIFTMatching:
    """SIFT keypoints/descriptors (host) + exact TPU 2-NN ratio matching
    (reference feature_matching.py:53-118; the reference's detector is the
    same OpenCV C++ kernel)."""

    def __init__(self, cfg):
        import threading

        import cv2

        self.ratio_threshold = float(cfg.SIFT.RATIO_THRESHOLD)
        self.num_features = int(cfg.SIFT.NUM_FEATURES)
        self.sift = cv2.SIFT_create(self.num_features)
        self.max_n = int(cfg.TPU.MAX_CORRESPONDENCES)
        self._cv2 = cv2
        # transfer_batch runs on the sweep's worker threads; one shared
        # cv2 detector is not documented thread-safe
        self._lock = threading.Lock()

    @staticmethod
    def _root_sift(descs):
        """Hellinger kernel: L1-normalise then sqrt."""
        descs = descs / (descs.sum(axis=1, keepdims=True) + 1e-7)
        return np.sqrt(descs)

    def _detect(self, image_nhwc):
        if image_nhwc.dtype == np.uint8:
            img = np.asarray(image_nhwc)
        else:
            img = (image_nhwc * 255).astype(np.uint8)
        gray = self._cv2.cvtColor(img, self._cv2.COLOR_RGB2GRAY)
        with self._lock:
            kp, des = self.sift.detectAndCompute(gray, None)
        if des is None or len(kp) == 0:
            return np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32)
        pts = np.array([k.pt for k in kp], np.float32)
        return pts, self._root_sift(des.astype(np.float32))

    def get_correspondences(self, batch):
        B = batch["image0"].shape[0]
        N = self.num_features
        kp0 = np.zeros((B, N, 2), np.float32)
        kp1 = np.zeros((B, N, 2), np.float32)
        d0 = np.zeros((B, N, 128), np.float32)
        d1 = np.zeros((B, N, 128), np.float32)
        m0 = np.zeros((B, N), bool)
        m1 = np.zeros((B, N), bool)
        for i in range(B):
            p0, dd0 = self._detect(batch["image0"][i])
            p1, dd1 = self._detect(batch["image1"][i])
            n0, n1 = min(len(p0), N), min(len(p1), N)
            kp0[i, :n0], d0[i, :n0], m0[i, :n0] = p0[:n0], dd0[:n0], True
            kp1[i, :n1], d1[i, :n1], m1[i, :n1] = p1[:n1], dd1[:n1], True

        idx1, ok = mutual_2nn_ratio_match(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), jnp.asarray(m1),
            self.ratio_threshold,
        )
        idx1 = np.asarray(idx1)
        ok = np.asarray(ok)
        corr_list = []
        for i in range(B):
            sel = ok[i]
            corr = np.concatenate([kp0[i][sel], kp1[i][idx1[i][sel]]], axis=-1)
            corr_list.append(corr)
        return pad_correspondences(corr_list, self.max_n)


class TPUSIFTMatching:
    """Fully on-device SIFT: the framework's batched DoG detector/descriptor
    (ops/sift.py) + exact 2-NN ratio matching. One jitted dispatch per batch —
    no host OpenCV in the loop."""

    def __init__(self, cfg):
        self.ratio_threshold = float(cfg.SIFT.RATIO_THRESHOLD)
        self.num_features = int(cfg.SIFT.NUM_FEATURES)
        self.max_n = int(cfg.TPU.MAX_CORRESPONDENCES)

    def get_correspondences(self, batch):
        from mapfree_tpu.ops.sift import root_sift, sift_detect_describe

        gray_w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        img0 = jnp.asarray(batch["image0"])
        img1 = jnp.asarray(batch["image1"])
        scale = 1.0 / 255.0 if img0.dtype == jnp.uint8 else 1.0
        img0 = img0.astype(jnp.float32) * scale @ gray_w
        img1 = img1.astype(jnp.float32) * scale @ gray_w
        out0 = sift_detect_describe(img0, num_features=self.num_features)
        out1 = sift_detect_describe(img1, num_features=self.num_features)

        idx1, ok = mutual_2nn_ratio_match(
            root_sift(out0["descriptors"]), root_sift(out1["descriptors"]),
            out0["mask"], out1["mask"], self.ratio_threshold,
        )
        kp0 = np.asarray(out0["keypoints"])
        kp1 = np.asarray(out1["keypoints"])
        idx1 = np.asarray(idx1)
        ok = np.asarray(ok)
        corr_list = []
        for i in range(kp0.shape[0]):
            sel = ok[i]
            corr_list.append(
                np.concatenate([kp0[i][sel], kp1[i][idx1[i][sel]]], axis=-1))
        return pad_correspondences(corr_list, self.max_n)


class FeatureMatchingModel:
    """Dispatch cfg.FEATURE_MATCHING x cfg.POSE_SOLVER, batched."""

    def __init__(self, cfg):
        self.cfg = cfg
        if cfg.FEATURE_MATCHING == "SIFT":
            self.feature_matching = SIFTMatching(cfg)
        elif cfg.FEATURE_MATCHING == "SIFT_TPU":
            self.feature_matching = TPUSIFTMatching(cfg)
        elif cfg.FEATURE_MATCHING == "Precomputed":
            self.feature_matching = PrecomputedMatching(cfg)
        else:
            raise NotImplementedError("Invalid feature matching")

        self.solver = cfg.POSE_SOLVER
        if self.solver not in ("EssentialMatrix", "EssentialMatrixMetric",
                               "EssentialMatrixMetricMean", "Procrustes", "PNP"):
            raise NotImplementedError("Invalid pose solver")
        self.n_iters = int(cfg.TPU.RANSAC_ITERATIONS)
        self._step = 0
        self._unpack_fns: dict = {}  # transfer spec -> jitted unpack
        # the adaptive ladder's finish (tier-1 fetch -> escalation decision
        # -> tier-2 dispatch) runs EAGERLY on this pool so batch i's
        # escalation round trips overlap batches i+1..'s transfer/solve —
        # the D2H wait is passive (no host CPU), so threads are free
        from concurrent.futures import ThreadPoolExecutor

        self._finish_pool = ThreadPoolExecutor(max_workers=2)

        self.depth_net = None
        if bool(cfg.DEPTH_NET.ENABLED):
            from mapfree_tpu.models.depth import DepthPredictor

            self.depth_net = DepthPredictor(cfg)

    @staticmethod
    def _gather_depth_host(depth, kpts):
        """Host mirror of ops.essential.gather_depth at floor(kpts): sample
        the depth maps at the keypoints so the tunnel ships [B, N] depths
        instead of full maps (~50x fewer bytes at 2048 correspondences).

        ``depth``: stacked [B, H, W] array OR a list of per-sample [H, W]
        maps — the loader keeps depth UNSTACKED (collating ~50 MB of maps
        per batch cost more 1-core host CPU than the entire solve)."""
        B = len(depth)
        out = np.zeros((B, kpts.shape[1]), np.float32)
        for i in range(B):
            d = np.asarray(depth[i])
            H, W = d.shape
            x = np.clip(np.floor(kpts[i, :, 0]).astype(np.int64), 0, W - 1)
            y = np.clip(np.floor(kpts[i, :, 1]).astype(np.int64), 0, H - 1)
            out[i] = d[y, x]
        return out

    def _depth_map_host(self, batch, key_):
        """Validated host depth maps (stacked array or per-sample list)."""
        d = batch.get(key_)
        ok = (d is not None and len(d) > 0
              and all(np.ndim(m) == 2 and np.size(m) for m in d))
        if not ok:
            raise ValueError(
                f"solver {self.solver} requires depth maps; set "
                "DATASET.ESTIMATED_DEPTH or DEPTH_NET.ENABLED"
            )
        return d

    def _unpack_fn(self, spec):
        """Cached jitted unpack of the single per-batch transfer buffer
        (one dispatch returning every solver input as a device array)."""
        fn = self._unpack_fns.get(spec)
        if fn is None:
            from mapfree_tpu.utils.packing import unpack

            fn = self._unpack_fns[spec] = jax.jit(
                lambda buf: unpack(buf, spec))
        return fn

    def transfer_batch(self, batch, times=None):
        """Host stage (safe on a worker thread): correspondence fetch, host
        depth gather, then ONE packed-buffer H2D. Six small per-array
        transfers cost six tunnel round trips (~27 ms each — the round-4
        matching sweep's dominant stage); the packed buffer costs one."""
        from mapfree_tpu.utils.packing import pack_arrays, spec_of
        from mapfree_tpu.utils.timing import NULL_TIMES

        times = times or NULL_TIMES
        cfg = self.cfg
        with times.stage("correspondences"):
            pts0, pts1, mask = self.feature_matching.get_correspondences(batch)
        B = pts0.shape[0]
        # raw threefry key, equal to jax.random.PRNGKey(self._step)
        key = np.asarray([0, self._step], np.uint32)
        self._step += 1

        metric = (self.solver.startswith("EssentialMatrix")
                  and self.solver != "EssentialMatrix")
        named = [("key", key), ("pts0", pts0), ("pts1", pts1),
                 ("mask", mask),
                 ("K0", np.asarray(batch["K_color0"], np.float32)),
                 ("K1", np.asarray(batch["K_color1"], np.float32))]
        if self.depth_net is not None and self.solver != "EssentialMatrix":
            # in-graph depth: ship the images; the depth net + keypoint
            # gather run on device (DepthPredictor.point_depths)
            named.append(("image0", np.asarray(batch["image0"])))
            if self.solver != "PNP":
                named.append(("image1", np.asarray(batch["image1"])))
        elif metric:
            with times.stage("depth_gather"):
                named.append(("d0", self._gather_depth_host(
                    self._depth_map_host(batch, "depth0"), pts0)))
                named.append(("d1", self._gather_depth_host(
                    self._depth_map_host(batch, "depth1"), pts1)))
        elif self.solver == "PNP":
            with times.stage("depth_gather"):
                named.append(("d0", self._gather_depth_host(
                    self._depth_map_host(batch, "depth0"), pts0)))
        elif self.solver == "Procrustes":
            d0 = np.stack([np.asarray(m, np.float32) for m in
                           self._depth_map_host(batch, "depth0")])
            d1 = np.stack([np.asarray(m, np.float32) for m in
                           self._depth_map_host(batch, "depth1")])
            named += [("depth0", d0), ("depth1", d1)]
            if bool(cfg.PROCRUSTES.REFINE):
                with times.stage("depth_gather"):
                    clouds0, masks0, clouds1, masks1 = [], [], [], []
                    for i in range(B):
                        c0, mm0 = dense_cloud_from_depth(
                            d0[i], np.asarray(batch["K_color0"][i]),
                            4096, seed=i)
                        c1, mm1 = dense_cloud_from_depth(
                            d1[i], np.asarray(batch["K_color1"][i]),
                            4096, seed=i + 1)
                        clouds0.append(c0); masks0.append(mm0)
                        clouds1.append(c1); masks1.append(mm1)
                named += [("icp_cloud0", np.stack(clouds0)),
                          ("icp_mask0", np.stack(masks0)),
                          ("icp_cloud1", np.stack(clouds1)),
                          ("icp_mask1", np.stack(masks1))]

        spec = spec_of(named)
        with times.stage("h2d"):
            buf = pack_arrays([a for _, a in named])
            dev = jnp.asarray(buf)
            dev.block_until_ready()  # see builder.transfer_batch: dispatching
            #                          against in-flight transfers is ~10x slower
        return (spec, dev, B)

    def dispatch_device(self, transferred, times=None):
        """Device stage: one unpack dispatch + one fused solver dispatch
        (plus the adaptive ladder's escalation tier when triggered).
        Returns finalize() -> (R, t, inliers) numpy — the only D2H fetch."""
        from mapfree_tpu.utils.timing import NULL_TIMES

        times = times or NULL_TIMES
        cfg = self.cfg
        spec, dev, B = transferred
        d = self._unpack_fn(spec)(dev)
        key = d["key"]
        pts0, pts1, maskj = d["pts0"], d["pts1"], d["mask"]
        K0, K1 = d["K0"], d["K1"]

        # the essential solvers pack [R|t|inliers|adapt] in-graph
        # (ops/essential._pack_outputs) and the adaptive driver splits into
        # dispatch/finish so escalation never blocks this stage — the batch
        # costs at most ONE D2H round trip, paid lazily in finalize()
        packed = adaptive_finish = None
        with times.stage("solve"):
            if self.solver.startswith("EssentialMatrix"):
                metric = self.solver != "EssentialMatrix"
                variant = ("mean" if self.solver == "EssentialMatrixMetricMean"
                           else "ransac")
                scale_thr = float(cfg.EMAT_RANSAC.SCALE_THRESHOLD)
                pix_thr = float(cfg.EMAT_RANSAC.PIX_THRESHOLD)
                adaptive = bool(cfg.TPU.ADAPTIVE_RANSAC)
                point_depths = None
                if metric:
                    if "d0" in d:  # pre-gathered file depth
                        d0, d1 = d["d0"], d["d1"]
                    else:  # in-graph depth net, fused gather on device
                        with times.stage("depth_net"):
                            d0 = self.depth_net.point_depths(
                                d["image0"], pts0)
                            d1 = self.depth_net.point_depths(
                                d["image1"], pts1)
                    point_depths = (d0, d1, scale_thr, variant)
                if adaptive:
                    adaptive_finish = essential_pose_adaptive_async(
                        key, pts0, pts1, maskj, K0, K1, pix_thr,
                        n_iters=self.n_iters, point_depths=point_depths)
                elif metric:
                    out = essential_pose_metric(
                        key, pts0, pts1, maskj, K0, K1, pix_thr,
                        d0, d1, scale_thr, variant=variant,
                        n_iters=self.n_iters)
                    packed = out["packed"]
                else:
                    out = essential_pose(key, pts0, pts1, maskj, K0, K1,
                                         pix_thr, n_iters=self.n_iters)
                    packed = out["packed"]
            elif self.solver == "PNP":
                if "d0" in d:
                    d0 = d["d0"]
                else:
                    with times.stage("depth_net"):
                        d0 = self.depth_net.point_depths(d["image0"], pts0)
                out = pnp_pose(
                    key, pts0, pts1, maskj, d0, K0, K1,
                    float(cfg.PNP.REPROJECTION_INLIER_THRESHOLD),
                    n_iters=self.n_iters, point_depths=True,
                )
                packed = _pack_pose(out["R"], out["t"], out["inliers"])
            else:  # Procrustes
                refine = bool(cfg.PROCRUSTES.REFINE)
                if "depth0" in d:
                    depth0, depth1 = d["depth0"], d["depth1"]
                else:
                    with times.stage("depth_net"):
                        depth0 = self.depth_net(d["image0"])
                        depth1 = self.depth_net(d["image1"])
                kwargs = {k: d[k] for k in ("icp_cloud0", "icp_mask0",
                                            "icp_cloud1", "icp_mask1")
                          if k in d}
                out = procrustes_pose(
                    key, pts0, pts1, maskj, depth0, depth1,
                    K0, K1, float(cfg.PROCRUSTES.MAX_CORR_DIST),
                    n_iters=self.n_iters, refine=refine, **kwargs,
                )
                packed = _pack_pose(out["R"], out["t"], out["inliers"])

        finish_fut = (self._finish_pool.submit(adaptive_finish)
                      if adaptive_finish is not None else None)

        def finalize():
            if finish_fut is not None:
                # tier-1 fetch + escalation already running on the pool;
                # this just collects the result
                with times.stage("d2h_wait"):
                    p = finish_fut.result()["_host_packed"]
            else:
                with times.stage("d2h_wait"):
                    p = np.asarray(packed, np.float32)
            R_h = p[:, :9].reshape(B, 3, 3)
            t_h = p[:, 9:12].reshape(B, 1, 3)
            inl_h = p[:, 12]
            return R_h, t_h, inl_h

        return finalize

    def __call__(self, batch):
        """batch: collated dict with numpy arrays. Returns (R [B,3,3],
        t [B,1,3], inliers [B]) numpy; NaN pose where estimation failed."""
        return self.dispatch_device(self.transfer_batch(batch))()
