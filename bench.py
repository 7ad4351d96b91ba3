"""Benchmark: flagship RPR model throughput, model-only and end-to-end.

Two measurements (flagship 3d3d at its own 360x270 resolution — the
reference's config/regression/mapfree/3d3d.yaml DATASET override; scene
JPEGs are stored at the capture resolution 720x540 and DCT-scale-decoded):

1. model-only: jitted forward throughput, swept over batch sizes, chained
   data dependencies + final host transfer (remote TPU execution is only
   fenced by a host read — docs/NOTES.md "Gotchas");
2. end-to-end: synthetic on-disk val scenes -> native batch JPEG decode ->
   H2D -> forward -> pose extraction -> submission.zip, i.e. the full
   reference submission sweep (reference submission.py:33-65).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with extra
keys for the secondary numbers. Baseline: north-star 2,000 pairs/s end-to-end
on the MapFree val sweep (BASELINE.md; reference runs batch-1 on one GPU).
"""

import json
import os
import shutil
import time
from contextlib import nullcontext as _nullcontext
from pathlib import Path

import numpy as np

BASELINE_PAIRS_PER_SEC = 2000.0
SCENES_DIR = Path(__file__).parent / ".bench_scenes"
N_SCENES = 8
N_QUERIES = 160  # -> 32 eval pairs per scene (every 5th query frame)
H, W = 720, 540


def _make_bench_scenes():
    """Synthetic photo-like MapFree val scenes on disk (cached across runs)."""
    import cv2

    marker = SCENES_DIR / f"ok_{N_SCENES}_{N_QUERIES}_{H}x{W}"
    if marker.exists():
        return
    if SCENES_DIR.exists():
        shutil.rmtree(SCENES_DIR)
    rng = np.random.default_rng(0)
    for s in range(N_SCENES):
        scene = SCENES_DIR / "val" / f"s{s:05}"
        (scene / "seq0").mkdir(parents=True)
        (scene / "seq1").mkdir(parents=True)
        frames = ["seq0/frame_00000.jpg"] + [
            f"seq1/frame_{i:05}.jpg" for i in range(N_QUERIES)
        ]
        # low-frequency content so the JPEGs decode like photographs,
        # not adversarial noise
        base = rng.integers(0, 235, size=(45, 34, 3), dtype=np.uint8)
        intr, pose = [], []
        for name in frames:
            jit = base + rng.integers(0, 20, size=base.shape, dtype=np.uint8)
            img = cv2.resize(jit, (W, H), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(scene / name), img, [cv2.IMWRITE_JPEG_QUALITY, 92])
            q = np.array([1.0, 0.0, 0.0, 0.0])
            t = rng.normal(size=3) * 0.5
            intr.append(f"{name} 500.0 500.0 {W / 2} {H / 2} {W} {H}")
            pose.append(
                f"{name} " + " ".join(f"{v:.9f}" for v in np.concatenate([q, t]))
            )
        (scene / "intrinsics.txt").write_text("\n".join(intr) + "\n")
        (scene / "poses.txt").write_text("\n".join(pose) + "\n")
    marker.touch()


def _flagship_cfg():
    from mapfree_tpu.config import cfg as default_cfg

    cfg = default_cfg.clone()
    cfg.merge_from_file("configs/mapfree.yaml")
    cfg.merge_from_file("configs/regression/mapfree/3d3d.yaml")
    return cfg


def tunnel_probe(size_mb: int = 21, reps: int = 3):
    """Tunnel H2D bandwidth in BOTH of its modes (docs/TUNNEL.md):

    - ``spec``: speculation/recording mode (before the process's first D2H
      materialization) — journal-buffered, ~GB/s, NOT the real wire;
    - ``wire``: after a D2H fetch of an executed result permanently drops
      the session into synchronous mode — the throughput every sweep
      actually gets, since producing any result requires that fetch.

    The wire numbers bound achievable e2e pairs/s:
    pairs/s <= wire_mbps_aggregate / MB-per-pair. The probe deliberately
    performs the poisoning fetch itself; everything bench runs afterwards
    pays the wire mode anyway (model-only fetches results too)."""
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    n = size_mb * 1024 * 1024
    rng = np.random.default_rng(0)

    def ship(arr):
        t0 = time.perf_counter()
        jnp.asarray(arr).block_until_ready()
        return time.perf_counter() - t0

    ship(rng.integers(0, 255, size=1 << 20, dtype=np.uint8))  # warm path
    spec = []
    for r in range(reps):
        spec.append(size_mb / ship(
            rng.integers(0, 255, size=n, dtype=np.uint8)))

    # enter the real (post-materialization) mode
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    float(f(jnp.float32(1.0)))

    single = []
    for r in range(reps):
        single.append(size_mb / ship(
            rng.integers(0, 255, size=n, dtype=np.uint8)))
    multi = []
    workers = 3
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        for r in range(reps):
            arrs = [rng.integers(0, 255, size=n, dtype=np.uint8)
                    for _ in range(workers)]
            t0 = time.perf_counter()
            list(ex.map(ship, arrs))
            multi.append(workers * size_mb / (time.perf_counter() - t0))
    return {"h2d_mbps_speculation": round(float(np.median(spec)), 1),
            "h2d_mbps_wire_1thread": round(float(np.median(single)), 1),
            "h2d_mbps_wire_3thread": round(float(np.median(multi)), 1)}


def _model_flops(net, variables, B, h, w):
    """Analytic forward FLOPs from XLA's own cost model (per batch)."""
    import jax
    import jax.numpy as jnp

    def f(a, b):
        R, t, _ = net.apply(variables, a, b, train=False)
        return R, t

    spec = jax.ShapeDtypeStruct((B, h, w, 3), jnp.float32)
    analysis = jax.jit(f).lower(spec, spec).compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


# bf16 MXU peak of the chip this environment exposes (TPU v5 lite / v5e:
# 197 TFLOP/s per chip); MFU is reported against this
_PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12,
               "TPU v4": 275e12, "TPU v5p": 459e12}


def bench_model_only(cfg, batch_sizes=(32, 64), dispersion_reps=3):
    """Best jitted-forward device throughput over a batch-size sweep.

    Methodology (docs/NOTES.md gotchas): the tunnel adds a large,
    time-varying per-dispatch cost and memoizes identical dispatches, so a
    per-batch dispatch loop measures the tunnel, not the TPU. Instead K
    batches of distinct data are consumed by ONE dispatch via lax.scan,
    chained through a scalar carry (forces sequential execution), and the
    per-batch time is the slope between two K values — the dispatch cost
    cancels exactly. A production sweep batches dispatches the same way.

    The winning batch size is re-measured ``dispersion_reps`` times spaced
    across the run; returns (median_pps, best_B, stats) where stats carries
    {median,min,max} pairs/s plus the forward FLOPs and MFU.
    """
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.models import build_regression_net

    net = build_regression_net(cfg)
    h, w = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH

    def measure(B, variables=None):
        k1, k2 = 2, 5
        # synthetic inputs are generated ON DEVICE: shipping GBs of random
        # f32 through the tunnel was once measured at 3.6 MB/s (minutes per
        # array) and has nothing to do with the quantity under test
        gen = jax.jit(
            lambda key: jax.random.normal(key, (k2, B, h, w, 3), jnp.float32))
        xs0 = gen(jax.random.PRNGKey(1))
        xs1 = gen(jax.random.PRNGKey(2))
        if variables is None:
            variables = jax.jit(net.init, static_argnums=(3,))(
                jax.random.PRNGKey(0), xs0[0], xs1[0], False
            )

        def make(k):
            @jax.jit
            def run(carry, xs0, xs1):
                def body(c, x):
                    a, b = x
                    R, t, _ = net.apply(
                        variables, a + c * 1e-6, b + c * 1e-7, train=False
                    )
                    return c + jnp.sum(R) + jnp.sum(t), None
                out, _ = jax.lax.scan(body, carry, (xs0[:k], xs1[:k]))
                return out
            return run

        run1, run2 = make(k1), make(k2)
        float(run1(jnp.float32(0.0), xs0, xs1))  # compile + warm
        float(run2(jnp.float32(0.0), xs0, xs1))

        def med(run, iters=5):
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(run(jnp.float32(0.0), xs0, xs1))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        per_batch = (med(run2) - med(run1)) / (k2 - k1)
        return B / per_batch, variables

    best = (0.0, 0)
    variables = None
    for B in batch_sizes:
        pps, variables = measure(B, variables)
        if pps > best[0]:
            best = (pps, B)

    # dispersion: re-measure the winner, spaced in time, so a tunnel mood
    # swing is distinguishable from a code regression
    samples = [best[0]]
    for _ in range(dispersion_reps - 1):
        pps, _ = measure(best[1], variables)
        samples.append(pps)
    stats = {"median": round(float(np.median(samples)), 2),
             "min": round(float(np.min(samples)), 2),
             "max": round(float(np.max(samples)), 2)}

    try:
        import jax as _jax

        flops = _model_flops(net, variables, best[1], h, w)
        kind = _jax.devices()[0].device_kind
        peak = _PEAK_FLOPS.get(kind)
        flops_per_pair = flops / best[1]
        stats["forward_gflops_per_pair"] = round(flops_per_pair / 1e9, 2)
        if peak and flops:
            # MFU = achieved FLOP/s over the chip's bf16 MXU peak
            stats["mfu"] = round(stats["median"] * flops_per_pair / peak, 4)
    except Exception as e:  # cost_analysis is backend-dependent
        stats["mfu_error"] = str(e)[:120]

    return stats["median"], best[1], stats


def bench_train(cfg, batch: int = 16):
    """Training-step throughput (fwd + bwd + Adam), scan-slope methodology.
    The reference trains batch 10 on one GPU (BASELINE.md recipe)."""
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.models import build_regression_net
    from mapfree_tpu.train.state import init_state, make_optimizer, _forward_loss

    net = build_regression_net(cfg)
    h, w = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    B = batch
    tx = make_optimizer(cfg.TRAINING)

    k1, k2 = 1, 2
    # on-device synthetic inputs (see bench_model_only for why)
    gen = jax.jit(
        lambda key: jax.random.normal(key, (k2, B, h, w, 3), jnp.float32))
    xs0 = gen(jax.random.PRNGKey(1))
    xs1 = gen(jax.random.PRNGKey(2))
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    batch0 = {"image0": xs0[0], "image1": xs1[0], "T_0to1": eye}
    state = init_state(net, cfg, jax.random.PRNGKey(0), batch0)
    opt_state = tx.init(state.params)

    def make(k):
        @jax.jit
        def run(params, bs, opt_state, xs0, xs1):
            def body(carry, x):
                params, bs, opt_state = carry
                b = {"image0": x[0], "image1": x[1], "T_0to1": eye}

                def loss_fn(p):
                    return _forward_loss(net, cfg, p, bs, b, True)

                (loss, (_, _, _, _, new_bs, _)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                import optax
                params = optax.apply_updates(params, updates)
                return (params, new_bs, opt_state), loss
            (params, bs, opt_state), losses = jax.lax.scan(
                body, (params, bs, opt_state), (xs0[:k], xs1[:k]))
            return losses[-1]
        return run

    run1, run2 = make(k1), make(k2)
    args = (state.params, state.batch_stats, opt_state, xs0, xs1)
    float(run1(*args))
    float(run2(*args))

    def med(run, iters=4):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    per_step = (med(run2) - med(run1)) / (k2 - k1)
    return B / per_step


T_SCENES_DIR = Path(__file__).parent / ".bench_scenes_train"
N_T_SCENES = 4
N_T_FRAMES = 40  # per sequence


def _make_train_scenes():
    """Synthetic TRAIN scenes (seq0 + seq1 with overlaps.npz) so training can
    be benchmarked through the real loader, not device-resident tensors."""
    import cv2

    marker = T_SCENES_DIR / f"ok_{N_T_SCENES}_{N_T_FRAMES}_{H}x{W}"
    if marker.exists():
        return
    if T_SCENES_DIR.exists():
        shutil.rmtree(T_SCENES_DIR)
    rng = np.random.default_rng(11)
    for s in range(N_T_SCENES):
        scene = T_SCENES_DIR / "train" / f"s{s:05}"
        (scene / "seq0").mkdir(parents=True)
        (scene / "seq1").mkdir(parents=True)
        frames = [f"seq{q}/frame_{i:05}.jpg"
                  for q in (0, 1) for i in range(N_T_FRAMES)]
        base = rng.integers(0, 235, size=(45, 34, 3), dtype=np.uint8)
        intr, pose = [], []
        for name in frames:
            jit = base + rng.integers(0, 20, size=base.shape, dtype=np.uint8)
            img = cv2.resize(jit, (W, H), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(scene / name), img, [cv2.IMWRITE_JPEG_QUALITY, 92])
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3) * 0.5
            intr.append(f"{name} 500.0 500.0 {W / 2} {H / 2} {W} {H}")
            pose.append(
                f"{name} " + " ".join(f"{v:.9f}" for v in np.concatenate([q, t])))
        (scene / "intrinsics.txt").write_text("\n".join(intr) + "\n")
        (scene / "poses.txt").write_text("\n".join(pose) + "\n")
        # all (seq0, seq1) pairs at a valid overlap (reference overlaps.npz
        # contract: idxs [N,4] = (seqA, imgA, seqB, imgB))
        idxs = np.array([(0, i, 1, j) for i in range(N_T_FRAMES)
                         for j in range(N_T_FRAMES) if abs(i - j) <= 3])
        overlaps = rng.uniform(0.25, 0.75, size=len(idxs))
        np.savez(scene / "overlaps.npz", idxs=idxs, overlaps=overlaps)
    marker.touch()


def bench_train_loader(cfg, batch: int = 16, steps: int = 16):
    """Training throughput THROUGH the real input pipeline (disk -> native
    decode -> collate -> H2D -> augment -> fwd+bwd+Adam), for both
    augmentation placements:

    - device: loader ships uint8, ColorJitter runs in-graph (TPU.DEVICE_AUGMENT);
    - host: torchvision-style float32 host jitter (the reference's placement,
      datamodules.py:33-40) — 4x the H2D bytes.

    Steps are dispatched WITHOUT per-step blocking (jax async dispatch
    overlaps the tunnel/H2D with loading); one final block fences the run.
    Returns {"device_aug": samples/s, "host_aug": samples/s}.
    """
    import jax

    from mapfree_tpu.data.datamodule import DataModule
    from mapfree_tpu.train.state import init_state, make_train_step
    from mapfree_tpu.models import build_regression_net
    from mapfree_tpu.utils.data import data_to_device, prefetch_to_device
    from mapfree_tpu.utils.timing import StageTimes

    out = {}
    stages = {}
    for label, device_aug in (("device_aug", True), ("host_aug", False)):
        c = cfg.clone()
        c.DATASET.DATA_SOURCE = "MapFree"
        c.DATASET.DATA_ROOT = str(T_SCENES_DIR)
        c.DATASET.SCENES = None
        if c.DATASET.MIN_OVERLAP_SCORE is None:
            c.DATASET.MIN_OVERLAP_SCORE = 0.2
            c.DATASET.MAX_OVERLAP_SCORE = 0.8
        c.DATASET.AUGMENTATION_TYPE = "colorjitter"
        c.TPU.DEVICE_AUGMENT = device_aug
        c.TRAINING.BATCH_SIZE = batch
        c.TRAINING.NUM_WORKERS = 2
        c.TRAINING.N_SAMPLES_SCENE = (steps + 4) * batch // N_T_SCENES + 1

        dm = DataModule(c)
        net = build_regression_net(c)
        step_fn = make_train_step(net, c, donate=False)

        from mapfree_tpu.train.fit import _TRAIN_KEYS

        times = StageTimes()

        def trim(b):
            with times.stage("h2d"):
                db = data_to_device({k: b[k] for k in _TRAIN_KEYS})
                jax.block_until_ready(db)  # fence (see prefetch_to_device)
            return db

        loader = dm.train_dataloader()
        loader.times = times  # decode/collate/queue_put busy-time breakdown
        it = iter(loader)
        first = trim(next(it))
        state = init_state(net, c, jax.random.PRNGKey(0), first)
        state, _ = step_fn(state, first)  # compile + warm
        jax.block_until_ready(state.params)
        times.reset()  # drop warm-up/compile-phase stage time

        t0 = time.perf_counter()
        n = 0
        logs = None
        # batch k+1's H2D overlaps batch k's step (fit() uses the same
        # pipeline); 2 transfer threads overlap the tunnel's round-trip-
        # bound post-materialisation H2D mode
        for db in prefetch_to_device(it, trim, lookahead=2, pool_workers=2):
            if n >= steps * batch:
                break
            n += int(db["image0"].shape[0])
            with times.stage("step_dispatch"):
                state, logs = step_fn(state, db)
        jax.block_until_ready((state.params, logs))
        out[label] = n / (time.perf_counter() - t0)
        # queue_put is the producer's backpressure wait; its first post-
        # reset sample spans the consumer's warm-up compile window and
        # would dwarf every real stage — drop it from the report
        stages[label] = {k: v for k, v in times.summary().items()
                         if k != "queue_put"}
    return out, stages


def bench_e2e(cfg, batch: int):
    """Full val sweep: disk -> decode -> H2D -> forward -> submission.zip.

    Returns (pairs/s, per-stage busy-seconds breakdown). Stages overlap
    (three-thread pipeline), so the breakdown identifies the bottleneck
    stage: the largest busy time ~= elapsed when one stage dominates."""
    import tempfile

    from mapfree_tpu.data import DataLoader, MapFreeDataset
    from mapfree_tpu.models.builder import build_model
    from mapfree_tpu.utils.submission import predict, save_submission
    from mapfree_tpu.utils.timing import StageTimes

    cfg = cfg.clone()
    cfg.DATASET.DATA_ROOT = str(SCENES_DIR)
    cfg.DATASET.SCENES = None
    cfg.TPU.INFER_BATCH = batch

    dataset = MapFreeDataset(cfg, "val")
    model = build_model(cfg)

    def sweep(times=None, workers=4):
        loader = DataLoader(dataset, batch_size=batch, num_workers=2,
                            prefetch=workers + 2, times=times,
                            unique_refs=(cfg.MODEL == "Regression"
                                         and int(cfg.TPU.UNIQUE_REFS) > 0))
        results = predict(loader, model, times=times,
                          transfer_workers=workers)
        with (times.stage("zip") if times else _nullcontext()):
            with tempfile.TemporaryDirectory() as d:
                save_submission(results, Path(d) / "submission.zip")
        return results

    sweep()  # warm: compile + OS page cache
    best = (0.0, None, 2)
    # transfer-thread sweep: after the tunnel's first D2H materialisation,
    # H2D runs round-trip-bound per ~MB chunk and scales with concurrent
    # streams (tools/poison_experiment.py) — more workers = more H2D
    for workers in (3, 6):
        times = StageTimes()
        start = time.perf_counter()
        results = sweep(times, workers)
        elapsed = time.perf_counter() - start
        n_pairs = sum(len(v) for v in results.values())
        assert n_pairs == len(dataset), \
            f"{n_pairs} poses for {len(dataset)} pairs"
        if n_pairs / elapsed > best[0]:
            breakdown = times.summary()
            breakdown["elapsed"] = round(elapsed, 4)
            best = (n_pairs / elapsed, breakdown, workers)
    best[1]["transfer_workers"] = best[2]
    return best[0], best[1]


M_SCENES_DIR = Path(__file__).parent / ".bench_scenes_matching"
N_M_SCENES = 6
N_M_QUERIES = 50  # -> 10 eval pairs per scene
M_H, M_W = 360, 270
# difficulty tiers (scene index -> (outlier_frac, noise_px, max_corr)): the
# easy tier matches well-textured SIFT scenes; the hard tier (70% outliers,
# 2 px) is the regime USAC_MAGSAC exists for (reference pose_solver.py:46-48);
# the extreme tier (85% outliers, only 128 correspondences) sits past the
# solver's saturation point so the driver-visible accuracy signal can MOVE —
# at 2048 correspondences even 70%/2px scores precision 1.0 (VERDICT r4 #4)
M_TIERS = {"easy": (0.3, 0.5, None), "hard": (0.7, 2.0, None),
           "extreme": (0.85, 2.0, 128)}


def _m_scene_tier(s: int) -> str:
    return list(M_TIERS)[s * len(M_TIERS) // N_M_SCENES]


def _make_matching_scenes():
    """Synthetic val scenes with GT-consistent depth + noisy/outlier-laden
    precomputed correspondences (the matching track's realistic input: the
    reference consumes offline LoFTR/SG/SIFT npz, lib/models/matching/
    feature_matching.py:5-50, and solves with USAC_MAGSAC)."""
    import cv2

    marker = M_SCENES_DIR / f"ok2_{N_M_SCENES}_{N_M_QUERIES}_{M_H}x{M_W}"
    if marker.exists():
        return
    if M_SCENES_DIR.exists():
        shutil.rmtree(M_SCENES_DIR)
    rng = np.random.default_rng(3)
    fx = fy = 450.0
    cx, cy = M_W / 2, M_H / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    K_inv = np.linalg.inv(K)

    for s in range(N_M_SCENES):
        outlier_frac, noise_px, max_corr = M_TIERS[_m_scene_tier(s)]
        scene = M_SCENES_DIR / "val" / f"s{s:05}"
        (scene / "seq0").mkdir(parents=True)
        (scene / "seq1").mkdir(parents=True)
        frames = ["seq0/frame_00000.jpg"] + [
            f"seq1/frame_{i:05}.jpg" for i in range(N_M_QUERIES)
        ]
        base = rng.integers(0, 235, size=(45, 34, 3), dtype=np.uint8)
        intr, pose_lines = [], []
        poses = {}
        for name in frames:
            jit = base + rng.integers(0, 20, size=base.shape, dtype=np.uint8)
            img = cv2.resize(jit, (M_W, M_H), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(scene / name), img, [cv2.IMWRITE_JPEG_QUALITY, 92])
            if name.startswith("seq0"):
                q = np.array([1.0, 0.0, 0.0, 0.0])
                t = np.zeros(3)
            else:
                axis = rng.normal(size=3)
                axis /= np.linalg.norm(axis)
                ang = rng.uniform(0.02, 0.2)
                q = np.concatenate([[np.cos(ang / 2)], axis * np.sin(ang / 2)])
                t = rng.normal(size=3) * 0.15
            poses[name] = (q, t)
            intr.append(f"{name} {fx} {fy} {cx} {cy} {M_W} {M_H}")
            pose_lines.append(
                f"{name} " + " ".join(f"{v:.9f}" for v in np.concatenate([q, t])))
        (scene / "intrinsics.txt").write_text("\n".join(intr) + "\n")
        (scene / "poses.txt").write_text("\n".join(pose_lines) + "\n")

        # view0 depth: smooth non-planar surface; correspondences projected
        # through the GT pose, with pixel noise + uniform outliers
        from mapfree_tpu.geom.quaternion import quat2mat

        uu, vv = np.meshgrid(np.arange(M_W), np.arange(M_H))
        depth0 = (2.5 + 0.5 * np.sin(uu / 23.0) + 0.4 * np.cos(vv / 19.0))
        cv2.imwrite(str(scene / "seq0/frame_00000.gt.png"),
                    (depth0 * 1000).astype(np.uint16))
        us = np.arange(6, M_W - 6, 6)
        vs = np.arange(6, M_H - 6, 6)
        gu, gv = np.meshgrid(us, vs)
        uv0 = np.stack([gu.reshape(-1), gv.reshape(-1)], -1).astype(np.float64)
        z0 = depth0[uv0[:, 1].astype(int), uv0[:, 0].astype(int)]
        X0 = (np.concatenate([uv0, np.ones_like(uv0[:, :1])], 1) @ K_inv.T) * z0[:, None]

        correspondences = []
        for i in range(N_M_QUERIES):
            name = f"seq1/frame_{i:05}.jpg"
            q, t = poses[name]
            R = np.asarray(quat2mat(q))
            X1 = X0 @ R.T + t
            uv1h = X1 @ K.T
            uv1 = uv1h[:, :2] / uv1h[:, 2:]
            vis = ((uv1[:, 0] >= 0) & (uv1[:, 0] < M_W - 1)
                   & (uv1[:, 1] >= 0) & (uv1[:, 1] < M_H - 1) & (X1[:, 2] > 0.1))
            depth1 = np.zeros((M_H, M_W), np.float32)
            ui = np.clip(uv1[vis, 0].astype(int), 0, M_W - 1)
            vi = np.clip(uv1[vis, 1].astype(int), 0, M_H - 1)
            depth1[vi, ui] = X1[vis, 2]
            cv2.imwrite(str(scene / name).replace(".jpg", ".gt.png"),
                        (depth1 * 1000).astype(np.uint16))
            u1 = uv1[vis] + rng.normal(scale=noise_px, size=(vis.sum(), 2))
            n_out = int(outlier_frac * len(u1))
            out_idx = rng.choice(len(u1), n_out, replace=False)
            u1[out_idx] = rng.uniform([0, 0], [M_W, M_H], size=(n_out, 2))
            corr = np.concatenate([uv0[vis], u1], 1).astype(np.float32)
            if max_corr is not None and len(corr) > max_corr:
                corr = corr[rng.choice(len(corr), max_corr, replace=False)]
            correspondences.append(corr)

        max_n = max(len(c) for c in correspondences)
        stacked = np.full((N_M_QUERIES, max_n, 4), np.nan, np.float32)
        for i, c in enumerate(correspondences):
            stacked[i, : len(c)] = c
        np.savez(scene / "correspondences.npz", correspondences=stacked)
    marker.touch()


def bench_matching(batch: int = 20):
    """Matching-track end-to-end: disk -> precomputed correspondences ->
    batched essential-matrix solver + metric scale (ONE fused dispatch per
    batch) -> submission.zip -> evaluator score (reference submission path
    over FeatureMatchingModel, lib/models/matching/model.py:29-40 +
    pose_solver.py:114-172).

    Returns (pairs/s, per-tier precision dict, stage breakdown). Precision
    is scored separately on the easy and hard difficulty tiers (M_TIERS) so
    the accuracy signal can actually move."""
    import tempfile

    from mapfree_tpu.benchmark.mapfree import run as run_benchmark
    from mapfree_tpu.config import cfg as default_cfg
    from mapfree_tpu.data import DataLoader, MapFreeDataset
    from mapfree_tpu.models.builder import build_model
    from mapfree_tpu.utils.submission import predict, save_submission
    from mapfree_tpu.utils.timing import StageTimes

    cfg = default_cfg.clone()
    cfg.merge_from_file("configs/mapfree.yaml")
    cfg.MODEL = "FeatureMatching"
    cfg.FEATURE_MATCHING = "Precomputed"
    cfg.POSE_SOLVER = "EssentialMatrixMetric"
    cfg.MATCHES_FILE_PATH = "{scene_root}/correspondences.npz"
    cfg.DATASET.DATA_ROOT = str(M_SCENES_DIR)
    cfg.DATASET.SCENES = None
    cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH = M_H, M_W
    cfg.DATASET.ESTIMATED_DEPTH = "gt"
    cfg.EMAT_RANSAC.PIX_THRESHOLD = 2.0
    cfg.EMAT_RANSAC.SCALE_THRESHOLD = 0.1
    cfg.TPU.INFER_BATCH = batch
    cfg.TPU.MAX_CORRESPONDENCES = 2048
    cfg.TPU.RANSAC_ITERATIONS = 512

    dataset = MapFreeDataset(cfg, "val")
    model = build_model(cfg)

    def sweep(out_zip, times=None):
        loader = DataLoader(dataset, batch_size=batch, num_workers=2,
                            prefetch=4, times=times)
        results = predict(loader, model, times=times)
        save_submission(results, out_zip)
        return results

    from mapfree_tpu.benchmark import config as bench_config

    pose_key = (f"Precision @ Pose Error < "
                f"({bench_config.t_threshold*100}cm, {bench_config.R_threshold}deg)")
    vcre_key = f"Precision @ VCRE < {bench_config.vcre_threshold}px"

    with tempfile.TemporaryDirectory() as d:
        sweep(Path(d) / "warm.zip")  # compile both budget tiers + page cache
        times = StageTimes()
        start = time.perf_counter()
        results = sweep(Path(d) / "submission.zip", times)
        elapsed = time.perf_counter() - start
        # throughput counts PROCESSED pairs: the extreme tier legitimately
        # yields NaN failures (skipped poses), which are work done, not
        # work avoided
        n_pairs = len(dataset)

        # score each difficulty tier against its own scene subset; besides
        # the thresholded precisions, record the CONTINUOUS aggregate errors
        # (median rot/trans/reproj) so regressions show even where precision
        # saturates at 1.0 (VERDICT r4 #4)
        precision = {}
        for tier in M_TIERS:
            tier_dir = Path(d) / f"gt_{tier}"
            tier_dir.mkdir()
            for s in range(N_M_SCENES):
                if _m_scene_tier(s) == tier:
                    (tier_dir / f"s{s:05}").symlink_to(
                        M_SCENES_DIR / "val" / f"s{s:05}")
            m = run_benchmark(Path(d) / "submission.zip", tier_dir)
            precision[tier] = {
                "pose": round(float(m[pose_key]), 4),
                "vcre": round(float(m[vcre_key]), 4),
                "med_rot_deg": round(
                    float(m["Average Median Rotation Error"]), 3),
                "med_trans_m": round(
                    float(m["Average Median Translation Error"]), 4),
                "med_reproj_px": round(
                    float(m["Average Median Reprojection Error"]), 2),
            }
    breakdown = times.summary()
    breakdown["elapsed"] = round(elapsed, 4)
    return n_pairs / elapsed, precision, breakdown


def _ensure_native():
    """Build the native batch decoder if it isn't importable (the .so is not
    tracked by git; the e2e number depends on it)."""
    try:
        import mapfree_native  # noqa: F401
    except ImportError:
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, str(Path(__file__).parent / "native" / "build.py")],
            check=False,
        )


def _device_watchdog(timeout_s: float = 240.0):
    """Fail fast (with a JSON line) when the TPU tunnel is unreachable.

    This environment reaches its chip through a tunnel that is sometimes
    down for hours; a jax op then blocks forever and the driver records
    NOTHING for the round. Probe with a tiny matmul on a daemon thread: if
    it does not complete in ``timeout_s``, print a fallback JSON line and
    hard-exit (os._exit — the hung runtime thread cannot be joined).
    """
    import threading

    done = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp

        (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "rpr_inference_throughput",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": f"device unreachable: warm-up matmul did not complete "
                     f"in {timeout_s:.0f}s (TPU tunnel down)",
        }))
        os._exit(2)


def main():
    import jax

    # persistent compilation cache: the fused-kernel model takes minutes to
    # compile cold; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _device_watchdog()

    _ensure_native()
    _make_bench_scenes()
    _make_matching_scenes()
    cfg = _flagship_cfg()

    tunnel = tunnel_probe()
    model_pps, best_batch, model_stats = bench_model_only(cfg)
    # training throughput is part of the default bench (VERDICT r3 item 4);
    # set MAPFREE_BENCH_SKIP_TRAIN=1 to keep a cold-cache run short (the
    # fwd+bwd graphs compile in seconds once .jax_cache is warm)
    train_sps = loader_sps = loader_stages = None
    if not os.environ.get("MAPFREE_BENCH_SKIP_TRAIN"):
        train_sps = bench_train(cfg)
        _make_train_scenes()
        loader_sps, loader_stages = bench_train_loader(cfg)
    # e2e batch 64: on the wire-bound tunnel, larger batches amortise the
    # per-transfer round-trip floor (measured 112 vs 72 pairs/s at B=64 vs
    # 32 in the same wire window)
    e2e_pps, e2e_stages = bench_e2e(cfg, 64)
    # the wire drifts minute-to-minute: re-sample it right after the sweep
    # so the ceiling the sweep actually faced is bracketed in the record
    import jax.numpy as _jnp

    _rng = np.random.default_rng(7)
    _wire = []
    for _ in range(2):
        _arr = _rng.integers(0, 255, size=4 << 20, dtype=np.uint8)
        _t0 = time.perf_counter()
        _jnp.asarray(_arr).block_until_ready()
        _wire.append(4.0 / (time.perf_counter() - _t0))
    wire_recheck = round(float(np.median(_wire)), 1)
    match_pps, match_precision, match_stages = bench_matching()

    # the tunnel's aggregate WIRE bandwidth bounds the e2e sweep: each pair
    # ships one packed-YUV420 query frame (H * W * 1.5 bytes). The
    # speculation-mode figure is NOT a ceiling — every sweep that produces
    # results runs in wire mode (docs/TUNNEL.md)
    mb_per_pair = (cfg.DATASET.HEIGHT * cfg.DATASET.WIDTH * 1.5) / (1 << 20)
    h2d_ceiling = tunnel["h2d_mbps_wire_3thread"] / mb_per_pair

    # Context: the north-star 2,000 pairs/s (BASELINE.json) is specified for
    # a v4-8 (8 chips); this bench runs on the single chip the environment
    # exposes. The sweep is embarrassingly parallel over scenes (the
    # multi-host driver shards it), so the fair per-chip share is 250.
    n_chips = len(jax.devices())
    print(
        json.dumps(
            {
                "metric": "rpr_inference_throughput",
                "value": round(model_pps, 2),
                "unit": "pairs/s",
                "vs_baseline": round(model_pps / BASELINE_PAIRS_PER_SEC, 4),
                "model_stats": model_stats,
                "best_batch": best_batch,
                "chips": n_chips,
                "north_star_chips": 8,
                "vs_per_chip_share": round(
                    model_pps / (BASELINE_PAIRS_PER_SEC * n_chips / 8), 4
                ),
                "tunnel": tunnel,
                "e2e_val_sweep_pairs_per_s": round(e2e_pps, 2),
                "e2e_vs_baseline": round(e2e_pps / BASELINE_PAIRS_PER_SEC, 4),
                "e2e_h2d_ceiling_pairs_per_s": round(h2d_ceiling, 1),
                # >= ~1.0 means the sweep saturates the tunnel's real wire
                # (the decomposition VERDICT r4 task 1 asked for)
                "e2e_vs_wire_ceiling": round(e2e_pps / max(h2d_ceiling, 1e-9), 3),
                "e2e_mb_per_pair": round(mb_per_pair, 4),
                "tunnel_wire_recheck_mbps": wire_recheck,
                "e2e_stage_seconds": e2e_stages,
                "matching_track_pairs_per_s": round(match_pps, 2),
                "matching_precision": match_precision,
                "matching_stage_seconds": match_stages,
                **(
                    {"train_step_samples_per_s": round(train_sps, 2)}
                    if train_sps is not None else {}
                ),
                **(
                    {"train_loader_samples_per_s": {
                        k: round(v, 2) for k, v in loader_sps.items()},
                     # loader-fed vs device-only: < 1.0 means the input
                     # pipeline (not the TPU) bounds training; the round-2
                     # "done" bar is >= 0.8 (within 20% of device-only)
                     "train_loader_vs_device": round(
                         max(loader_sps.values()) / train_sps, 4),
                     "train_loader_stage_seconds": loader_stages,
                     # wire-bound check: a training sample ships ref+query
                     # as YUV420 uint8; loader samples/s is capped by
                     # wire_mbps_aggregate / this (docs/TUNNEL.md)
                     "train_mb_per_sample": round(2 * mb_per_pair, 4),
                     "train_loader_vs_wire_ceiling": round(
                         max(loader_sps.values()) * 2 * mb_per_pair
                         / max(tunnel["h2d_mbps_wire_3thread"], 1e-9), 3)}
                    if loader_sps is not None else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
