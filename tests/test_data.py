"""Data pipeline tests on synthetic MapFree scenes: pair generation, sample
contract, relative-pose correctness, sampler balance, loader collation."""

import numpy as np
import pytest

from fixtures import make_device_poses, make_scene

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.data import DataLoader, MapFreeDataset, RandomConcatSampler
from mapfree_tpu.data.mapfree import MapFreeScene, MapFreeSceneMultiFrame
from mapfree_tpu.geom import quat2mat


@pytest.fixture
def scene_eval(tmp_path):
    root = tmp_path / "val" / "s00001"
    poses = make_scene(root, n_queries=12, train=False)
    return root, poses


@pytest.fixture
def scene_train(tmp_path):
    root = tmp_path / "train" / "s00002"
    poses = make_scene(root, n_queries=12, train=True, seed=1)
    return root, poses


class TestPairGeneration:
    def test_eval_pairs_every_5th(self, scene_eval):
        root, _ = scene_eval
        scene = MapFreeScene(root, resize=(54, 72), sample_factor=5)
        # queries 0, 5, 10 out of 12
        assert len(scene) == 3
        assert [p[3] for p in scene.pairs] == [0, 5, 10]
        assert all(p[0] == 0 and p[1] == 0 and p[2] == 1 for p in scene.pairs)

    def test_train_pairs_overlap_filtered(self, scene_train):
        root, _ = scene_train
        f = np.load(root / "overlaps.npz", allow_pickle=True)
        expected = np.logical_and(0.3 < f["overlaps"], f["overlaps"] < 0.8).sum()
        scene = MapFreeScene(root, resize=(54, 72), overlap_limits=(0.3, 0.8))
        assert len(scene) == expected

    def test_multiframe_eval_windows(self, scene_eval):
        root, poses = scene_eval
        make_device_poses(root, poses)
        scene = MapFreeSceneMultiFrame(
            root, resize=(54, 72), sample_factor=10, sample_offset=9
        )
        # 12 queries -> one window ending at frame index 9
        assert len(scene) == 1
        seqA, imgA, seqB, window = scene.pairs[0]
        assert window == tuple(range(1, 10))


class TestSampleContract:
    def test_getitem_keys_and_shapes(self, scene_eval):
        root, _ = scene_eval
        scene = MapFreeScene(root, resize=(54, 72), sample_factor=5)
        s = scene[0]
        assert s["image0"].shape == (72, 54, 3)
        assert s["image1"].shape == (72, 54, 3)
        assert s["T_0to1"].shape == (4, 4)
        assert s["K_color0"].shape == (3, 3)
        for key in ("abs_q_0", "abs_c_0", "abs_q_1", "abs_c_1", "scene_id",
                    "pair_id", "pair_names", "sim", "dataset_name"):
            assert key in s
        assert 0.0 <= s["image0"].min() and s["image0"].max() <= 1.0

    def test_relative_pose_matches_gt(self, scene_eval):
        """With identity reference pose, T_0to1 must equal the query w2c pose."""
        root, poses = scene_eval
        scene = MapFreeScene(root, resize=(54, 72), sample_factor=5)
        s = scene[1]  # query frame 5
        q, t = poses["seq1/frame_00005.jpg"]
        assert np.allclose(s["T_0to1"][:3, :3], quat2mat(q), atol=1e-6)
        assert np.allclose(s["T_0to1"][:3, 3], t, atol=1e-6)

    def test_depth_loading(self, tmp_path):
        root = tmp_path / "val" / "s00003"
        make_scene(root, n_queries=5, depth_suffix="dptnyu")
        scene = MapFreeScene(root, resize=(54, 72), sample_factor=5,
                             estimated_depth="dptnyu")
        s = scene[0]
        assert s["depth0"].shape == (72, 54)
        assert 0.4 < s["depth0"].mean() < 5.1  # mm -> meters conversion

    def test_multiframe_sample(self, scene_eval):
        root, poses = scene_eval
        make_device_poses(root, poses)
        scene = MapFreeSceneMultiFrame(root, resize=(54, 72), sample_factor=10,
                                       sample_offset=9)
        s = scene[0]
        assert s["image1"].shape == (9, 72, 54, 3)
        assert s["abs_q_1_w2c_device"].shape == (9, 4)
        assert s["abs_c_1_c2w_multi"].shape == (9, 3)
        # relative pose refers to the LAST window frame
        q, t = poses["seq1/frame_00009.jpg"]
        assert np.allclose(s["T_0to1"][:3, :3], quat2mat(q), atol=1e-6)


class TestDatasetAndLoader:
    def _make_cfg(self, tmp_path):
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "MapFree"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.HEIGHT = 72
        c.DATASET.WIDTH = 54
        c.DATASET.MIN_OVERLAP_SCORE = 0.0
        c.DATASET.MAX_OVERLAP_SCORE = 1.0
        c.TRAINING.NUM_WORKERS = 2
        c.TRAINING.BATCH_SIZE = 4
        return c

    def test_concat_dataset_and_loader(self, tmp_path):
        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=12, seed=i)
        c = self._make_cfg(tmp_path)
        ds = MapFreeDataset(c, "val")
        assert len(ds) == 6  # 2 scenes x 3 subsampled queries
        loader = DataLoader(ds, batch_size=4, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["image0"].shape == (4, 72, 54, 3)
        assert b["T_0to1"].shape == (4, 4, 4)
        assert isinstance(b["scene_id"], list) and len(b["scene_id"]) == 4

    def test_getitems_matches_getitem(self, tmp_path):
        """Batch native decode path produces the same samples as per-item
        cv2 decode (decode/resize rounding aside)."""
        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=12, seed=i)
        c = self._make_cfg(tmp_path)
        ds = MapFreeDataset(c, "val")
        idx = [0, 3, 5]
        batch = ds.getitems(idx)

        def f01(x):  # batch path ships uint8; per-item path float [0,1]
            return x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x

        for sample, i in zip(batch, idx):
            ref = ds[i]
            assert sample.keys() == ref.keys()
            assert np.abs(f01(sample["image0"]) - f01(ref["image0"])).max() < 0.02
            assert np.abs(f01(sample["image1"]) - f01(ref["image1"])).max() < 0.02
            np.testing.assert_allclose(sample["T_0to1"], ref["T_0to1"])
            assert sample["pair_names"] == ref["pair_names"]

    def test_getitems_survives_cache_eviction(self, tmp_path):
        """Regression: when one batch holds >16 distinct repeated paths, the
        cross-batch decode cache used to evict entries BEFORE the final
        sample-assembly reads ran, raising KeyError (hit by the shuffled
        train loader, where repeated frames spread across many scenes). The
        fix snapshots cache hits at scan time, so assembly never re-reads
        the shared, evicting cache."""
        make_scene(tmp_path / "val" / "s00000", n_queries=90, seed=0)
        c = self._make_cfg(tmp_path)
        ds = MapFreeDataset(c, "val")
        assert len(ds) == 18
        ds.getitems([0, 0])  # caches the ref + query-0 (both repeated)
        # next batch: sample 0's paths are cache HITS at scan time, and the
        # 17 new repeated queries push the cache past its 16-entry cap —
        # evicting the hits before the old code's assembly re-read them
        idx = [0] + [i for i in range(1, 18) for _ in range(2)]
        batch = ds.getitems(idx)  # KeyError before the fix
        assert len(batch) == len(idx)
        for sample, i in zip(batch, idx):
            assert sample["pair_names"] == ds[i]["pair_names"]

    @pytest.mark.parametrize("yuv", [False, True])
    def test_getbatch_dedups_refs_and_matches_collate(self, tmp_path, yuv):
        """The batch-level fast path must agree with collate(getitems) on
        every field, with image0 factored into unique refs + gather index.

        Images are compared like-for-like per transfer format: RGB rows
        against collate(getitems) exactly; packed-YUV420 rows against a
        direct per-path native yuv420 decode exactly (the dedup/collation
        machinery must not perturb bytes in either format — the lossy
        YUV420-vs-RGB numeric bound lives in test_image_ops/test_integration).
        """
        from mapfree_tpu.data.io import decode_resize_batch
        from mapfree_tpu.data.loader import collate

        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=12, seed=i)
        c = self._make_cfg(tmp_path)
        c.TPU.YUV420_TRANSFER = yuv
        ds = MapFreeDataset(c, "val")
        idx = [0, 1, 2, 3]  # straddles both scenes (3 pairs + 1)
        fast = ds.getbatch(idx)
        assert fast is not None
        ref = collate(ds.getitems(idx))

        assert fast["image0_unique"].shape[0] == 2  # one ref per scene
        image0 = fast["image0_unique"][fast["ref_idx"]]
        if yuv:
            # oracle: the same native decoder, called per path in yuv mode
            paths = [p for ds_i, i_i in (ds._resolve(j) for j in idx)
                     for p in [ds_i.image_paths(i_i)]]
            refs = [pl[0] for pl in paths]
            queries = [pl[1] for pl in paths]
            w, h = c.DATASET.WIDTH, c.DATASET.HEIGHT
            np.testing.assert_array_equal(
                image0, decode_resize_batch(refs, w, h, uint8=True, yuv420=True))
            np.testing.assert_array_equal(
                fast["image1"],
                decode_resize_batch(queries, w, h, uint8=True, yuv420=True))
        else:
            np.testing.assert_array_equal(image0, ref["image0"])
            np.testing.assert_array_equal(fast["image1"], ref["image1"])
        np.testing.assert_allclose(fast["T_0to1"], ref["T_0to1"])
        assert fast["pair_names"] == ref["pair_names"]
        assert fast["scene_id"] == ref["scene_id"]

    def test_scene_balanced_sampler(self, tmp_path):
        make_scene(tmp_path / "train" / "a", n_queries=20, train=True, seed=0)
        make_scene(tmp_path / "train" / "b", n_queries=4, train=True, seed=1)
        c = self._make_cfg(tmp_path)
        ds = MapFreeDataset(c, "train")
        sampler = RandomConcatSampler(ds, n_samples_per_subset=10,
                                      subset_replacement=True)
        idx = list(iter(sampler))
        assert len(idx) == 20
        n_first = sum(1 for i in idx if i < ds.cumulative_sizes[0])
        assert n_first == 10  # balanced despite size imbalance

    def test_sampler_reset_on_iter(self, tmp_path):
        make_scene(tmp_path / "train" / "a", n_queries=20, train=True, seed=0)
        c = self._make_cfg(tmp_path)
        ds = MapFreeDataset(c, "train")
        sampler = RandomConcatSampler(ds, 5, True, reset_on_iter=True)
        assert list(iter(sampler)) == list(iter(sampler))
        sampler2 = RandomConcatSampler(ds, 5, True, reset_on_iter=False)
        assert list(iter(sampler2)) != list(iter(sampler2))


class TestPacking:
    """Round-trip contract of the single-buffer transfer protocol
    (utils/packing.py): byte-exact for every dtype it ships, pinning the
    little-endian bitcast semantics the device unpack relies on."""

    def test_pack_unpack_roundtrip(self):
        import jax

        from mapfree_tpu.utils.packing import pack_arrays, spec_of, unpack

        rng = np.random.default_rng(0)
        named = [
            ("ridx", rng.integers(0, 1 << 20, size=7).astype(np.int32)),
            ("img", rng.integers(0, 255, size=(2, 6, 4), dtype=np.uint8)),
            ("pts", rng.normal(size=(3, 5, 2)).astype(np.float32)),
            ("mask", rng.integers(0, 2, size=(3, 5)).astype(bool)),
            ("key", np.asarray([0, 1234], np.uint32)),
        ]
        buf = pack_arrays([a for _, a in named])
        assert buf.dtype == np.uint8
        assert buf.nbytes == sum(a.nbytes for a in dict(named).values())
        spec = spec_of(named)
        out = jax.jit(lambda b: unpack(b, spec))(buf)
        for name, a in named:
            got = np.asarray(out[name])
            assert got.dtype == a.dtype, name
            np.testing.assert_array_equal(got, a, err_msg=name)

    def test_pack_handles_noncontiguous(self):
        from mapfree_tpu.utils.packing import pack_arrays

        a = np.arange(24, dtype=np.float32).reshape(4, 6)[:, ::2]
        buf = pack_arrays([a])
        np.testing.assert_array_equal(
            buf.view(np.float32).reshape(a.shape), a)
