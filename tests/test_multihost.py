"""Multi-host scene-sharded eval dryrun (VERDICT r1 item 8 / SURVEY §2.8).

Simulates an N-host pod in one process by injecting (n_hosts, host_id) into
run_sharded_sweep and proves the merged submission is byte-identical to the
single-host sweep — the property that makes pod-scale eval safe to deploy.
"""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from fixtures import make_scene
from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.parallel import merge_submissions, run_sharded_sweep, shard_scenes


def test_shard_scenes_partition():
    scenes = [f"s{i:03d}" for i in range(11)]
    for n in (1, 2, 3, 8, 16):
        shards = [shard_scenes(scenes, n, h) for h in range(n)]
        flat = sorted(x for s in shards for x in s)
        assert flat == sorted(scenes)  # disjoint cover
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1  # balanced


def test_merge_rejects_duplicate_scene(tmp_path):
    for i in (0, 1):
        with zipfile.ZipFile(tmp_path / f"p{i}.zip", "w") as z:
            z.writestr("pose_sA.txt", b"x")
    with pytest.raises(AssertionError):
        merge_submissions([tmp_path / "p0.zip", tmp_path / "p1.zip"],
                          tmp_path / "out.zip")


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhscenes")
    for i in range(5):
        make_scene(root / "val" / f"s{i:05d}", n_queries=10, img_hw=(48, 36),
                   seed=i, max_angle=0.3, t_scale=0.2)
    return root


def _cfg(scene_root):
    c = default_cfg.clone()
    c.merge_from_file("configs/mapfree.yaml")
    c.merge_from_file("configs/regression/mapfree/3d3d.yaml")
    c.DATASET.DATA_ROOT = str(scene_root)
    c.DATASET.HEIGHT = 48
    c.DATASET.WIDTH = 36
    c.ENCODER.NUM_BLOCKS = "1-1-1"
    c.ENCODER.NUM_OUT_LAYERS = 8
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.FUSED_CORRELATION = False
    c.TPU.INFER_BATCH = 4
    c.TRAINING.NUM_WORKERS = 1
    return c


def _zip_bytes(path):
    with zipfile.ZipFile(path) as z:
        return {n: z.read(n) for n in sorted(z.namelist())}


def test_sharded_sweep_matches_single_host(scene_root, tmp_path):
    """3-host dryrun == 1-host sweep, byte for byte. The model is built once
    and shared so every 'host' runs identical weights (as a checkpoint
    restore would guarantee on a real pod)."""
    from mapfree_tpu.models.builder import build_model

    cfg = _cfg(scene_root)
    model = build_model(cfg)

    single = run_sharded_sweep(cfg, "val", tmp_path / "single", model=model,
                               n_hosts=1, host_id=0)

    barrier_calls = []
    # sequential dryrun: host 0 merges, so it must run after the others (on a
    # real pod the barrier provides this ordering)
    for host in (1, 2, 0):
        out = run_sharded_sweep(
            cfg, "val", tmp_path / "multi", model=model,
            n_hosts=3, host_id=host,
            barrier=lambda tag: barrier_calls.append(tag),
        )
    assert out.name == "submission.zip"  # host 0 returned the merged zip
    merged = tmp_path / "multi" / "submission.zip"
    assert len(barrier_calls) == 3

    a, b = _zip_bytes(single), _zip_bytes(merged)
    assert a.keys() == b.keys()
    assert a == b  # identical pose bytes per scene


def test_more_hosts_than_scenes(scene_root, tmp_path):
    from mapfree_tpu.models.builder import build_model

    cfg = _cfg(scene_root)
    cfg.DATASET.SCENES = ["s00000", "s00001"]
    model = build_model(cfg)
    for host in (1, 2, 3, 0):
        run_sharded_sweep(cfg, "val", tmp_path / "m", model=model,
                          n_hosts=4, host_id=host)
    merged = _zip_bytes(tmp_path / "m" / "submission.zip")
    assert sorted(merged) == ["pose_s00000.txt", "pose_s00001.txt"]
