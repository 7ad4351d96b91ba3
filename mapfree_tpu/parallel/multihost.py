"""Multi-host (pod-scale) scene-sharded evaluation.

SURVEY.md §2.8: the reference has no distributed backend at all (train.py:53
pins one GPU); the TPU-native equivalent for the inference sweep is *data
parallelism over scenes across hosts* — each host runs the normal batched
sweep over its shard of the scene list on its local chips (ICI), writes a
per-host partial submission, and host 0 merges. No collectives are needed:
scenes are embarrassingly parallel and only the merge step touches DCN (a
shared filesystem).

Everything is injectable (n_hosts / host_id default to
jax.process_count()/process_index()) so a single process can dry-run an
N-host sweep and byte-compare the merged result against a single-host run —
the multihost path is testable without a pod.
"""

from __future__ import annotations

from pathlib import Path
from zipfile import ZipFile


def shard_scenes(scenes, n_hosts: int, host_id: int) -> list:
    """Deterministic contiguous-balanced split of the sorted scene list.

    Every host computes the same global assignment (sorted scenes,
    round-robin) so no coordination is required.
    """
    assert 0 <= host_id < n_hosts, (host_id, n_hosts)
    ordered = sorted(scenes)
    return ordered[host_id::n_hosts]


def partial_submission_path(out_root: Path, host_id: int) -> Path:
    return Path(out_root) / f"submission.part{host_id:03d}.zip"


def merge_submissions(part_paths, out_path: Path) -> None:
    """Merge per-host partial submission zips into one leaderboard zip.

    Scene files are written in sorted order so the merged zip is
    byte-identical regardless of host count (the dryrun equivalence test
    relies on this). Duplicate scene files across parts are an error — the
    sharding is disjoint by construction.
    """
    entries = {}
    for part in part_paths:
        with ZipFile(part, "r") as z:
            for name in z.namelist():
                assert name not in entries, f"scene {name} in multiple shards"
                entries[name] = z.read(name)
    with ZipFile(out_path, "w") as z:
        for name in sorted(entries):
            z.writestr(name, entries[name])


def host_topology(n_hosts=None, host_id=None):
    """Resolve (n_hosts, host_id) from jax's process topology unless
    explicitly injected (tests / dryruns)."""
    if n_hosts is None or host_id is None:
        import jax

        n_hosts = jax.process_count() if n_hosts is None else n_hosts
        host_id = jax.process_index() if host_id is None else host_id
    return int(n_hosts), int(host_id)


def list_split_scenes(cfg, split: str) -> list:
    """Scene names of a dataset split (the sweep's unit of sharding)."""
    root = Path(cfg.DATASET.DATA_ROOT) / split
    scenes = cfg.DATASET.SCENES
    if scenes:
        return [s for s in scenes if (root / s).exists()]
    return sorted(p.name for p in root.iterdir() if p.is_dir())


def run_sharded_sweep(cfg, split: str, out_root, model=None,
                      n_hosts=None, host_id=None, barrier=None):
    """One host's share of the eval sweep -> partial zip; host 0 merges.

    Args:
        cfg: merged config (DATASET.SCENES is overridden per shard).
        split: 'val' | 'test'.
        out_root: output directory (shared filesystem across hosts).
        model: optional prebuilt model (else build_model(cfg)).
        n_hosts, host_id: topology injection for dryruns.
        barrier: optional callable invoked after the partial write and before
            the merge; on a real pod pass
            jax.experimental.multihost_utils.sync_global_devices.
    Returns the merged submission path on host 0, else the partial path.
    """
    from mapfree_tpu.data import DataLoader
    from mapfree_tpu.data.datamodule import DataModule
    from mapfree_tpu.models.builder import build_model
    from mapfree_tpu.utils.submission import predict, save_submission

    n_hosts, host_id = host_topology(n_hosts, host_id)
    out_root = Path(out_root)
    out_root.mkdir(parents=True, exist_ok=True)

    shard_cfg = cfg.clone()
    shard = shard_scenes(list_split_scenes(cfg, split), n_hosts, host_id)
    shard_cfg.DATASET.SCENES = shard

    part = partial_submission_path(out_root, host_id)
    if shard:
        dm = DataModule(shard_cfg)
        dataset = dm.dataset_type(shard_cfg, split)
        loader = DataLoader(
            dataset,
            batch_size=int(shard_cfg.TPU.INFER_BATCH),
            num_workers=shard_cfg.TRAINING.NUM_WORKERS or 2,
            unique_refs=(shard_cfg.MODEL == "Regression"
                         and int(shard_cfg.TPU.UNIQUE_REFS) > 0),
        )
        if model is None:
            model = build_model(shard_cfg)
        results = predict(loader, model)
    else:  # more hosts than scenes: an empty but valid partial
        results = {}
    save_submission(results, part)

    if barrier is not None:
        barrier("mapfree_sharded_sweep")
    if host_id != 0:
        return part

    parts = [partial_submission_path(out_root, h) for h in range(n_hosts)]
    merged = out_root / "submission.zip"
    merge_submissions(parts, merged)
    return merged
