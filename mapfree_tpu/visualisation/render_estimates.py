"""Render per-scene MP4s of submission estimates vs ground truth.

CLI equivalent of reference visualisation/render_estimates.py:15-72.

Run: ``python -m mapfree_tpu.visualisation.render_estimates submission.zip
--split val --dataset_path data/mapfree -o renders/``
"""

from __future__ import annotations

import argparse
import sys
from io import TextIOWrapper
from pathlib import Path
from zipfile import ZipFile

if __package__ in (None, ""):  # invoked as a file path, not -m
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from mapfree_tpu.benchmark.utils import load_poses, subsample_poses
from mapfree_tpu.visualisation.render_scene import render_scene


def main(args):
    dataset_path = args.dataset_path / args.split
    scenes = sorted(f.name for f in dataset_path.iterdir() if f.is_dir())
    if args.scenes:
        scenes = [s for s in scenes if s in args.scenes]

    submission_zip = ZipFile(args.submission_path, "r")
    args.output.mkdir(parents=True, exist_ok=True)

    for scene in scenes:
        with (dataset_path / scene / "poses.txt").open("r", encoding="utf-8") as f:
            gt_poses = subsample_poses(load_poses(f, load_confidence=False), 5)
        try:
            with submission_zip.open(f"pose_{scene}.txt") as est_file:
                est_poses = load_poses(TextIOWrapper(est_file, encoding="utf-8"),
                                       load_confidence=True)
        except KeyError:
            print(f"skipping {scene}: no estimates in submission")
            continue

        scene_images = None
        if not args.no_images:
            from mapfree_tpu.data.io import imread_rgb

            scene_images = {}
            for frame_num in gt_poses:
                p = dataset_path / scene / "seq1" / f"frame_{frame_num:05d}.jpg"
                if p.exists():
                    scene_images[frame_num] = imread_rgb(p)

        out = args.output / f"{scene}.mp4"
        n = render_scene(gt_poses, est_poses, out,
                         confidence_threshold=args.confidence_threshold,
                         fps=args.fps, scene_images=scene_images)
        print(f"rendered {scene}: {n} frames -> {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("submission_path", type=Path)
    parser.add_argument("--dataset_path", type=Path, default=Path("data/mapfree"))
    parser.add_argument("--split", choices=("val", "test"), default="val")
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--output", "-o", type=Path, default=Path("renders"))
    parser.add_argument("--confidence_threshold", type=float, default=0.0)
    parser.add_argument("--fps", type=int, default=5)
    parser.add_argument("--no_images", action="store_true",
                        help="skip loading query photos (no textured planes "
                             "or picture-in-picture)")
    main(parser.parse_args())
