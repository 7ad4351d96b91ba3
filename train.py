"""Training CLI (reference train.py equivalent).

Single-frame:  python train.py configs/regression/mapfree/3d3d.yaml configs/mapfree.yaml
Multi-frame:   python train.py configs/regression/mapfree/multiframe/3d3d_multi.yaml \\
                   configs/mapfree.yaml configs/mapfree_multi.yaml

Merge order is deterministic and printed at startup: dataset configs first
(in the order given), then the model config(s) — later files override
earlier, so the model config wins (same semantics as the reference CLI,
reference train.py:84-92, but without its dual positional/optional argument
overlay, which silently reordered merges on unusual invocations).
"""

import argparse
from pathlib import Path

from mapfree_tpu.config import cfg, config_merge_from_file
from mapfree_tpu.train.fit import fit


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument(
        "config", help="model config yaml (merged last: overrides dataset configs)")
    parser.add_argument(
        "dataset_config", nargs="+",
        help="dataset config yaml(s), merged first in the order given")
    parser.add_argument(
        "--config", dest="extra_config", action="append", default=[],
        metavar="YAML", help="additional model config, merged after the "
        "positional one (repeatable; later overrides earlier)")
    parser.add_argument(
        "--dataset-config", "--dataset_config", dest="extra_dataset_config",
        action="append", default=[], metavar="YAML",
        help="additional dataset config, merged after the positional ones")
    parser.add_argument("--experiment", help="experiment name", default="default")
    parser.add_argument("--resume", help="resume from checkpoint tag", default=None)
    args = parser.parse_args(argv)

    args.merge_order = (
        list(args.dataset_config) + list(args.extra_dataset_config)
        + [args.config] + list(args.extra_config)
    )
    missing = [p for p in args.merge_order if not Path(p).is_file()]
    if missing:
        parser.error("config file(s) not found: " + ", ".join(missing))
    return args


def main(args):
    print("config merge order (later overrides earlier): "
          + " -> ".join(args.merge_order))
    for path in args.merge_order:
        config_merge_from_file(cfg, path)
    fit(cfg, experiment=args.experiment, resume=args.resume)


if __name__ == "__main__":
    main(parse_args())
