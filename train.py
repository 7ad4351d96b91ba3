"""Training CLI (reference train.py equivalent).

Single-frame:  python train.py configs/regression/mapfree/3d3d.yaml configs/mapfree.yaml
Multi-frame:   python train.py configs/regression/mapfree/multiframe/3d3d_multi.yaml \\
                   configs/mapfree.yaml configs/mapfree_multi.yaml
"""

import argparse

from mapfree_tpu.config import cfg, config_merge_from_file
from mapfree_tpu.train.fit import fit


def main(args):
    config_merge_from_file(cfg, args.dataset_config)
    config_merge_from_file(cfg, args.config)
    fit(cfg, experiment=args.experiment, resume=args.resume)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", action="append", help="path to config file")
    parser.add_argument("dataset_config", nargs="+", action="store",
                        help="path to dataset config file")
    parser.add_argument("--config", action="append", dest="config",
                        help="one more path to a config file")
    parser.add_argument("--dataset-config", "--dataset_config", action="append",
                        dest="dataset_config", help="one more dataset config file")
    parser.add_argument("--experiment", help="experiment name", default="default")
    parser.add_argument("--resume", help="resume from checkpoint tag", default=None)
    args = parser.parse_args()
    main(args)
