from mapfree_tpu.config.node import CfgNode, config_merge_from_file
from mapfree_tpu.config.default import cfg

__all__ = ["CfgNode", "cfg", "config_merge_from_file"]
