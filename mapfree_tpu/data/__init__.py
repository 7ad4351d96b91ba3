from mapfree_tpu.data.datamodule import DataModule
from mapfree_tpu.data.loader import DataLoader, collate
from mapfree_tpu.data.mapfree import ConcatDataset, MapFreeDataset, MapFreeScene
from mapfree_tpu.data.sampler import RandomConcatSampler
from mapfree_tpu.data.scannet import ScanNetDataset
from mapfree_tpu.data.sevenscenes import SevenScenesDataset
