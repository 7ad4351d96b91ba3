"""Dataset + loader dispatch (reference lib/datasets/datamodules.py:11-70)."""

from __future__ import annotations

import numpy as np

from mapfree_tpu.data.loader import DataLoader
from mapfree_tpu.data.mapfree import MapFreeDataset
from mapfree_tpu.data.sampler import RandomConcatSampler
from mapfree_tpu.data.scannet import ScanNetDataset
from mapfree_tpu.data.sevenscenes import SevenScenesDataset
from mapfree_tpu.data.io import color_jitter, grayscale3

DATASETS = {
    "ScanNet": ScanNetDataset,
    "7Scenes": SevenScenesDataset,
    "MapFree": MapFreeDataset,
}


class DataModule:
    def __init__(self, cfg):
        self.cfg = cfg
        assert cfg.DATASET.DATA_SOURCE in DATASETS, (
            "invalid DATA_SOURCE, this dataset is not implemented"
        )
        self.dataset_type = DATASETS[cfg.DATASET.DATA_SOURCE]

    def get_sampler(self, dataset, reset_epoch=False):
        if self.cfg.TRAINING.SAMPLER == "scene_balance":
            return RandomConcatSampler(
                dataset,
                self.cfg.TRAINING.N_SAMPLES_SCENE,
                self.cfg.TRAINING.SAMPLE_WITH_REPLACEMENT,
                shuffle=True,
                reset_on_iter=reset_epoch,
            )
        return None

    def _transforms(self):
        if bool(self.cfg.TPU.DEVICE_AUGMENT):
            # augmentation runs in-graph on device (data/augment.py), so the
            # loader keeps the uint8 batch-decode path (4x cheaper H2D)
            return None
        if self.cfg.DATASET.BLACK_WHITE:
            return grayscale3
        if self.cfg.DATASET.AUGMENTATION_TYPE == "colorjitter":
            return color_jitter(np.random.default_rng(0))
        return None

    def train_dataloader(self) -> DataLoader:
        dataset = self.dataset_type(self.cfg, "train", transforms=self._transforms())
        if (bool(self.cfg.TPU.DEVICE_AUGMENT)
                and hasattr(dataset, "yuv420_getitems")):
            # the train step unpacks YUV in-graph (augment/_to_float01), so
            # the loader can ship half the bytes; the source JPEGs are
            # already 4:2:0-subsampled so the extra loss is the resize
            # round trip only
            dataset.yuv420_getitems = bool(self.cfg.TPU.YUV420_TRANSFER)
        sampler = self.get_sampler(dataset)
        return DataLoader(
            dataset,
            batch_size=self.cfg.TRAINING.BATCH_SIZE,
            num_workers=self.cfg.TRAINING.NUM_WORKERS or 1,
            sampler=sampler,
            shuffle=sampler is None,
        )

    def val_dataloader(self) -> DataLoader:
        dataset = self.dataset_type(self.cfg, "val")
        # ScanNet uses a per-epoch-reset scene-balance sampler for val
        sampler = (
            self.get_sampler(dataset, reset_epoch=True)
            if isinstance(dataset, ScanNetDataset)
            else None
        )
        return DataLoader(
            dataset,
            batch_size=self.cfg.TRAINING.BATCH_SIZE,
            num_workers=self.cfg.TRAINING.NUM_WORKERS or 1,
            sampler=sampler,
            drop_last=True,
        )

    def test_dataloader(self, batch_size: int = 1,
                        unique_refs: bool = False) -> DataLoader:
        dataset = self.dataset_type(self.cfg, "test")
        return DataLoader(dataset, batch_size=batch_size, num_workers=1,
                          shuffle=False, unique_refs=unique_refs)
