"""Batched host-side data loading with prefetch.

The TPU replacement for torch DataLoader (reference
lib/datasets/datamodules.py:35-70): a thread pool decodes/loads samples, a
collator stacks them into fixed-shape NHWC numpy batches, and a small prefetch
queue overlaps host IO with device compute. Numeric fields are stacked;
string/metadata fields are collected into lists (same contract the reference
gets from torch's default collate).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_NUMERIC_KEYS = {
    "image0", "image1", "T_0to1",
    "abs_q_0", "abs_c_0", "abs_q_1", "abs_c_1",
    "K_color0", "K_color1", "sim", "pair_id",
    "abs_q_1_w2c_device", "abs_q_1_c2w_device", "abs_c_1_c2w_device",
    "abs_q_1_c2w_multi", "abs_c_1_c2w_multi",
    # depth0/depth1 deliberately NOT here: the matching track only samples
    # depth AT correspondences, and np.stack of ~50 MB of maps per batch
    # was the 1-core host's single biggest collate cost — consumers accept
    # the uncollated per-sample list (FeatureMatchingModel._gather_depth_host)
}


def collate(samples: list) -> dict:
    """Stack numeric fields to [B, ...] arrays; gather metadata into lists."""
    batch = {}
    for key in samples[0].keys():
        vals = [s[key] for s in samples]
        if key in _NUMERIC_KEYS:
            batch[key] = np.stack([np.asarray(v) for v in vals])
        else:
            batch[key] = list(vals)
    return batch


class DataLoader:
    """Iterates fixed-size batches over a dataset given an index sampler."""

    def __init__(self, dataset, batch_size: int, sampler=None, shuffle: bool = False,
                 num_workers: int = 1, drop_last: bool = False, prefetch: int = 2,
                 seed: int = 0, times=None, unique_refs: bool = False):
        from mapfree_tpu.utils.timing import NULL_TIMES

        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self.times = times or NULL_TIMES
        # emit image0_unique/ref_idx batches (dataset.getbatch) for consumers
        # that gather the deduped reference frames on-device
        self.unique_refs = unique_refs

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = self._rng.permutation(idx)
        return idx.tolist()

    def __len__(self):
        n = len(self._indices()) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i: i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        # batch-level native JPEG decode when the dataset speaks the protocol
        # and the C++ decoder is built (one GIL-released call per batch beats
        # per-image cv2 across GIL-bound threads); else per-item thread pool
        from mapfree_tpu.data.io import HAS_NATIVE_DECODER

        getitems = getattr(self.dataset, "getitems", None)
        use_batch_io = HAS_NATIVE_DECODER and getitems is not None
        getbatch = getattr(self.dataset, "getbatch", None)
        use_getbatch = (
            self.unique_refs and HAS_NATIVE_DECODER and getbatch is not None
        )

        times = self.times

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                for b in batches:
                    item = None
                    if use_getbatch:
                        with times.stage("decode"):
                            item = getbatch(b)
                    if item is None:
                        with times.stage("decode"):
                            if use_batch_io:
                                samples = getitems(b)
                            else:
                                samples = list(
                                    ex.map(self.dataset.__getitem__, b))
                        with times.stage("collate"):
                            item = collate(samples)
                    with times.stage("queue_put"):  # backpressure wait
                        q.put(item)
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
