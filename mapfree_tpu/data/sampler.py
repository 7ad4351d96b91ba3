"""Scene-balanced random sampler.

Behavioural equivalent of reference lib/datasets/sampler.py:6-86
(RandomConcatSampler, LoFTR-style): per epoch, n_samples_per_subset indices
are drawn from each sub-dataset (with or without replacement), concatenated
and shuffled. Seeded with its own generator (seed 66) independent of the
global seed; ``reset_on_iter`` re-seeds each epoch so validation samples are
identical across epochs (reference sampler.py:29, 50-51).

Uses numpy's Generator rather than torch's; the *semantics* (per-scene
balance, replacement policy, epoch determinism) are identical, the exact
index streams differ.
"""

from __future__ import annotations

import numpy as np


class RandomConcatSampler:
    def __init__(self, data_source, n_samples_per_subset: int,
                 subset_replacement: bool = True, shuffle: bool = True,
                 repeat: int = 1, seed: int = 66, reset_on_iter: bool = False):
        self.data_source = data_source
        self.n_subset = len(data_source.datasets)
        self.n_samples_per_subset = n_samples_per_subset
        self.n_samples = self.n_subset * n_samples_per_subset * repeat
        self.subset_replacement = subset_replacement
        self.repeat = repeat
        self.shuffle = shuffle
        self.seed = seed
        self.reset_on_iter = reset_on_iter
        self.generator = np.random.default_rng(seed)
        assert self.repeat >= 1

    def __len__(self):
        return self.n_samples

    def __iter__(self):
        if self.reset_on_iter:
            self.generator = np.random.default_rng(self.seed)
        rng = self.generator

        indices = []
        for d_idx in range(self.n_subset):
            low = 0 if d_idx == 0 else self.data_source.cumulative_sizes[d_idx - 1]
            high = self.data_source.cumulative_sizes[d_idx]
            if self.subset_replacement:
                chosen = rng.integers(low, high, size=self.n_samples_per_subset)
            else:
                len_subset = high - low
                perm = rng.permutation(len_subset) + low
                if len_subset >= self.n_samples_per_subset:
                    chosen = perm[: self.n_samples_per_subset]
                else:
                    pad = rng.integers(
                        low, high, size=self.n_samples_per_subset - len_subset
                    )
                    chosen = np.concatenate([perm, pad])
            indices.append(chosen)
        indices = np.concatenate(indices)
        if self.shuffle:
            indices = indices[rng.permutation(len(indices))]
        if self.repeat > 1:
            reps = [indices.copy() for _ in range(self.repeat - 1)]
            if self.shuffle:
                reps = [r[rng.permutation(len(r))] for r in reps]
            indices = np.concatenate([indices, *reps])
        assert indices.shape[0] == self.n_samples
        return iter(indices.tolist())
