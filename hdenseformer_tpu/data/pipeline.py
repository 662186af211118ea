"""Host-side input pipeline: dataset, k-fold splitter, prefetching loader.

Capability-equivalent of the reference DataGenerator + torch DataLoader
(data_utils/data_loader.py:162-208, trainer.py:237-248) re-designed for a
TPU feeding model:
- Deterministic: every sample draw uses a PRNG derived from
  (seed, epoch, index) — reproducible regardless of worker scheduling
  (the torch version uses global RNG state in fork'd workers).
- Thread-pool sample decode (h5py/numpy release the GIL for IO/BLAS) with
  a double-buffered background prefetch queue, so augmentation overlaps
  device compute; the device step never waits on fresh host batches.
- Batches are channels-last numpy arrays ready for ``jax.device_put`` with
  batch-axis NamedSharding (see parallel/mesh.py).
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from hdenseformer_tpu.data.io import hdf5_reader
from hdenseformer_tpu.data.transforms import remap_roi_labels


def get_cross_validation_by_sample(
    path_list: Sequence[str],
    fold_num: int,
    current_fold: int,
    shuffle_seed: Optional[int] = None,
) -> Tuple[List[str], List[str]]:
    """Patient-prefix k-fold split (reference run.py:10-41).

    Sample ID = basename prefix before the first '_'; fold k validates the
    k-th slice of the sorted unique IDs. Returned lists are shuffled
    (deterministically when ``shuffle_seed`` is given).
    """
    sample_list = sorted(set(os.path.basename(c).split("_")[0] for c in path_list))
    _len_ = len(sample_list) // fold_num
    end_index = current_fold * _len_
    start_index = end_index - _len_
    if current_fold == fold_num:
        validation_id = sample_list[start_index:]
        train_id = sample_list[:start_index]
    else:
        validation_id = sample_list[start_index:end_index]
        train_id = sample_list[:start_index] + sample_list[end_index:]
    train_id = set(train_id)

    train_path, validation_path = [], []
    for case in path_list:
        if os.path.basename(case).split("_")[0] in train_id:
            train_path.append(case)
        else:
            validation_path.append(case)
    rng = np.random.default_rng(shuffle_seed)
    rng.shuffle(train_path)
    rng.shuffle(validation_path)
    return train_path, validation_path


class SegDataset:
    """Per-case HDF5 dataset with ROI remap + transform pipeline.

    Equivalent of reference DataGenerator (data_loader.py:162-208).
    """

    def __init__(
        self,
        path_list: Sequence[str],
        roi_number=None,
        num_class: int = 2,
        transform: Optional[Callable] = None,
        img_key: str = "ct",
        lab_key: str = "seg",
    ):
        self.path_list = list(path_list)
        self.roi_number = roi_number
        self.num_class = num_class
        self.transform = transform
        self.img_key = img_key
        self.lab_key = lab_key

    def __len__(self) -> int:
        return len(self.path_list)

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> dict:
        image = hdf5_reader(self.path_list[index], self.img_key)
        label = hdf5_reader(self.path_list[index], self.lab_key)
        label = remap_roi_labels(label, self.roi_number, self.num_class)
        sample = {"image": image, "label": label}
        if self.transform is not None:
            sample = self.transform(sample, rng or np.random.default_rng())
        return sample


class BatchLoader:
    """Deterministic shuffling batch iterator with background prefetch.

    Iterate with ``for batch in loader.epoch(epoch_idx): ...``; each batch
    is a dict of stacked channels-last float32 arrays
    {'image': (B, *sp, C), 'label': (B, *sp, num_class)}.
    """

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_one(self, epoch: int, index: int) -> dict:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, index])
        )
        return self.dataset.get(index, rng)

    def _batches(self, epoch: int):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).shuffle(order)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]
        for s in range(0, len(order), self.batch_size):
            yield order[s : s + self.batch_size]

    def epoch(self, epoch: int = 0):
        """Yield batches for one epoch, prefetched in a background thread."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx_batch in self._batches(epoch):
                        samples = list(
                            pool.map(lambda i: self._load_one(epoch, int(i)), idx_batch)
                        )
                        batch = {
                            "image": np.stack([s["image"] for s in samples]),
                            "label": np.stack([s["label"] for s in samples]),
                        }
                        q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()
