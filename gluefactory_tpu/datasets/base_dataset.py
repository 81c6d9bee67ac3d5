"""BaseDataset + host data loader
(reference `gluefactory/datasets/base_dataset.py:25-210`).

TPU-native redesign of the torch DataLoader stack:
  - Datasets are plain map-style objects (`__len__`/`__getitem__`) producing
    nested dicts of numpy arrays (and Pose/Camera pytrees).
  - `Loader` is a thread-pool prefetching loader (cv2/h5py release the GIL);
    it collates to fixed-shape stacked numpy batches, drops the last partial
    batch (static shapes!), reshuffles each epoch with a per-epoch seed, and
    shards items across JAX processes for multi-host training (the
    DistributedSampler analog, reference `base_dataset.py:168`).
  - `overfit` mode loops one batch forever (reference `base_dataset.py:188`).
"""

from __future__ import annotations

import queue
import threading
from abc import ABCMeta, abstractmethod

import numpy as np

from ..core.config import Config
from ..utils.tools import set_seed


def collate(samples: list):
    """Stack a list of nested dict samples into one batch (numpy)."""
    elem = samples[0]
    if isinstance(elem, dict):
        return {k: collate([s[k] for s in samples]) for k in elem}
    if isinstance(elem, (str, bytes)):
        return list(samples)
    if isinstance(elem, np.ndarray):
        return np.stack(samples)
    if isinstance(elem, (int, np.integer)):
        return np.asarray(samples, np.int64)
    if isinstance(elem, (float, np.floating)):
        return np.asarray(samples, np.float32)
    if isinstance(elem, bool):
        return np.asarray(samples)
    if hasattr(elem, "replace") and hasattr(elem, "__dataclass_fields__"):
        # flax.struct dataclasses (Pose/Camera): stack leaf-wise
        import jax

        return jax.tree.map(lambda *xs: np.stack(xs), *samples)
    if elem is None:
        return None
    return list(samples)


class Loader:
    """Thread-prefetching batch loader over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 2,
        seed: int = 0,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # shard across hosts: contiguous-strided split keeps coverage balanced
        idx = idx[self.process_index :: self.process_count]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = self._indices()
        nb = len(self)
        batches = [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        if self.num_workers <= 1:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(lambda i: self.dataset[int(i)], b))
                        out_q.put(collate(samples))
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class LoopLoader:
    """Yield the same batch forever (overfit mode,
    reference `base_dataset.py:188-210`)."""

    def __init__(self, loader: Loader, num_batches: int = 1):
        it = iter(loader)
        self.batches = [next(it) for _ in range(num_batches)]
        self.batch_size = loader.batch_size

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        while True:
            yield from self.batches


class BaseDataset(metaclass=ABCMeta):
    """Conf-merged dataset ABC (reference `base_dataset.py:100-155`)."""

    base_default_conf = {
        "name": "???",
        "num_workers": 2,
        "train_batch_size": "???",
        "val_batch_size": "???",
        "test_batch_size": 1,
        "batch_size": 1,
        "shuffle_training": True,
        "seed": 0,
        "prefetch": 2,
    }
    default_conf = {}

    def __init__(self, conf=None):
        merged = Config(self.base_default_conf)
        # accumulate subclass defaults over the MRO
        for klass in reversed(type(self).__mro__):
            dc = klass.__dict__.get("default_conf")
            if dc:
                merged.merge_(dc)
        if conf:
            merged.merge_(conf)
        # batch-size fallbacks
        for split in ("train", "val", "test"):
            if merged.get(f"{split}_batch_size") in (None, "???"):
                merged._data[f"{split}_batch_size"] = merged.get("batch_size", 1)
        merged.set_readonly(True)
        self.conf = merged
        set_seed(merged.get("seed", 0))
        self._init(merged)

    @abstractmethod
    def _init(self, conf):
        raise NotImplementedError

    @abstractmethod
    def get_dataset(self, split: str):
        """Return a map-style dataset for 'train'/'val'/'test'."""
        raise NotImplementedError

    def get_data_loader(self, split: str, shuffle: bool | None = None, distributed: bool = False):
        import jax

        ds = self.get_dataset(split)
        if shuffle is None:
            shuffle = split == "train" and self.conf.get("shuffle_training", True)
        return Loader(
            ds,
            batch_size=self.conf.get(f"{split}_batch_size", 1),
            shuffle=shuffle,
            num_workers=self.conf.get("num_workers", 2),
            seed=self.conf.get("seed", 0),
            process_index=jax.process_index() if distributed else 0,
            process_count=jax.process_count() if distributed else 1,
            prefetch=self.conf.get("prefetch", 2),
        )

    def get_overfit_loader(self, split: str = "train"):
        return LoopLoader(self.get_data_loader(split, shuffle=False))
