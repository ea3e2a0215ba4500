"""CSV audio dataset + static-shape batch loader.

Rebuild of /root/reference/customAudioDataset.py with one deliberate,
documented deviation: batches are padded/cropped to a FIXED ``tensor_cut``
length (the reference pads to the per-batch max, customAudioDataset.py:84-89)
so every training step hits the same compiled XLA program — dynamic batch
shapes would force recompiles on TPU.

Fault tolerance matches the reference: unreadable files are dropped from the
live dataset and another index is retried (customAudioDataset.py:44-47).
"""

import logging
import random
import threading
import queue as queue_mod
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from .audio_io import read_wav, resample

logger = logging.getLogger(__name__)


class CustomAudioDataset:
    """CSV-of-paths dataset (customAudioDataset.py:15-73).

    config needs: ``datasets.{train_csv_path,test_csv_path,tensor_cut,
    fixed_length}`` and ``model.{sample_rate,channels}``.
    """

    def __init__(self, config, transform=None, mode: str = 'train',
                 seed: Optional[int] = None):
        assert mode in ['train', 'test'], "dataset mode must be 'train' or 'test'"
        self.mode = mode
        if mode == 'train':
            csv_path = config.datasets.train_csv_path
        else:
            csv_path = config.datasets.test_csv_path
        self.audio_files = pd.read_csv(csv_path, on_bad_lines='skip',
                                       header=None)
        self.transform = transform
        self.fixed_length = int(config.datasets.fixed_length or 0)
        self.tensor_cut = int(config.datasets.tensor_cut or 0)
        self.sample_rate = int(config.model.sample_rate)
        self.channels = int(config.model.channels)
        self.rng = random.Random()
        # seed ≠ None keys every crop by (seed, epoch, index) instead of a
        # stateful stream, so crop positions are reproducible across process
        # restarts — what makes mid-epoch preemption resume trajectory-exact
        # (tests/test_preemption_resume.py). The trainer passes
        # config.common.seed; standalone use stays nondeterministic.
        self.seed = None if seed is None else int(seed)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def _crop_rng(self, idx: int) -> random.Random:
        if self.seed is None:
            return self.rng
        return random.Random(
            (self.seed * 1_000_003 + self.epoch) * 1_000_003 + idx)

    def __len__(self):
        if self.fixed_length and len(self.audio_files) > self.fixed_length:
            return self.fixed_length
        return len(self.audio_files)

    def _load(self, idx: int) -> np.ndarray:
        path = self.audio_files.iloc[idx, 0]
        wav, sr = read_wav(path)
        if self.channels == 1 and wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        if sr != self.sample_rate:
            wav = resample(wav, sr, self.sample_rate)
        if self.transform:
            wav = self.transform(wav)
        # mono → requested channel count (customAudioDataset.py:50-53)
        if wav.shape[0] == 1 and self.channels > 1:
            wav = np.repeat(wav, self.channels, axis=0)
        return wav.astype(np.float32)

    def __getitem__(self, idx: int) -> np.ndarray:
        """Random ``tensor_cut`` crop (customAudioDataset.py:56-73); also
        returns the waveform uncropped when tensor_cut == 0 (fixing the
        reference's fall-through returning None)."""
        while True:
            # indices are precomputed per epoch, so a mid-epoch drop leaves
            # stale out-of-range indices behind — re-wrap instead of crashing
            idx = idx % len(self.audio_files)
            path = self.audio_files.iloc[idx, 0]
            try:
                wav = self._load(idx)
                break
            except Exception as exc:  # drop unreadable file, retry another
                logger.warning("dropping unreadable file %s (%s)", path, exc)
                self.audio_files = self.audio_files.drop(idx).reset_index(drop=True)
                if not len(self.audio_files):
                    raise RuntimeError('every file in the dataset failed to '
                                       'load') from exc
                idx = self.rng.randrange(len(self.audio_files))
        if self.tensor_cut > 0 and wav.shape[1] > self.tensor_cut:
            start = self._crop_rng(idx).randrange(
                0, wav.shape[1] - self.tensor_cut)
            wav = wav[:, start:start + self.tensor_cut]
        return wav

    def get(self, idx: Optional[int] = None) -> tuple:
        """Uncropped random sample, for reconstruction demos
        (customAudioDataset.py:31-55)."""
        if idx is not None and idx >= len(self):
            raise IndexError(f"index {idx} out of range")
        if idx is None:
            idx = self.rng.randrange(len(self))
        return self._load(idx), self.sample_rate


def pad_collate(batch: Sequence[np.ndarray], length: Optional[int] = None
                ) -> np.ndarray:
    """Zero-pad a list of ``[C, T_i]`` clips into ``[B, C, L]``.

    ``length=None`` pads to the batch max (reference semantics,
    customAudioDataset.py:76-89); a fixed ``length`` yields static shapes for
    XLA (crops longer clips from the start, pads shorter ones with zeros).
    """
    if length is None:
        length = max(x.shape[1] for x in batch)
    C = batch[0].shape[0]
    out = np.zeros((len(batch), C, length), np.float32)
    for i, x in enumerate(batch):
        t = min(x.shape[1], length)
        out[i, :, :t] = x[:, :t]
    return out


class DataLoader:
    """Minimal shuffling batch loader with optional background prefetch.

    Replaces torch's DataLoader/DistributedSampler pair: under GSPMD the
    global batch is assembled on host and sharded over the mesh by the train
    step, so per-rank samplers are unnecessary on a single host; multi-host
    sharding passes distinct ``shard_id``/``num_shards``.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 fixed_length: Optional[int] = None, seed: int = 0,
                 drop_last: bool = True, shard_id: int = 0,
                 num_shards: int = 1, prefetch: int = 2,
                 transform=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.fixed_length = fixed_length
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        # applied to each collated batch *inside the prefetch thread* — the
        # trainer passes its device_put/shard here so the host→HBM copy of
        # batch N+1 is already in flight while step N computes
        # (double-buffered input pipeline; jax.device_put is async)
        self.transform = transform
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, 'set_epoch'):
            self.dataset.set_epoch(epoch)   # epoch-keyed deterministic crops

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        return idx[self.shard_id::self.num_shards]

    def __iter__(self) -> Iterator[np.ndarray]:
        def gen():
            indices = self._indices()
            nb = len(self)
            for b in range(nb):
                chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
                if not chunk or (self.drop_last and len(chunk) < self.batch_size):
                    return
                batch = [self.dataset[i] for i in chunk]
                collated = pad_collate(batch, self.fixed_length)
                yield (self.transform(collated) if self.transform is not None
                       else collated)

        if self.prefetch <= 0:
            yield from gen()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded-queue put that gives up when the consumer abandoned the
            # iterator (ADVICE r2: a blocking q.put leaked the thread — and,
            # with the device_put transform, pinned queued HBM batches — for
            # the process lifetime after an early break/exception upstream)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for item in gen():
                    if not _put(item):
                        return
            except BaseException as exc:  # re-raised on the consumer side
                error.append(exc)
            finally:
                _put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            stop.set()
            while True:  # drop any pinned (possibly device-resident) batches
                try:
                    q.get_nowait()
                except queue_mod.Empty:
                    break
            t.join(timeout=5.0)
