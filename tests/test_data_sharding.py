"""Multi-host data sharding: the loader's per-process sample sharding must
partition each epoch disjointly and deterministically (the reference's
DistributedSampler contract, train_multi_gpu.py:271-272), and `shard_batch`
must produce a fully-sharded global array on the mesh."""

import numpy as np

from encodec_pytorch_tpu.data.dataset import DataLoader
from encodec_pytorch_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                               shard_batch)


class _IndexDataset:
    """Returns [1, 8] arrays filled with the sample index."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((1, 8), float(i), np.float32)


def _epoch_indices(loader, epoch):
    loader.set_epoch(epoch)
    seen = []
    for batch in loader:
        seen.extend(int(v) for v in batch[:, 0, 0])
    return seen


def test_shards_disjoint_and_cover():
    ds = _IndexDataset(64)
    loaders = [DataLoader(ds, 4, shuffle=True, seed=7, shard_id=s,
                          num_shards=4, prefetch=0) for s in range(4)]
    per_shard = [_epoch_indices(ld, 3) for ld in loaders]
    assert all(len(ld) == 4 for ld in loaders)
    assert all(len(ix) == 16 for ix in per_shard)
    union = set().union(*[set(ix) for ix in per_shard])
    assert union == set(range(64))  # disjoint cover
    assert sum(len(ix) for ix in per_shard) == 64


def test_shards_deterministic_across_epochs():
    ds = _IndexDataset(40)
    a = DataLoader(ds, 5, shuffle=True, seed=3, shard_id=1, num_shards=2,
                   prefetch=0)
    b = DataLoader(ds, 5, shuffle=True, seed=3, shard_id=1, num_shards=2,
                   prefetch=0)
    assert _epoch_indices(a, 2) == _epoch_indices(b, 2)
    assert _epoch_indices(a, 2) != _epoch_indices(a, 5)  # reshuffles per epoch


def test_shard_batch_places_global_array():
    mesh = create_mesh(0)
    n = int(mesh.devices.size)
    batch = np.arange(n * 2 * 6, dtype=np.float32).reshape(n * 2, 1, 6)
    arr = shard_batch(mesh, batch)
    assert arr.shape == batch.shape
    assert arr.sharding.is_equivalent_to(batch_sharding(mesh), arr.ndim)
    np.testing.assert_array_equal(np.asarray(arr), batch)


def test_loader_transform_runs_in_prefetch_thread():
    """The `transform` hook (the trainer's device_put) applies per batch in
    the worker thread and preserves batch order/content."""
    import threading

    ds = _IndexDataset(16)
    main_thread = threading.get_ident()
    seen_threads = []

    def transform(b):
        seen_threads.append(threading.get_ident())
        return b + 100.0

    loader = DataLoader(ds, 4, shuffle=False, seed=0, prefetch=2,
                        transform=transform)
    batches = list(loader)
    assert len(batches) == 4
    np.testing.assert_array_equal(
        np.concatenate([b[:, 0, 0] for b in batches]),
        np.arange(16, dtype=np.float32) + 100.0)
    assert seen_threads and all(t != main_thread for t in seen_threads)


def test_loader_prefetch_propagates_worker_errors():
    """A dataset error inside the prefetch thread must surface to the
    consumer, not silently truncate the epoch."""
    import pytest

    from encodec_pytorch_tpu.data.dataset import DataLoader

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise RuntimeError('bad sample')
            import numpy as np
            return np.zeros((1, 100), np.float32)

    loader = DataLoader(Boom(), batch_size=2, shuffle=False,
                        fixed_length=100, prefetch=2)
    with pytest.raises(RuntimeError, match='bad sample'):
        for _ in loader:
            pass


def test_loader_prefetch_thread_exits_on_abandoned_iteration():
    """Breaking out of iteration early must unblock and terminate the
    prefetch worker (ADVICE r2: it previously blocked forever on q.put,
    leaking a thread that pinned queued device batches)."""
    import threading
    import time

    before = {t.ident for t in threading.enumerate()}
    ds = _IndexDataset(64)
    loader = DataLoader(ds, 2, shuffle=False, seed=0, prefetch=2)
    it = iter(loader)
    next(it)  # worker is now blocked on the full bounded queue
    it.close()  # abandon: GeneratorExit runs the finally → stop + drain
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f'prefetch worker leaked: {leaked}'


def test_dataset_drop_unreadable_survives_stale_indices(tmp_path):
    """A corrupt file dropped mid-epoch shrinks the live dataset; a stale
    precomputed index beyond the new length must re-wrap and load instead
    of crashing the prefetch worker (regression: the retry handler itself
    raised IndexError). All files failing must raise a clear error."""
    from types import SimpleNamespace
    from scipy.io import wavfile

    from encodec_pytorch_tpu.data.dataset import CustomAudioDataset

    paths = []
    for i in range(3):
        p = tmp_path / f'ok{i}.wav'
        wavfile.write(p, 24000,
                      (np.sin(np.arange(2400) * (i + 1) / 500.0)
                       * 32767 * 0.2).astype(np.int16))
        paths.append(str(p))
    corrupt = tmp_path / 'bad.wav'
    corrupt.write_bytes(b'not a wav at all')
    paths.append(str(corrupt))

    csv = tmp_path / 'train.csv'
    csv.write_text('\n'.join(paths) + '\n')
    config = SimpleNamespace(
        datasets=SimpleNamespace(train_csv_path=str(csv),
                                 test_csv_path=str(csv),
                                 tensor_cut=0, fixed_length=0),
        model=SimpleNamespace(sample_rate=24000, channels=1))
    ds = CustomAudioDataset(config, mode='train')
    assert len(ds) == 4

    wav = ds[3]                   # the corrupt file: drop + retry another
    assert wav.shape[0] == 1 and len(ds) == 3
    wav = ds[3]                   # stale out-of-range index: re-wrap, load
    assert wav.shape[0] == 1

    all_bad = tmp_path / 'allbad.csv'
    all_bad.write_text(str(corrupt) + '\n')
    config.datasets.train_csv_path = str(all_bad)
    ds2 = CustomAudioDataset(config, mode='train')
    import pytest
    with pytest.raises(RuntimeError, match='every file'):
        ds2[0]
