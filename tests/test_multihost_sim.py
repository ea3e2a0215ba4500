"""Multi-host data path, actually multi-process: two JAX processes on one
machine (CPU backend, jax.distributed over localhost) each load their
DataLoader shard and contribute process-local data to the global batch via
``shard_batch`` → a psum-reduced global mean must equal the host-side mean
of the FULL dataset batch on both processes.

This covers what the 8-virtual-device single-process tests cannot: the
``jax.make_array_from_process_local_data`` path in ``shard_batch`` and the
disjoint per-process loader sharding the Trainer wires up
(VERDICT.md round-1 Weak #2)."""

import os
import socket
import subprocess
import sys
import textwrap

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent('''
    import os, sys
    sys.path.insert(0, %r)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    from encodec_pytorch_tpu.data.dataset import DataLoader
    from encodec_pytorch_tpu.parallel.mesh import (create_mesh,
        initialize_distributed, shard_batch)

    pid = int(sys.argv[1]); coord = sys.argv[2]
    initialize_distributed(coordinator_address=coord, num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    mesh = create_mesh(0)
    n_global = int(mesh.devices.size)

    class DS:
        def __len__(self): return 16
        def __getitem__(self, i):
            return np.full((1, 8), float(i), np.float32)

    global_bs = 8
    loader = DataLoader(DS(), global_bs // 2, shuffle=True, seed=5,
                        shard_id=jax.process_index(), num_shards=2,
                        prefetch=0)
    loader.set_epoch(1)
    local = next(iter(loader))
    arr = shard_batch(mesh, local)
    assert arr.shape[0] == global_bs, arr.shape
    got = float(jax.jit(lambda a: a.mean())(arr))

    # host-side truth: both processes recompute the full shuffled batch
    import random
    idx = list(range(16)); random.Random(5 + 1).shuffle(idx)
    first_batch = idx[0::2][:global_bs // 2] + idx[1::2][:global_bs // 2]
    want = float(np.mean(first_batch))
    assert abs(got - want) < 1e-6, (got, want)
    print(f'PROC{pid}_OK', got)
''' % _repo)


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_batch_and_loader():
    port = _free_port()
    coord = f'127.0.0.1:{port}'
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PALLAS_AXON_POOL_IPS')}
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    procs = [subprocess.Popen(
        [sys.executable, '-c', _CHILD, str(pid), coord], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=_repo) for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f'PROC{pid}_OK' in out, (
            pid, out[-1000:], err[-3000:])
