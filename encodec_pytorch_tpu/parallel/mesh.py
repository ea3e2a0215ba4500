"""Data-parallel device mesh over ICI/DCN.

This replaces the reference's entire NCCL layer (distrib.py, DDP wrapping,
`mp.spawn` launcher — SURVEY.md §2.9): training is ONE SPMD program compiled
by XLA over a `jax.sharding.Mesh`. Parameters and optimizer/codebook state
are replicated; the batch is sharded on the ``data`` axis; gradient psums,
balancer-norm means and RVQ EMA statistics become XLA collectives riding ICI
(intra-slice) / DCN (multi-slice) automatically under GSPMD — there is no
hand-written transport, and the reference's disabled codebook broadcast
(core_vq.py:157) is fixed by construction.

The mesh is 1-D ``('data',)`` because EnCodec is ~15 M params — pure DP is
the right scale (SURVEY.md §2.9); the helpers still accept extra axes so a
model-parallel dimension can be added without touching the train step.
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (the reference's init_process_group analogue,
    train_multi_gpu.py:244-266). No-op for single-process runs; env-driven
    otherwise: explicit ``JAX_COORDINATOR``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` (the launcher contract, scripts/train.sbatch /
    train_pod.sh) take precedence, else jax auto-detects from SLURM env or
    TPU pod metadata."""
    if num_processes is None and os.environ.get('JAX_NUM_PROCESSES'):
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and os.environ.get('JAX_PROCESS_ID'):
        process_id = int(os.environ['JAX_PROCESS_ID'])
    coordinator_address = coordinator_address or os.environ.get('JAX_COORDINATOR')
    if coordinator_address == 'auto':  # TPU-pod metadata discovery
        coordinator_address = None
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address or os.environ.get('JAX_COORDINATOR'):
        jax.distributed.initialize()


def create_mesh(num_devices: int = 0, axis_names: Sequence[str] = ('data',),
                devices=None) -> Mesh:
    """1-D (default) mesh over the first ``num_devices`` devices
    (0 = all visible)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = 'data'):
    """Place a host batch as a global array sharded over the mesh.

    Single-process: a plain sharded ``device_put`` of the full global batch.
    Multi-host: ``batch`` is this process's LOCAL slice (the loader shards
    samples per process, the DistributedSampler analogue) and the global
    array is assembled across hosts — each process contributes only the
    shards that live on its addressable devices.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def assert_replicated(tree, atol: float = 0.0, sample_leaves: int = 4):
    """Fail fast if nominally-replicated state diverged across devices.

    The reference's analogue is `_check_number_of_params` (distrib.py:41-52),
    which only catches param-count mismatches; under GSPMD divergence should
    be impossible, so this is a debugging guard (e.g. after manual
    device_puts). Checks a few leaves' per-device buffers for equality.
    """
    import numpy as np
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, 'addressable_shards')]
    for leaf in leaves[:sample_leaves]:
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.allclose(ref, np.asarray(s.data), atol=atol, rtol=0):
                raise AssertionError(
                    f"replicated state diverged across devices "
                    f"(device {s.device} differs)")
