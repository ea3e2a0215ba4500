"""REAL multi-process SPMD GAN train step (the strongest in-sandbox stand-in
for a pod run, reference train_multi_gpu.py:244-266): two JAX processes ×
4 virtual CPU devices each form one 8-device global mesh and run TWO jitted
train steps end to end — replicated state assembled across processes,
per-process local batch shards stitched into the global batch
(``shard_batch`` → ``make_array_from_process_local_data``), GSPMD
collectives riding the distributed runtime, optimizer + RVQ EMA updates
applied globally.

The resulting losses and a generator-parameter checksum must agree across
both processes AND with an independent single-process 8-device run of the
identical program — multi-host execution is semantically invisible.

This extends test_multihost_sim.py (data path only) to the full training
step — the closest validation to reference train_multi_gpu.py's DDP loop
this one-chip environment admits."""

import os
import socket
import subprocess
import sys
import textwrap

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mode 'dist': argv = dist <pid> <coord>; mode 'single': argv = single
_CHILD = textwrap.dedent('''
    import sys
    sys.path.insert(0, %r)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import jax.numpy as jnp

    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.parallel.mesh import (
        batch_sharding, create_mesh, initialize_distributed,
        replicated_sharding, shard_batch)
    from encodec_pytorch_tpu.train.balancer import Balancer
    from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule
    from encodec_pytorch_tpu.train.step import (build_train_step,
                                                init_train_state)

    mode = sys.argv[1]
    if mode == 'dist':
        pid, coord = int(sys.argv[2]), sys.argv[3]
        initialize_distributed(coordinator_address=coord, num_processes=2,
                               process_id=pid)
        assert jax.process_count() == 2
    else:
        pid = 0
    mesh = create_mesh(0)
    n_global = int(mesh.devices.size)
    assert n_global == 8, n_global

    length = 960
    model = EncodecModel._get_model(
        [1.5], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=2)
    disc = MultiScaleSTFTDiscriminator(
        filters=2, n_ffts=(128, 64), hop_lengths=(32, 16),
        win_lengths=(128, 64))
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=5, warmup_ratio=1e-4)
    step_fn = build_train_step(model, disc, balancer, sched, sched,
                               disc_prob=1.0, sample_rate=24000)

    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=length)
    repl = replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    jitted = jax.jit(step_fn,
                     in_shardings=(repl, batch_sharding(mesh), repl, repl),
                     out_shardings=(repl, repl))
    rng = jax.device_put(jax.random.PRNGKey(1), repl)
    allowed = jax.device_put(jnp.asarray(True), repl)

    losses = []
    for step in range(2):
        # every process knows the full global batch; each contributes only
        # its local slice (the DistributedSampler analogue)
        gb = np.random.RandomState(10 + step).randn(
            8, 1, length).astype(np.float32) * 0.1
        local = gb[pid * 4:(pid + 1) * 4] if mode == 'dist' else gb
        batch = shard_batch(mesh, local)
        state, metrics = jitted(state, batch, rng, allowed)
        losses.append(float(jax.device_get(metrics['loss_g'])))
    assert int(jax.device_get(state.step)) == 2

    # generator-params checksum: identical across processes and vs the
    # single-process run iff the distributed update was correct
    leaves = jax.tree.leaves(jax.device_get(state.params_g))
    chk = float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))
    print('RESULT', pid, repr(losses[0]), repr(losses[1]), repr(chk))
''' % _repo)


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out):
    for line in out.splitlines():
        if line.startswith('RESULT'):
            toks = line.split()
            return [float(t) for t in toks[2:]]
    raise AssertionError(f'no RESULT line in: {out[-1000:]}')


def test_two_process_train_step_matches_single_process():
    coord = f'127.0.0.1:{_free_port()}'
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PALLAS_AXON_POOL_IPS')}

    env4 = dict(env, XLA_FLAGS='--xla_force_host_platform_device_count=4')
    env8 = dict(env, XLA_FLAGS='--xla_force_host_platform_device_count=8')
    procs = [subprocess.Popen(
        [sys.executable, '-c', _CHILD, 'dist', str(pid), coord], env=env4,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=_repo) for pid in range(2)]
    procs.append(subprocess.Popen(
        [sys.executable, '-c', _CHILD, 'single'], env=env8,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=_repo))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-1000:], err[-3000:])

    r0, r1, rs = (_parse(out) for out, _ in outs)
    # the two distributed processes see the SAME global computation
    assert r0 == r1, (r0, r1)
    # and it matches the single-process 8-device run (reduction-order slack)
    for a, b in zip(r0, rs):
        assert abs(a - b) <= 2e-4 * max(1.0, abs(b)), (r0, rs)
