"""REAL multi-process run of the full Trainer (init → epoch → test → save):
two JAX processes × 4 virtual CPU devices form one 8-device mesh, each
process loads its disjoint dataset shard and contributes its local slice of
the global batch, and the process-0-only ownership of shared artifacts is
enforced — the reference's rank-0 gates (train_multi_gpu.py:326,348,156)
plus the mp.spawn/DistributedSampler wiring (train_multi_gpu.py:244-288),
exercised through the actual launcher env contract
(JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID — scripts/train_pod.sh).

Asserts after the run:
  * both processes finish and report the SAME generator-param checksum
    (replicated state stayed in sync through a full epoch);
  * exactly ONE checkpoint exists (process 0's);
  * process 1 logged to its own ``_p1`` file, process 0 to the unsuffixed
    one, so a shared save_folder is not interleaved;
  * the reconstruction demo (GT/Reconstruction.wav) was written once.

test_multihost_train_step.py validates the step math across processes;
this test validates the Trainer wiring around it end to end.
"""

import glob
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent('''
    import sys
    sys.path.insert(0, %r)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    pid, data_root, save_root = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from encodec_pytorch_tpu.config import load_config
    from encodec_pytorch_tpu.train.trainer import Trainer

    config = load_config('config', [
        f'datasets.train_csv_path={data_root}/train.csv',
        f'datasets.test_csv_path={data_root}/test.csv',
        'datasets.batch_size=8',
        'datasets.tensor_cut=2400',
        'common.max_epoch=1',
        'common.test_interval=1',
        'common.save_interval=1',
        'common.log_interval=1',
        'lr_scheduler.warmup_epoch=0',
        'model.n_q=2',
        'model.n_filters=4',
        'model.filters=4',
        'model.disc_n_ffts=[256,128]',
        'model.disc_hop_lengths=[64,32]',
        'model.disc_win_lengths=[256,128]',
        'model.audio_normalize=False',
        f'checkpoint.save_folder={save_root}/',
        'distributed.data_parallel=True',
        'distributed.world_size=0',
    ])
    trainer = Trainer(config)       # initialize_distributed reads the env
    assert jax.process_count() == 2, jax.process_count()
    assert trainer.n_devices == 8, trainer.n_devices
    assert trainer.is_main == (pid == 0)
    # 16 train clips / 2 shards / local_bs 4 -> 2 global batches per epoch
    assert len(trainer.trainloader) == 2, len(trainer.trainloader)
    trainer.run()
    assert int(np.asarray(trainer.state.step)) == 2

    leaves = jax.tree.leaves(jax.device_get(trainer.state.params_g))
    chk = float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))
    print('RESULT', pid, repr(chk))
''' % _repo)


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_dataset(root):
    from encodec_pytorch_tpu.data.audio_io import write_wav
    rng = np.random.RandomState(7)
    paths = []
    for i in range(24):
        t = np.linspace(0, 0.2, 4800, dtype=np.float32)
        wav = 0.4 * np.sin(2 * np.pi * (150 + 40 * i) * t) \
            + 0.05 * rng.randn(4800).astype(np.float32)
        p = root / f'clip{i}.wav'
        write_wav(p, wav[None], 24000)
        paths.append(str(p))
    (root / 'train.csv').write_text('\n'.join(paths[:16]) + '\n')
    (root / 'test.csv').write_text('\n'.join(paths[16:]) + '\n')


def test_two_process_trainer_end_to_end(tmp_path):
    data_root = tmp_path / 'wavs'
    save_root = tmp_path / 'ckpt'
    data_root.mkdir()
    _make_dataset(data_root)

    coord = f'127.0.0.1:{_free_port()}'
    base = {k: v for k, v in os.environ.items()
            if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PALLAS_AXON_POOL_IPS')}
    procs = []
    for pid in range(2):
        env = dict(base,
                   XLA_FLAGS='--xla_force_host_platform_device_count=4',
                   JAX_COORDINATOR=coord,
                   JAX_NUM_PROCESSES='2',
                   JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _CHILD, str(pid), str(data_root),
             str(save_root)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=_repo))
    outs = [p.communicate(timeout=900) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f'RESULT {pid}' in out, (
            pid, out[-1000:], err[-3000:])

    chks = []
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith('RESULT')][0]
        chks.append(float(line.split()[2]))
    assert chks[0] == chks[1], chks  # replicated state stayed in sync

    # process 0 owns the shared artifacts — exactly one checkpoint,
    # one reconstruction demo
    assert len(glob.glob(f'{save_root}/*.ckpt')) == 1
    assert os.path.exists(f'{save_root}/Reconstruction.wav')
    assert os.path.exists(f'{save_root}/GT.wav')
    # per-process log files: unsuffixed for p0, _p1 for p1
    logs = sorted(os.path.basename(p)
                  for p in glob.glob(f'{save_root}/train_encodec_*.log'))
    assert len(logs) == 2 and logs[1].endswith('_p1.log'), logs
    assert not logs[0].removesuffix('.log').endswith('_p1'), logs
