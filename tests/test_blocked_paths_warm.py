"""Keep the environment-blocked validation paths warm (VERDICT r2 item 8):

- `scripts/parity_eval.py --checkpoint <released-style .th>` must run
  unmodified the moment the real LibriTTS960h weights appear — exercised here
  with a seeded released-style checkpoint whose filename carries a REAL
  sha256 prefix (so the factory's checksum verification runs, reference
  model.py:278-289).
- The pod/Slurm launchers' embedded train_cli invocations must keep parsing
  against the shipped configs, and the multi-host init surface they rely on
  must exist.
"""

import hashlib
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPTS = os.path.join(_REPO, 'scripts')


def _import_parity_eval():
    if _SCRIPTS not in sys.path:
        sys.path.insert(0, _SCRIPTS)
    import parity_eval
    return parity_eval


def test_parity_eval_dry_run_released_style_checkpoint(tmp_path, capsys):
    """The exact invocation shape of the real-weights run:
    ``parity_eval.py --checkpoint encodec_24khz-<sha8>.th --dry-run`` —
    flat released state dict, checksum-bearing filename, conversion, both
    roundtrips, metric table, tolerance assertions."""
    parity_eval = _import_parity_eval()

    raw = tmp_path / 'raw.th'
    parity_eval.make_selftest_checkpoint(str(raw))
    sha8 = hashlib.sha256(raw.read_bytes()).hexdigest()[:8]
    ckpt = tmp_path / f'encodec_24khz-{sha8}.th'
    os.rename(raw, ckpt)

    parity_eval.main(['--checkpoint', str(ckpt), '--model', 'encodec_24khz',
                      '--dry-run'])
    out = capsys.readouterr().out
    assert '**PASS**' in out
    assert f'encodec_24khz-{sha8}.th' in out
    # dry-run must not touch the committed report
    assert 'wrote' not in out

    # a corrupted checksum must fail loudly, as with real released weights
    bad = tmp_path / 'encodec_24khz-00000000.th'
    os.rename(ckpt, bad)
    with pytest.raises(RuntimeError, match='checksum'):
        parity_eval.main(['--checkpoint', str(bad), '--dry-run'])


def test_parity_eval_dry_run_48khz(tmp_path, capsys):
    """Same warm path for the 48 kHz released flavor
    (``encodec_48khz-7e698e3e.th``, reference model.py:311-329): stereo
    clips, 1 s segmentation + overlap-add, per-segment normalization
    scales — conversion, both roundtrips, tolerance assertions."""
    parity_eval = _import_parity_eval()

    raw = tmp_path / 'raw.th'
    parity_eval.make_selftest_checkpoint(str(raw), model_name='encodec_48khz')
    sha8 = hashlib.sha256(raw.read_bytes()).hexdigest()[:8]
    ckpt = tmp_path / f'encodec_48khz-{sha8}.th'
    os.rename(raw, ckpt)

    parity_eval.main(['--checkpoint', str(ckpt), '--model', 'encodec_48khz',
                      '--dry-run'])
    out = capsys.readouterr().out
    assert '**PASS**' in out
    assert f'encodec_48khz-{sha8}.th' in out
    assert '| 3.0 |' in out   # the 48k bandwidth grid starts at 3 kbps


def test_pod_launchers_smoke():
    """bash syntax of both multi-host launchers + their embedded train_cli
    argument lists resolve against the shipped configs."""
    for script in ('train_pod.sh', 'train.sbatch'):
        subprocess.run(['bash', '-n', os.path.join(_SCRIPTS, script)],
                       check=True)

    # the invocation train.sbatch srun's (and train_pod.sh's example)
    from encodec_pytorch_tpu.config import load_config
    cfg = load_config('config_48k_stereo',
                      ['datasets.batch_size=64', 'balancer.weights.l_g=4'])
    assert int(cfg.datasets.batch_size) == 64
    assert float(cfg.balancer.weights.l_g) == 4.0
    assert cfg.distributed.init_method == 'jax'

    # multi-host init surface the launchers document: JAX_COORDINATOR /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID consumed by initialize_distributed
    from encodec_pytorch_tpu.parallel import mesh
    assert callable(mesh.initialize_distributed)
    src = open(mesh.__file__).read()
    for var in ('JAX_COORDINATOR', 'JAX_NUM_PROCESSES', 'JAX_PROCESS_ID'):
        assert var in src, f'{var} no longer consumed by initialize_distributed'
