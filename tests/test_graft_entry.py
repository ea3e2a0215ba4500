"""Driver contract: dryrun_multichip compiles + executes on a CPU mesh.

Round-1 failure mode (VERDICT.md Missing #1): the driver calls
``dryrun_multichip(8)`` in an environment where JAX sees ONE real device and
no virtual-device XLA flags — tests passed only because conftest.py forced an
8-CPU backend first. These tests reproduce the driver's invocation context:
a clean subprocess with XLA_FLAGS / JAX_PLATFORMS / PYTHONPATH stripped, so
``dryrun_multichip`` must self-provision its own virtual mesh.
"""

import os
import subprocess
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo_root)


def test_dryrun_multichip_in_process():
    """In-process call (whatever the ambient backend) must succeed."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)


def test_dryrun_multichip_clean_subprocess():
    """The exact driver scenario: clean env, single default device visible,
    no conftest-provided virtual-device flags."""
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'PYTHONPATH',
                        '_ENCODEC_TPU_DRYRUN_CHILD')}
    code = ('import sys; sys.path.insert(0, %r); '
            'import __graft_entry__ as g; g.dryrun_multichip(2); '
            'print("PARENT_OK")' % _repo_root)
    proc = subprocess.run([sys.executable, '-c', code], env=env,
                          cwd=_repo_root, capture_output=True, text=True,
                          timeout=1200)
    assert proc.returncode == 0 and 'PARENT_OK' in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:])
