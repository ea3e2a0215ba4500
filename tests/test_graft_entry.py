"""Driver contract: dryrun_multichip compiles + executes on a CPU mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_two_devices():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)
