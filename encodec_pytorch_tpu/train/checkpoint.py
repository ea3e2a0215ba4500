"""Checkpoint save/resume for the full TrainState.

The reference torch.saves {epoch, model/optimizer/scheduler state_dicts} as
two files (generator + discriminator, utils.py:132-148). Here the entire
TrainState — both param trees, both Adam states, the RVQ EMA buffers and the
balancer EMA — is one msgpack pytree (flax.serialization) plus a tiny JSON
sidecar with the epoch/step, so resume is exact (SURVEY.md §5: codebook
buffers are first-class checkpoint state). Schedules are pure functions of
the step, so there is no scheduler state to store.
"""

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state, epoch: int):
    """Write ``<path>`` (msgpack) + ``<path>.meta.json``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or '.', exist_ok=True)
    host_state = jax.device_get(state)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(host_state))
    with open(path + '.meta.json', 'w') as f:
        json.dump({'epoch': int(epoch), 'step': int(np.asarray(host_state.step))}, f)


def load_checkpoint(path: str, template) -> Tuple[object, int]:
    """Restore into the structure of ``template``; returns (state, epoch)."""
    with open(path, 'rb') as f:
        state = serialization.from_bytes(template, f.read())
    epoch = 0
    meta_path = path + '.meta.json'
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            epoch = int(json.load(f).get('epoch', 0))
    return state, epoch


def latest_checkpoint(folder: str, prefix: str = '') -> Optional[str]:
    """Newest checkpoint file in a folder (ignoring sidecars)."""
    if not os.path.isdir(folder):
        return None
    cands = [os.path.join(folder, f) for f in os.listdir(folder)
             if f.startswith(prefix) and f.endswith('.ckpt')]
    return max(cands, key=os.path.getmtime) if cands else None
