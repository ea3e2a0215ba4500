"""Checkpoint save/resume for the full TrainState.

The reference torch.saves {epoch, model/optimizer/scheduler state_dicts} as
two files (generator + discriminator, utils.py:132-148). Here the entire
TrainState — both param trees, both Adam states, the RVQ EMA buffers and the
balancer EMA — is one msgpack pytree (flax.serialization) plus a tiny JSON
sidecar with the epoch/step, so resume is exact (SURVEY.md §5: codebook
buffers are first-class checkpoint state). Schedules are pure functions of
the step, so there is no scheduler state to store.

Writes are ATOMIC (tmp file + rename) so a preemption mid-write can never
corrupt the newest checkpoint, and optionally ASYNC: the device→host fetch
is synchronous (the train step donates the state buffers, so the snapshot
must complete before the next step), but serialization + disk IO happen on
a background writer thread. ``wait_pending()`` joins outstanding writes —
called automatically before each new save and by the trainer on shutdown.
"""

import json
import os
import struct
import threading
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

_pending_lock = threading.Lock()
_pending: list = []

# Meta footer appended to the checkpoint blob itself so blob + epoch/step are
# ONE atomic unit (ADVICE r2: a crash between the blob rename and the sidecar
# write could pair a new blob with a stale/absent sidecar, silently resuming
# from the wrong epoch). Layout: msgpack blob | meta json | !I json_len | magic.
_META_MAGIC = b'ECKM'
_META_TRAILER = struct.Struct('!I4s')


def _write_files(path: str, blob: bytes, meta: dict):
    meta_bytes = json.dumps(meta).encode()
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
        f.write(meta_bytes)
        f.write(_META_TRAILER.pack(len(meta_bytes), _META_MAGIC))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX
    # Informational sidecar (human-readable epoch/step); load_checkpoint
    # prefers the in-blob footer, so a crash here cannot cause a stale pair.
    with open(path + '.meta.json.tmp', 'w') as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(path + '.meta.json.tmp', path + '.meta.json')


def _split_meta(raw: bytes) -> Tuple[bytes, Optional[dict]]:
    """Strip the meta footer if present; returns (blob, meta-or-None)."""
    ts = _META_TRAILER.size
    if len(raw) > ts:
        length, magic = _META_TRAILER.unpack(raw[-ts:])
        if magic == _META_MAGIC and len(raw) >= ts + length:
            try:
                meta = json.loads(raw[-ts - length:-ts].decode())
                return raw[:-ts - length], meta
            except (ValueError, UnicodeDecodeError):
                pass
    return raw, None


def wait_pending():
    """Join all outstanding async checkpoint writes (re-raises failures)."""
    with _pending_lock:
        threads = list(_pending)
        _pending.clear()
    for t, errbox in threads:
        t.join()
        if errbox:
            raise errbox[0]


def save_checkpoint(path: str, state, epoch: int, async_write: bool = False,
                    on_written=None):
    """Write ``<path>`` (msgpack + meta footer) + ``<path>.meta.json``.

    ``async_write=True`` returns once the device→host snapshot is taken and
    performs serialization + IO on a background thread (joined by the next
    save or ``wait_pending()``). ``on_written(path)`` is invoked after the
    files have actually landed on disk — on the writer thread in the async
    case — so callers can log success truthfully (ADVICE r2).
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)) or '.', exist_ok=True)
    wait_pending()  # at most one write in flight; surfaces earlier IO errors
    host_state = jax.device_get(state)
    meta = {'epoch': int(epoch), 'step': int(np.asarray(host_state.step))}
    if not async_write:
        _write_files(path, serialization.to_bytes(host_state), meta)
        if on_written is not None:
            on_written(path)
        return
    errbox: list = []

    def worker():
        try:
            _write_files(path, serialization.to_bytes(host_state), meta)
            if on_written is not None:
                on_written(path)
        except BaseException as exc:
            errbox.append(exc)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    with _pending_lock:
        _pending.append((t, errbox))


def load_checkpoint(path: str, template) -> Tuple[object, int]:
    """Restore into the structure of ``template``; returns (state, epoch).

    The epoch comes from the in-blob meta footer (atomic with the weights);
    pre-footer checkpoints fall back to the ``.meta.json`` sidecar."""
    with open(path, 'rb') as f:
        raw = f.read()
    blob, meta = _split_meta(raw)
    state = serialization.from_bytes(template, blob)
    if meta is not None:
        return state, int(meta.get('epoch', 0))
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
