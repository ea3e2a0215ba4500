"""Framework utilities: overlap-add, seeding, checkpoint checksum, audio save.

Rebuild of /root/reference/utils.py (the device-side parts in jnp, the
host-side parts in numpy).
"""

import os
import random
from hashlib import sha256
from pathlib import Path
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np


def linear_overlap_add(frames: Sequence[jnp.ndarray], stride: int) -> jnp.ndarray:
    """Triangular-weighted overlap-add of decoded segments (utils.py:22-61).

    frames: list of ``[..., T_frame]`` arrays (time-minor), equal shapes except
    possibly the last frame. Weight at offset t in a frame of length L is
    ``0.5 - |t/(L+1) - 0.5|`` (the reference's linspace over L+2 interior
    points), normalized by the summed weight at every output position.
    """
    assert len(frames)
    dtype = frames[0].dtype
    shape = frames[0].shape[:-1]
    total_size = stride * (len(frames) - 1) + frames[-1].shape[-1]

    frame_length = frames[0].shape[-1]
    t = jnp.linspace(0, 1, frame_length + 2, dtype=dtype)[1:-1]
    weight = 0.5 - jnp.abs(t - 0.5)

    sum_weight = jnp.zeros((total_size,), dtype=dtype)
    out = jnp.zeros(shape + (total_size,), dtype=dtype)
    offset = 0
    for frame in frames:
        fl = frame.shape[-1]
        out = out.at[..., offset:offset + fl].add(weight[:fl] * frame)
        sum_weight = sum_weight.at[offset:offset + fl].add(weight[:fl])
        offset += stride
    return out / sum_weight


def set_seed(seed: int):
    """Seed host-side RNGs (numpy + python). Device randomness is explicit
    jax.random keys everywhere — nothing global to seed (utils.py:118-129)."""
    np.random.seed(seed)
    random.seed(seed)


def check_checksum(path: Union[str, Path], checksum: str):
    """sha256-prefix checksum check for checkpoint files (utils.py:70-81)."""
    sha = sha256()
    with open(path, 'rb') as file:
        while True:
            buf = file.read(2 ** 20)
            if not buf:
                break
            sha.update(buf)
    actual = sha.hexdigest()[:len(checksum)]
    if actual != checksum:
        raise RuntimeError(f'Invalid checksum for file {path}, '
                           f'expected {checksum} but got {actual}')


def convert_audio(wav: np.ndarray, sr: int, target_sr: int,
                  target_channels: int) -> np.ndarray:
    """Channel up/down-mix + resample, host-side (utils.py:84-97).

    wav: ``[..., C, T]`` float array.
    """
    assert wav.ndim >= 2, "Audio tensor must have at least 2 dimensions"
    assert wav.shape[-2] in [1, 2], "Audio must be mono or stereo."
    channels = wav.shape[-2]
    if target_channels == 1:
        wav = wav.mean(-2, keepdims=True)
    elif target_channels == 2 and channels == 1:
        wav = np.broadcast_to(wav, wav.shape[:-2] + (2, wav.shape[-1])).copy()
    elif channels != target_channels:
        raise RuntimeError(
            f"Impossible to convert from {channels} to {target_channels}")
    if sr != target_sr:
        from .data.audio_io import resample
        wav = resample(wav, sr, target_sr)
    return wav


def save_audio(wav: np.ndarray, path: Union[str, Path], sample_rate: int,
               rescale: bool = False):
    """Save with clamp/rescale to 0.99 as 16-bit PCM (utils.py:100-116)."""
    from .data.audio_io import write_wav
    limit = 0.99
    mx = np.abs(wav).max()
    if rescale:
        wav = wav * min(limit / mx, 1) if mx > 0 else wav
    else:
        wav = np.clip(wav, -limit, limit)
    write_wav(path, wav, sample_rate)


def count_parameters(params) -> int:
    """Total leaf element count of a param pytree (utils.py:167-176)."""
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def enable_compile_cache(path: Union[str, Path, None]):
    """Turn on JAX's persistent XLA compilation cache at ``path``.

    The production train step compiles in minutes cold (docs/PERF_NOTES.md);
    the persistent cache makes every later process start (trainer resume,
    codec CLI invocation, bench) reuse the compiled executable. No-op when
    ``path`` is falsy. The reference has no equivalent (torch eager).
    """
    if not path:
        return
    import jax
    path = os.path.abspath(str(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    # cache everything, however quick the compile
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
