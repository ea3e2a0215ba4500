"""Audio file IO without external C audio libraries.

The reference leans on librosa/audioread/soundfile/torchaudio
(customAudioDataset.py:39-44, utils.py:96-116); this container has none of
them, so WAV IO is built on scipy (with mmap for partial reads) and
resampling on scipy's polyphase resampler. Other formats can be plugged in
via ``register_reader``.
"""

import os
from fractions import Fraction
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple, Union

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

_READERS: Dict[str, Callable] = {}


def register_reader(ext: str, fn: Callable):
    """Register a reader ``fn(path) -> (wav [C, T] float32, sr)`` for files
    with the given extension (e.g. plug in soundfile when available)."""
    _READERS[ext.lower().lstrip('.')] = fn


def _pcm_to_float(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32 or data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0)
    raise ValueError(f"unsupported wav dtype {data.dtype}")


def wav_info(path: Union[str, Path]) -> Tuple[int, int, int]:
    """(sample_rate, n_frames, n_channels) without loading samples."""
    sr, data = wavfile.read(str(path), mmap=True)
    if data.ndim == 1:
        return sr, data.shape[0], 1
    return sr, data.shape[0], data.shape[1]


def read_wav(path: Union[str, Path], start: int = 0,
             frames: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Read (a slice of) a wav file → (wav ``[C, T]`` float32, sample_rate).

    ``start``/``frames`` slice without loading the whole file (mmap) —
    the equivalent of the reference's ``sf.read(start=, frames=)``
    (multi_channel_dataset.py:125-130).
    """
    path = Path(path)
    ext = path.suffix.lower().lstrip('.')
    if ext in _READERS:
        wav, sr = _READERS[ext](path)
        if frames is not None:
            wav = wav[:, start:start + frames]
        elif start:
            wav = wav[:, start:]
        return wav, sr
    sr, data = wavfile.read(str(path), mmap=True)
    end = None if frames is None else start + frames
    data = np.array(data[start:end])
    data = _pcm_to_float(data)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T  # scipy gives [T, C]
    return np.ascontiguousarray(data), sr


def write_wav(path: Union[str, Path], wav: np.ndarray, sample_rate: int):
    """Write ``[C, T]`` float32 in [-1, 1] as 16-bit PCM (utils.py:100-116)."""
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 1:
        wav = wav[None, :]
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16).T  # [T, C]
    if pcm.shape[1] == 1:
        pcm = pcm[:, 0]
    os.makedirs(os.path.dirname(os.path.abspath(str(path))) or '.', exist_ok=True)
    wavfile.write(str(path), sample_rate, pcm)


def resample(wav: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis."""
    if sr == target_sr:
        return np.asarray(wav, np.float32)
    frac = Fraction(target_sr, sr)
    out = resample_poly(np.asarray(wav, np.float64), frac.numerator,
                        frac.denominator, axis=-1)
    return out.astype(np.float32)
