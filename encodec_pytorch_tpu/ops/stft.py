"""Batched STFT + log-mel front-end on XLA FFTs.

Rebuild of /root/reference/audio_to_mel.py and the spectrogram used by the
MS-STFT discriminator (msstftd.py:62-64). Framing is a gather with static
indices + one batched ``jnp.fft.rfft`` — XLA lowers this to its native FFT on
TPU; the mel projection is a single matmul.

The mel filterbank reimplements librosa's slaney-scale ``filters.mel``
(htk=False, norm='slaney') in numpy so the loss spectra match the reference
(audio_to_mel.py:24 uses librosa's default arguments).

The torch-CUDA device hardcoding of the reference (audio_to_mel.py:17-25,
losses.py:31-34) has no analogue here — everything is pure functions.
"""

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------- mel filterbank

def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank ``[n_mels, 1 + n_fft//2]``."""
    if fmax is None:
        fmax = float(sr) / 2
    fftfreqs = np.linspace(0, float(sr) / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)),
                          n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# -------------------------------------------------------------------- stft

def hann_window(win_length: int) -> np.ndarray:
    """torch.hann_window (periodic): 0.5 - 0.5 cos(2πn/N)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _centered_window(n_fft: int, win_length: int) -> np.ndarray:
    """Hann window zero-padded to ``n_fft``, centered — torch.stft pads a
    ``win_length < n_fft`` window on both sides to length n_fft (left pad
    ``(n_fft - win_length) // 2``)."""
    w = np.zeros(n_fft, dtype=np.float32)
    off = (n_fft - win_length) // 2
    w[off:off + win_length] = hann_window(win_length)
    return w


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """x ``[..., T]`` → frames ``[..., n_frames, n_fft]`` (center=False)."""
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    return x[..., idx]


def frame_signal_grouped(x: jnp.ndarray, n_fft: int,
                         hop_length: int) -> jnp.ndarray:
    """Same frame *set* as ``frame_signal`` but phase-major order, built
    from ``n_fft // hop`` zero-copy reshapes instead of a gather.

    Requires ``n_fft % hop == 0``. Frame ``k`` (start ``k·hop``) appears at
    position ``(k % r, k // r)`` — a permutation of the natural order, so
    any frame-permutation-invariant consumer (the multi-scale mel loss's
    mean) gets identical values, while the VJP is a reshape-add instead of
    the gather's scatter-add over 4×-overlapping windows (the TPU-slow
    part of the loss backward)."""
    T = x.shape[-1]
    r = n_fft // hop_length
    assert r * hop_length == n_fft, (n_fft, hop_length)
    n_frames = 1 + (T - n_fft) // hop_length
    groups = []
    for p in range(r):
        m_p = -(-(n_frames - p) // r)  # ceil
        if m_p <= 0:
            continue
        xs = x[..., p * hop_length:p * hop_length + m_p * n_fft]
        groups.append(xs.reshape(*x.shape[:-1], m_p, n_fft))
    return jnp.concatenate(groups, axis=-2)


def frame_signal_time_major(x: jnp.ndarray, n_fft: int,
                            hop_length: int) -> jnp.ndarray:
    """Exactly ``frame_signal`` (time-major frame order) built from the
    grouped zero-copy reshapes plus ONE transpose — no gather.

    Requires ``n_fft % hop == 0``. Frame ``k`` (start ``k·hop``) lives in
    phase group ``p = k % r`` at row ``m = k // r``; stacking the groups
    ``[r, m_max]`` (zero-padded rows land at ``k ≥ n_frames`` by
    construction) and swapping to ``[m_max, r]`` flattens to ``k = m·r + p``
    — the natural order. Forward is reshapes + a transpose; the VJP is the
    same in reverse (reshape-add), not the sample-level scatter-add the
    gather framing pays (the TPU-slow part — see PERF_NOTES
    "Scatter-free mel-loss framing")."""
    T = x.shape[-1]
    r = n_fft // hop_length
    assert r * hop_length == n_fft, (n_fft, hop_length)
    n_frames = 1 + (T - n_fft) // hop_length
    m_max = -(-n_frames // r)
    lead = x.shape[:-1]
    groups = []
    for p in range(r):
        m_p = max(0, -(-(n_frames - p) // r))
        xs = x[..., p * hop_length:p * hop_length + m_p * n_fft]
        xs = xs.reshape(*lead, m_p, n_fft)
        if m_p < m_max:
            pad = [(0, 0)] * len(lead) + [(0, m_max - m_p), (0, 0)]
            xs = jnp.pad(xs, pad)
        groups.append(xs)
    st = jnp.stack(groups, axis=-3)               # [..., r, m_max, n_fft]
    st = jnp.swapaxes(st, -3, -2)                 # [..., m_max, r, n_fft]
    st = st.reshape(*lead, m_max * r, n_fft)
    return st[..., :n_frames, :]


def stft(x: jnp.ndarray, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, window: Optional[jnp.ndarray] = None,
         normalized: bool = False) -> jnp.ndarray:
    """Complex STFT of ``x [..., T]`` → ``[..., F, n_frames]``.

    Matches ``torch.stft(center=False)`` / torchaudio ``Spectrogram(center=
    False, pad_mode=None, power=None)``; ``normalized=True`` divides by the
    window's L2 norm (torchaudio's ``normalized='window'``).
    """
    win_length = win_length or n_fft
    if window is None:
        window = jnp.asarray(_centered_window(n_fft, win_length))
    if n_fft % hop_length == 0:
        frames = frame_signal_time_major(x, n_fft, hop_length) * window
    else:
        frames = frame_signal(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)      # [..., n_frames, F]
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(jnp.square(window)))
    return jnp.swapaxes(spec, -1, -2)                   # [..., F, n_frames]


@lru_cache(maxsize=None)
def _dft_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis as a conv kernel ``[n_fft, 1, 2F]``
    (re then im halves), F = 1 + n_fft//2.

    ``rfft(window * frame)[f] = Σ_n window[n]·frame[n]·e^{-2πi f n / N}`` —
    so a stride-``hop`` VALID conv with this kernel IS the windowed STFT.
    On TPU this runs on the MXU instead of the VPU FFT and skips
    materializing the 4×-overlapping frame gather (hop = n/4 here).
    """
    n = np.arange(n_fft)[:, None]
    f = np.arange(1 + n_fft // 2)[None, :]
    ang = -2.0 * np.pi * n * f / n_fft
    w = _centered_window(n_fft, win_length).astype(np.float64)
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1) * w[:, None]
    return basis.astype(np.float32)[:, None, :]


def stft_matmul(x: jnp.ndarray, n_fft: int, hop_length: int,
                win_length: Optional[int] = None,
                normalized: bool = False) -> jnp.ndarray:
    """``stft()`` lowered as one strided conv (MXU matmul): returns
    ``(re, im)`` each ``[..., F, n_frames]`` instead of a complex array.

    Numerically equivalent to ``stft`` up to f32 matmul-vs-FFT roundoff
    (parity-tested); preferred on TPU for the loss/discriminator front ends
    where only real/imag or power spectra are consumed.
    """
    win_length = win_length or n_fft
    kernel = jnp.asarray(_dft_kernel(n_fft, win_length))
    shape = x.shape
    xf = x.reshape(-1, shape[-1], 1)                    # [B*, T, 1]
    y = jax.lax.conv_general_dilated(
        xf, kernel, window_strides=(hop_length,), padding='VALID',
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        preferred_element_type=jnp.float32)             # [B*, frames, 2F]
    if normalized:
        w = jnp.asarray(hann_window(win_length))
        y = y / jnp.sqrt(jnp.sum(jnp.square(w)))
    F = 1 + n_fft // 2
    y = jnp.swapaxes(y, -1, -2).reshape(*shape[:-1], 2 * F, -1)
    return y[..., :F, :], y[..., F:, :]


def audio_to_mel(x: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
                 sampling_rate: int, n_mel_channels: int,
                 mel_fmin: float = 0.0, mel_fmax: Optional[float] = None,
                 method: str = 'fft',
                 frame_order: str = 'natural') -> jnp.ndarray:
    """Log10-mel spectrogram (reference Audio2Mel, audio_to_mel.py:34-55).

    x: ``[B, C, T]`` or ``[B, T]`` → ``[B(, C), n_mels, n_frames]`` with
    reflect padding of (n_fft - hop)/2 on both sides, power spectrum, mel
    projection, ``log10(clamp(·, 1e-5))``. ``method='matmul'`` computes the
    STFT as one strided MXU conv (see ``stft_matmul``).

    ``frame_order='any'`` allows the phase-grouped reshape framing
    (``frame_signal_grouped``): identical frame values in permuted frame
    order — only valid for consumers that are frame-permutation-invariant
    (the mel loss); its VJP avoids the gather framing's scatter-add.
    """
    shape = x.shape
    if x.ndim > 2:
        x = x.reshape(shape[0] * shape[1], -1)
    p = (n_fft - hop_length) // 2
    x = jnp.pad(x, ((0, 0), (p, p)), mode='reflect')
    if method == 'matmul':
        re, im = stft_matmul(x, n_fft, hop_length, win_length)
        power = jnp.square(re) + jnp.square(im)
    elif frame_order == 'any' and n_fft % hop_length == 0:
        window = jnp.asarray(_centered_window(n_fft, win_length))
        frames = frame_signal_grouped(x, n_fft, hop_length) * window
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)   # [B*, frames, F]
        spec = jnp.swapaxes(spec, -1, -2)
        power = jnp.square(spec.real) + jnp.square(spec.imag)
    else:
        spec = stft(x, n_fft, hop_length, win_length)   # [B*, F, frames]
        power = jnp.square(spec.real) + jnp.square(spec.imag)
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mel_channels,
                                       mel_fmin, mel_fmax))
    mel = jnp.einsum('mf,bft->bmt', basis, power)
    log_mel = jnp.log10(jnp.clip(mel, min=1e-5))
    if len(shape) > 2:
        log_mel = log_mel.reshape(shape[0], shape[1], n_mel_channels, -1)
    return log_mel
