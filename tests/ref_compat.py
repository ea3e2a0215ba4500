"""Helpers for importing and running the reference torch code on CPU.

The reference hardcodes CUDA (losses.py:31-34,76; audio_to_mel.py:17-25) and
depends on torchaudio/librosa/soundfile which this image doesn't ship. These
helpers provide:

- ``install_audio_stubs()``: functional stand-ins for the small API surface
  the reference imports — ``torchaudio.transforms.Spectrogram`` (the exact
  ``power=None, normalized=True, center=False`` composition our own STFT is
  parity-tested against in test_losses.py) and ``librosa.filters.mel`` (our
  slaney filterbank — both sides of any comparison then share the basis).
- ``cuda_to_cpu()``: context manager rerouting the reference's hardcoded
  ``device='cuda'`` / ``.cuda()`` calls to CPU, reverted on exit.
"""

import contextlib
import sys
import types

import numpy as np

REF = '/root/reference'


def ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return REF


def install_audio_stubs():
    import torch

    if 'soundfile' not in sys.modules:
        sys.modules['soundfile'] = types.ModuleType('soundfile')

    # As with torchaudio below: upgrade a bare librosa stub left by another
    # tool (it must look like a PACKAGE — `from librosa.filters import mel`
    # needs both the attribute and the sys.modules['librosa.filters'] entry).
    if ('librosa' not in sys.modules
            or not hasattr(sys.modules['librosa'], 'filters')):
        from encodec_pytorch_tpu.ops.stft import mel_filterbank

        librosa = sys.modules.get('librosa') or types.ModuleType('librosa')
        filters = types.ModuleType('librosa.filters')

        def mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, **_):
            return mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax)

        filters.mel = mel
        librosa.filters = filters
        sys.modules['librosa'] = librosa
        sys.modules['librosa.filters'] = filters

    # Another tool may have installed a BARE torchaudio stub (e.g.
    # scripts/parity_eval.py's _import_reference_model) — upgrade it with the
    # Spectrogram the reference discriminator needs rather than skipping.
    if ('torchaudio' not in sys.modules
            or not hasattr(sys.modules['torchaudio'], 'transforms')):
        ta = sys.modules.get('torchaudio') or types.ModuleType('torchaudio')
        tr = types.ModuleType('torchaudio.transforms')

        class Spectrogram(torch.nn.Module):
            """Matches torchaudio Spectrogram(power=None, normalized=True,
            center=False, pad_mode=None) — the configuration used by the
            reference discriminator (msstftd.py:62-64)."""

            def __init__(self, n_fft, hop_length, win_length,
                         window_fn=torch.hann_window, normalized=True,
                         center=False, pad_mode=None, power=None):
                super().__init__()
                assert power is None and not center
                self.n_fft = n_fft
                self.hop_length = hop_length
                self.win_length = win_length
                self.normalized = normalized
                self.register_buffer('window', window_fn(win_length))

            def forward(self, x):
                shape = x.shape
                x = x.reshape(-1, shape[-1])
                z = torch.stft(x, n_fft=self.n_fft,
                               hop_length=self.hop_length,
                               win_length=self.win_length, window=self.window,
                               center=False, return_complex=True)
                if self.normalized:
                    z = z / self.window.pow(2).sum().sqrt()
                return z.reshape(shape[:-1] + z.shape[-2:])

        tr.Spectrogram = Spectrogram
        ta.transforms = tr
        sys.modules['torchaudio'] = ta
        sys.modules['torchaudio.transforms'] = tr


@contextlib.contextmanager
def cuda_to_cpu():
    """Reroute hardcoded device='cuda' to CPU for the duration."""
    import torch

    orig_tensor = torch.tensor
    orig_hann = torch.hann_window
    orig_cuda = torch.Tensor.cuda

    def _fix(kwargs):
        if str(kwargs.get('device', '')).startswith('cuda'):
            kwargs['device'] = 'cpu'
        return kwargs

    def tensor(*args, **kwargs):
        return orig_tensor(*args, **_fix(kwargs))

    def hann_window(*args, **kwargs):
        return orig_hann(*args, **_fix(kwargs))

    torch.tensor = tensor
    torch.hann_window = hann_window
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.tensor = orig_tensor
        torch.hann_window = orig_hann
        torch.Tensor.cuda = orig_cuda


def to_numpy_sd(module):
    """torch module state_dict → {key: np.ndarray} (detached, CPU)."""
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}
