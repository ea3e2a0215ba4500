"""Generator/discriminator losses — rebuild of /root/reference/losses.py.

Paper weights λ_t=0.1, λ_f=1, λ_g=3, λ_feat=3 ride in the balancer config
(config.yaml:55-60); these functions return the raw loss dict.

Reference quirks preserved for parity:
- ``l_g`` is divided by K twice (inside the loop at losses.py:48 and again at
  losses.py:56). Harmless under the balancer (gradients are norm-rescaled)
  but kept so unbalanced runs match.
- ``l_f`` uses seven log-mel scales with win=2^i, hop=2^i/4, i∈[5,11], 64
  mel bins, combining L1+L2 (losses.py:40-42).
"""

from typing import Dict, List, Sequence

import jax.numpy as jnp

from ..ops.stft import audio_to_mel

MEL_SCALES: Sequence[int] = tuple(range(5, 12))


def spectral_reconstruction_loss(input_wav: jnp.ndarray, output_wav: jnp.ndarray,
                                 sample_rate: int = 24000,
                                 stft_method: str = 'fft') -> jnp.ndarray:
    """l_f: multi-scale log-mel L1+L2 (losses.py:40-42)."""
    l_f = jnp.float32(0.0)
    for i in MEL_SCALES:
        # frame_order='any': the loss is a mean over frames, so the
        # phase-grouped reshape framing applies — identical loss value,
        # scatter-free backward (docs/PERF_NOTES.md)
        kwargs = dict(n_fft=2 ** i, win_length=2 ** i, hop_length=(2 ** i) // 4,
                      sampling_rate=sample_rate, n_mel_channels=64,
                      method=stft_method, frame_order='any')
        mel_x = audio_to_mel(input_wav, **kwargs)
        mel_y = audio_to_mel(output_wav, **kwargs)
        l_f = l_f + jnp.mean(jnp.abs(mel_x - mel_y)) \
            + jnp.mean(jnp.square(mel_x - mel_y))
    return l_f


def wav_losses(input_wav: jnp.ndarray, output_wav: jnp.ndarray,
               sample_rate: int = 24000,
               stft_method: str = 'fft') -> Dict[str, jnp.ndarray]:
    """The waveform-path generator losses {l_t, l_f} (losses.py:37-42).
    These are the only two losses whose gradient flows directly from the
    waveforms (not through the discriminator)."""
    l_t = jnp.mean(jnp.abs(input_wav - output_wav))
    l_f = spectral_reconstruction_loss(input_wav, output_wav, sample_rate,
                                       stft_method)
    return {'l_t': l_t, 'l_f': l_f}


def gan_losses(fmap_real: List[List[jnp.ndarray]],
               logits_fake: List[jnp.ndarray],
               fmap_fake: List[List[jnp.ndarray]]) -> Dict[str, jnp.ndarray]:
    """The discriminator-path generator losses {l_g, l_feat}
    (losses.py:44-56); gradient flows only through logits_fake/fmap_fake."""
    l_g = jnp.float32(0.0)
    l_feat = jnp.float32(0.0)
    K = len(fmap_real)
    for k in range(K):
        l_g = l_g + jnp.mean(jnp.maximum(1 - logits_fake[k], 0)) / len(logits_fake)
        for l in range(len(fmap_real[k])):
            l_feat = l_feat + jnp.mean(jnp.abs(fmap_real[k][l] - fmap_fake[k][l])) \
                / jnp.mean(jnp.abs(fmap_real[k][l]))
    l_feat = l_feat / (K * len(fmap_real[0]))
    l_g = l_g / K  # double K division kept from the reference (losses.py:48,56)
    return {'l_g': l_g, 'l_feat': l_feat}


def total_loss(fmap_real: List[List[jnp.ndarray]],
               logits_fake: List[jnp.ndarray],
               fmap_fake: List[List[jnp.ndarray]],
               input_wav: jnp.ndarray, output_wav: jnp.ndarray,
               sample_rate: int = 24000,
               stft_method: str = 'fft') -> Dict[str, jnp.ndarray]:
    """Generator loss dict {l_t, l_f, l_g, l_feat} (losses.py:4-63)."""
    return {**wav_losses(input_wav, output_wav, sample_rate, stft_method),
            **gan_losses(fmap_real, logits_fake, fmap_fake)}


def disc_loss(logits_real: List[jnp.ndarray],
              logits_fake: List[jnp.ndarray]) -> jnp.ndarray:
    """Hinge discriminator loss (losses.py:65-80)."""
    lossd = jnp.float32(0.0)
    for k in range(len(logits_real)):
        lossd = lossd + jnp.mean(jnp.maximum(1 - logits_real[k], 0)) \
            + jnp.mean(jnp.maximum(1 + logits_fake[k], 0))
    return lossd / len(logits_real)
