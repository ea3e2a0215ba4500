"""MS-STFT discriminator — TPU-native rebuild of /root/reference/msstftd.py.

Each sub-discriminator computes a complex STFT at its scale (normalized,
center=False), stacks real/imag as channels and runs a 2-D conv stack
(entry k(3,9) → 3 time-dilated convs d∈{1,2,4} stride (1,2) → k(3,3) →
1-channel conv_post), LeakyReLU(0.2), weight-norm (msstftd.py:28-105).

Layout: NHWC with H = STFT frames (time), W = frequency bins — the
reference's ``rearrange(z, 'b c w t -> b c t w')`` (msstftd.py:99) followed by
NCHW convs maps to the same (time, freq) spatial axes.
"""

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import NormConv2d
from ..ops.stft import hann_window, stft, stft_matmul


def get_2d_padding(kernel_size: Tuple[int, int],
                   dilation: Tuple[int, int] = (1, 1)) -> Tuple[int, int]:
    """Symmetric 'same-ish' padding (msstftd.py:24-25)."""
    return (((kernel_size[0] - 1) * dilation[0]) // 2,
            ((kernel_size[1] - 1) * dilation[1]) // 2)


class DiscriminatorSTFT(nn.Module):
    """STFT sub-discriminator (msstftd.py:28-105).

    ``__call__(x [B, C, T]) → (logits [B, T', F', 1], fmaps: 5 × NHWC)``.
    """
    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: Tuple[int, int] = (3, 9)
    dilations: Sequence[int] = (1, 2, 4)
    stride: Tuple[int, int] = (1, 2)
    normalized: bool = True
    norm: str = 'weight_norm'
    activation_slope: float = 0.2
    stft_method: str = 'fft'   # 'fft' | 'matmul' (DFT as one strided MXU conv)
    dtype: Any = jnp.float32
    fpack: int = 4   # F-phase output packing for the narrow-channel convs
                     # (ops/conv2d_pack.py): the 32-lane conv stack fills the
                     # MXU at `fpack`x output lanes; 0/1 disables. conv_post
                     # (1 output channel) always stays on the plain conv.
    fpack_dx: bool = True   # phase-packed custom input-gradient for the
                            # fpack'd convs (conv2d_fpack_dx); False =
                            # XLA autodiff backward
    pallas_v2: bool = False  # pipelined fpack-im2col Pallas kernel for the
                             # eligible 32-channel convs (forward + dx);
                             # see ops/pallas_conv2d_v2.py

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        act = lambda z: jax.nn.leaky_relu(z, negative_slope=self.activation_slope)
        # [B, C, T] → complex [B, C, F, T'] → real/imag channels, NHWC [B, T', F, 2C]
        if self.stft_method == 'matmul':
            re, im = stft_matmul(x, self.n_fft, self.hop_length,
                                 self.win_length, normalized=self.normalized)
            z = jnp.concatenate([re, im], axis=1)
        else:
            window = jnp.asarray(hann_window(self.win_length))
            spec = stft(x, self.n_fft, self.hop_length, self.win_length,
                        window=window, normalized=self.normalized)
            z = jnp.concatenate([spec.real, spec.imag], axis=1)
        z = jnp.transpose(z, (0, 3, 2, 1))
        fmap: List[jnp.ndarray] = []

        spec_channels = 2 * self.in_channels
        in_chs = spec_channels
        out_chs = min(self.filters_scale * self.filters, self.max_filters)
        z = NormConv2d(in_chs, self.filters, kernel_size=self.kernel_size,
                       padding=get_2d_padding(self.kernel_size),
                       norm='none', dtype=self.dtype, fpack=self.fpack,
                       fpack_dx=self.fpack_dx, pallas_v2=self.pallas_v2,
                       name='conv_0')(z)
        z = act(z)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters,
                          self.max_filters)
            z = NormConv2d(in_chs, out_chs, kernel_size=self.kernel_size,
                           stride=self.stride, dilation=(dilation, 1),
                           padding=get_2d_padding(self.kernel_size, (dilation, 1)),
                           norm=self.norm, dtype=self.dtype, fpack=self.fpack,
                           fpack_dx=self.fpack_dx, pallas_v2=self.pallas_v2,
                           name=f'conv_{i + 1}')(z)
            z = act(z)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min((self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
                      self.max_filters)
        ks = (self.kernel_size[0], self.kernel_size[0])
        z = NormConv2d(in_chs, out_chs, kernel_size=ks,
                       padding=get_2d_padding(ks), norm=self.norm,
                       dtype=self.dtype, fpack=self.fpack,
                       fpack_dx=self.fpack_dx, pallas_v2=self.pallas_v2,
                       name=f'conv_{len(self.dilations) + 1}')(z)
        z = act(z)
        fmap.append(z)
        z = NormConv2d(out_chs, self.out_channels, kernel_size=ks,
                       padding=get_2d_padding(ks), norm=self.norm,
                       dtype=self.dtype, name='conv_post')(z)
        # loss boundary: hinge/feature losses compute in f32 (no-op in f32
        # mode; in the bf16 pipeline only the conv stack runs reduced)
        return (z.astype(jnp.float32),
                [f.astype(jnp.float32) for f in fmap])


class MultiScaleSTFTDiscriminator(nn.Module):
    """Multi-scale STFT discriminator (msstftd.py:108-149).

    ``__call__(x [B, C, T]) → (logits: list, fmaps: list of 5-lists)``.
    """
    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: Sequence[int] = (1024, 2048, 512)
    hop_lengths: Sequence[int] = (256, 512, 128)
    win_lengths: Sequence[int] = (1024, 2048, 512)
    norm: str = 'weight_norm'
    stft_method: str = 'fft'
    dtype: Any = jnp.float32
    fpack: int = 4
    fpack_dx: bool = True
    pallas_v2: bool = False

    @property
    def num_discriminators(self) -> int:
        return len(self.n_ffts)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        assert len(self.n_ffts) == len(self.hop_lengths) == len(self.win_lengths)
        logits, fmaps = [], []
        for i in range(len(self.n_ffts)):
            logit, fmap = DiscriminatorSTFT(
                self.filters, in_channels=self.in_channels,
                out_channels=self.out_channels, n_fft=self.n_ffts[i],
                win_length=self.win_lengths[i], hop_length=self.hop_lengths[i],
                norm=self.norm, stft_method=self.stft_method,
                dtype=self.dtype, fpack=self.fpack,
                fpack_dx=self.fpack_dx, pallas_v2=self.pallas_v2,
                name=f'disc_{i}')(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps
