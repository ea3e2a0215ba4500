"""SEANet encoder/decoder — TPU-native rebuild of /root/reference/modules/seanet.py.

Same topology as the reference (cited per block below) in channels-last NTC
layout. Submodule names mirror the reference's ``nn.Sequential`` indices
(``layer_{i}``) so the torch→JAX state-dict converter is a mechanical key
rewrite; activation-only positions consume an index with no params, exactly
like torch.

Default 24 kHz config: hop = ∏ratios = 320 → 75 Hz frame rate at 24 kHz
(seanet.py:103); encoder emits 128-d latents.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import SConv1d, SConvTranspose1d
from ..ops.lstm import SLSTM


def _act(name: str, params: dict):
    if name == 'ELU':
        alpha = params.get('alpha', 1.0)
        return lambda x: jax.nn.elu(x, alpha=alpha)
    if name == 'ReLU':
        return jax.nn.relu
    if name == 'LeakyReLU':
        slope = params.get('negative_slope', 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == 'Tanh':
        return jnp.tanh
    raise ValueError(f"unsupported activation {name}")


class SEANetResnetBlock(nn.Module):
    """Residual block (seanet.py:21-63): [ELU, k3 dilated conv to dim//compress,
    ELU, k1 conv back to dim] + shortcut (identity or 1×1 conv)."""
    dim: int
    kernel_sizes: Sequence[int] = (3, 1)
    dilations: Sequence[int] = (1, 1)
    activation: str = 'ELU'
    activation_params: Any = None
    norm: str = 'weight_norm'
    causal: bool = False
    pad_mode: str = 'reflect'
    compress: int = 2
    true_skip: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _act(self.activation, self.activation_params or {'alpha': 1.0})
        hidden = self.dim // self.compress
        # Narrow-channel stages compute the whole block in NCT layout (time on
        # lanes): one transpose in/out, intermediates stay compact in HBM —
        # measured 4× on the C=32/T=720k block (docs/PERF_NOTES.md). The param
        # tree is identical; only the lowering changes.
        layout = ('NCT' if self.dim < 128 and hidden >= 1
                  and self.norm in ('none', 'weight_norm') else 'NTC')
        if layout == 'NCT':
            x = jnp.swapaxes(x, 1, 2)
        y = x
        n = len(self.kernel_sizes)
        for i, (kernel_size, dilation) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == n - 1 else hidden
            y = act(y)
            # torch index inside block sequential: 2*i + 1 (ELU at 2*i)
            y = SConv1d(in_chs, out_chs, kernel_size=kernel_size, dilation=dilation,
                        norm=self.norm, causal=self.causal, pad_mode=self.pad_mode,
                        layout=layout, dtype=self.dtype,
                        name=f'block_{2 * i + 1}')(y)
        if self.true_skip:
            shortcut = x
        else:
            shortcut = SConv1d(self.dim, self.dim, kernel_size=1, norm=self.norm,
                               causal=self.causal, pad_mode=self.pad_mode,
                               layout=layout, dtype=self.dtype,
                               name='shortcut')(x)
        out = shortcut + y
        if layout == 'NCT':
            out = jnp.swapaxes(out, 1, 2)
        return out


class SEANetEncoder(nn.Module):
    """SEANet encoder (seanet.py:66-144).

    ``[B, T, channels]`` → ``[B, ceil(T/hop), dimension]``. Ratios are applied
    reversed (upsampling order is given, seanet.py:100).
    """
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    activation: str = 'ELU'
    activation_params: Any = None
    norm: str = 'weight_norm'
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = 'reflect'
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    dtype: Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, x):
        act = _act(self.activation, self.activation_params or {'alpha': 1.0})
        idx = 0
        mult = 1
        # entry conv in NCT: its input is C=1 (127/128 lanes wasted in NTC)
        entry_layout = ('NCT' if self.n_filters < 128
                        and self.norm in ('none', 'weight_norm') else 'NTC')
        if entry_layout == 'NCT':
            x = jnp.swapaxes(x, 1, 2)
        x = SConv1d(self.channels, mult * self.n_filters, self.kernel_size,
                    norm=self.norm, causal=self.causal, pad_mode=self.pad_mode,
                    layout=entry_layout, dtype=self.dtype,
                    name=f'layer_{idx}')(x)
        if entry_layout == 'NCT':
            x = jnp.swapaxes(x, 1, 2)
        idx += 1
        for ratio in reversed(list(self.ratios)):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    norm=self.norm, activation=self.activation,
                    activation_params=self.activation_params,
                    causal=self.causal, pad_mode=self.pad_mode,
                    compress=self.compress, true_skip=self.true_skip,
                    dtype=self.dtype, name=f'layer_{idx}')(x)
                idx += 1
            x = act(x)
            idx += 1  # activation holds a sequential slot (no params)
            x = SConv1d(mult * self.n_filters, mult * self.n_filters * 2,
                        kernel_size=ratio * 2, stride=ratio, norm=self.norm,
                        causal=self.causal, pad_mode=self.pad_mode,
                        dtype=self.dtype, name=f'layer_{idx}')(x)
            idx += 1
            mult *= 2

        if self.lstm:
            x = SLSTM(mult * self.n_filters, num_layers=self.lstm,
                      dtype=self.dtype, name=f'layer_{idx}')(x)
            idx += 1

        x = act(x)
        idx += 1
        x = SConv1d(mult * self.n_filters, self.dimension, self.last_kernel_size,
                    norm=self.norm, causal=self.causal, pad_mode=self.pad_mode,
                    dtype=self.dtype, name=f'layer_{idx}')(x)
        # latent boundary: the quantizer (EMA codebooks, L2 search) always
        # runs f32 — no-op in f32 mode, the bf16 pipeline ends here
        return x.astype(jnp.float32)


class SEANetDecoder(nn.Module):
    """SEANet decoder (seanet.py:147-238). ``[B, T', dimension]`` →
    ``[B, T'*hop, channels]``."""
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    activation: str = 'ELU'
    activation_params: Any = None
    final_activation: Optional[str] = None
    final_activation_params: Any = None
    norm: str = 'weight_norm'
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = 'reflect'
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    trim_right_ratio: float = 1.0
    dtype: Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, z):
        act = _act(self.activation, self.activation_params or {'alpha': 1.0})
        mult = int(2 ** len(self.ratios))
        idx = 0
        x = SConv1d(self.dimension, mult * self.n_filters, self.kernel_size,
                    norm=self.norm, causal=self.causal, pad_mode=self.pad_mode,
                    dtype=self.dtype, name=f'layer_{idx}')(z)
        idx += 1
        if self.lstm:
            x = SLSTM(mult * self.n_filters, num_layers=self.lstm,
                      dtype=self.dtype, name=f'layer_{idx}')(x)
            idx += 1

        for ratio in self.ratios:
            x = act(x)
            idx += 1
            out_ch = mult * self.n_filters // 2
            # narrow upsamples in NCT (time on lanes): out channels < 128
            # waste lanes in NTC at the decoder's largest time extents
            tr_layout = ('NCT' if out_ch < 128
                         and self.norm in ('none', 'weight_norm') else 'NTC')
            if tr_layout == 'NCT':
                x = jnp.swapaxes(x, 1, 2)
            x = SConvTranspose1d(mult * self.n_filters, out_ch,
                                 kernel_size=ratio * 2, stride=ratio,
                                 norm=self.norm, causal=self.causal,
                                 trim_right_ratio=self.trim_right_ratio,
                                 layout=tr_layout, dtype=self.dtype,
                                 name=f'layer_{idx}')(x)
            if tr_layout == 'NCT':
                x = jnp.swapaxes(x, 1, 2)
            idx += 1
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm, causal=self.causal, pad_mode=self.pad_mode,
                    compress=self.compress, true_skip=self.true_skip,
                    dtype=self.dtype, name=f'layer_{idx}')(x)
                idx += 1
            mult //= 2

        x = act(x)
        idx += 1
        # exit conv in NCT: C=32 in, C=1 out — both lane-starved in NTC
        exit_layout = ('NCT' if self.n_filters < 128
                       and self.norm in ('none', 'weight_norm') else 'NTC')
        if exit_layout == 'NCT':
            x = jnp.swapaxes(x, 1, 2)
        x = SConv1d(self.n_filters, self.channels, self.last_kernel_size,
                    norm=self.norm, causal=self.causal, pad_mode=self.pad_mode,
                    layout=exit_layout, dtype=self.dtype,
                    name=f'layer_{idx}')(x)
        if exit_layout == 'NCT':
            x = jnp.swapaxes(x, 1, 2)
        # waveform boundary: losses/OLA/scale-restore consume f32 audio
        x = x.astype(jnp.float32)
        if self.final_activation is not None:
            x = _act(self.final_activation, self.final_activation_params or {})(x)
        return x
