"""Static (shape-derived) 1-D padding math for streamable convolutions.

Everything here is computed from *static* shapes so the whole model jits with
no dynamic shapes: the padding amounts become compile-time constants baked
into the XLA program.

Behavioral parity notes (reference: /root/reference/modules/conv.py):
- ``get_extra_padding_for_conv1d`` mirrors conv.py:54-61 — right-pad so the
  last conv window is full and the output has exactly ``ceil(T/stride)``
  frames.
- ``pad1d`` mirrors conv.py:79-96 including the reflect-pad guard for inputs
  shorter than the padding (extra zero right-pad before reflecting, trimmed
  after).
- ``unpad1d`` mirrors conv.py:99-105.

Layout: time-minor-ish NTC ``[B, T, C]`` (channels-last), the layout XLA:TPU
prefers; the reference uses torch NCT.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int = 0) -> int:
    """Extra right-padding so the final window of a strided conv is full.

    With this padding the conv output has ``ceil((length + padding_total
    - kernel_size) / stride) + 1`` frames and every input step contributes to
    some output frame (see the worked example at conv.py:69-74).
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad_for_conv1d(x: jnp.ndarray, kernel_size: int, stride: int,
                   padding_total: int = 0) -> jnp.ndarray:
    """Right-pad ``x`` (NTC) so that the last conv window is full."""
    extra = get_extra_padding_for_conv1d(x.shape[1], kernel_size, stride, padding_total)
    return pad1d(x, (0, extra))


def pad1d(x: jnp.ndarray, paddings: Tuple[int, int], mode: str = 'zero',
          value: float = 0., axis: int = 1) -> jnp.ndarray:
    """Pad the time axis of an NTC tensor (``axis=2`` for NCT layouts).

    ``mode='reflect'`` handles inputs shorter than the requested padding by
    inserting temporary zero right-padding before the reflection, then
    trimming it (conv.py:86-94). All branching is on static shapes.
    """
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    length = x.shape[axis]
    widths = [(0, 0)] * x.ndim
    widths[axis] = (padding_left, padding_right)
    end_widths = [(0, 0)] * x.ndim
    if mode == 'reflect':
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            end_widths[axis] = (0, extra_pad)
            x = jnp.pad(x, end_widths)
        padded = jnp.pad(x, widths, mode='reflect')
        if extra_pad:
            padded = jax.lax.slice_in_dim(
                padded, 0, padded.shape[axis] - extra_pad, axis=axis)
        return padded
    elif mode in ('zero', 'constant'):
        return jnp.pad(x, widths, constant_values=value)
    else:
        raise ValueError(f"unsupported pad mode: {mode}")


def unpad1d(x: jnp.ndarray, paddings: Tuple[int, int]) -> jnp.ndarray:
    """Remove padding from the time axis of an NTC tensor."""
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    assert (padding_left + padding_right) <= x.shape[1]
    end = x.shape[1] - padding_right
    return x[:, padding_left:end, :]
