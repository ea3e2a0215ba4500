"""F-phase output-packed 2-D conv lowering for narrow-channel conv stacks.

The MS-STFT discriminator's convs (reference msstftd.py:66-105) contract
32→32 channels: in NHWC on TPU the output occupies 32 of the MXU's 128
lanes, capping utilization at ~6 % regardless of layout — measured across
six lowerings in round 2 (docs/PERF_NOTES.md "Disc-conv lowering
experiments"). The only way past the ceiling is packing MORE OUTPUT WORK
into the lane dimension.

This lowering packs P consecutive output positions along the frequency axis
into the channel dimension: a ``[kh, kw, Cin, Cout]`` conv with F-stride
``sf`` becomes a ``[kh, (P-1)·sf + kw, Cin, P·Cout]`` conv with F-stride
``P·sf`` whose kernel is the block-Toeplitz expansion of the original —
output ``[B, H', W''/P blocks, P·Cout]`` reshapes back to
``[B, H', W', Cout]``. For the disc's 32-channel convs at P=8 the output
fills 256 lanes (2 full lane tiles) at the cost of a
``((P-1)·sf + kw) / kw`` FLOP factor (2.56× for k=9, s=2) — a good trade
when utilization is ~6 %: measured ~3.5× faster forward at production
shapes (PERF_NOTES round 3).

Pure XLA: autodiff works through the kernel expansion (a scatter of the
original weights) and the strided conv, so no custom VJP is needed; the
backward differentiates the SAME math and the numerics match the plain conv
to fp-reduction-order (the extra kernel entries are exact zeros).
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ['pack_kernel_fphase', 'conv2d_fpack']


def pack_kernel_fphase(kernel: jnp.ndarray, sf: int, phases: int) -> jnp.ndarray:
    """Block-Toeplitz expansion: ``[kh, kw, Cin, Cout]`` →
    ``[kh, (P-1)·sf + kw, Cin, P·Cout]`` with
    ``out[kt, p·sf + kw_i, ci, p·Cout + co] = kernel[kt, kw_i, ci, co]``."""
    kh, kw, cin, cout = kernel.shape
    wk = (phases - 1) * sf + kw
    out = jnp.zeros((kh, wk, cin, phases * cout), kernel.dtype)
    for p in range(phases):
        out = out.at[:, p * sf:p * sf + kw, :, p * cout:(p + 1) * cout].set(kernel)
    return out


def conv2d_fpack(x: jnp.ndarray, kernel: jnp.ndarray,
                 stride: Tuple[int, int], dilation: Tuple[int, int],
                 padding: Tuple[int, int], phases: int = 8,
                 preferred_element_type=jnp.float32) -> jnp.ndarray:
    """Equivalent of ``conv_general_dilated(x, kernel, stride,
    ((ph,ph),(pw,pw)), rhs_dilation=dilation, NHWC/HWIO)`` with the output's
    W axis computed P positions at a time in the channel dimension.

    Requires ``dilation[1] == 1`` (the disc only dilates time). Exact up to
    fp reduction order (tests/test_conv2d_pack.py).
    """
    assert dilation[1] == 1, 'F-phase packing requires no frequency dilation'
    st, sf = stride
    ph, pw = padding
    kh, kw, cin, cout = kernel.shape
    B, H, W, _ = x.shape
    w_out = (W + 2 * pw - kw) // sf + 1
    n_blocks = -(-w_out // phases)
    wk = (phases - 1) * sf + kw
    # input span needed: last block starts at (n_blocks-1)·P·sf - pw and
    # reads wk positions
    need = (n_blocks - 1) * phases * sf + wk - pw
    pr = max(0, need - W)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pw, pr), (0, 0)))
    kp = pack_kernel_fphase(kernel, sf, phases)
    y = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(st, phases * sf), padding=((ph, ph), (0, 0)),
        rhs_dilation=(dilation[0], 1),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=preferred_element_type)
    Bh, Ho, Wb, _ = y.shape
    y = y.reshape(Bh, Ho, Wb * phases, cout)
    return y[:, :, :w_out, :]
