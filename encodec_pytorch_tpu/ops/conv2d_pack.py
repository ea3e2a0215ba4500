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
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ['pack_kernel_fphase', 'conv2d_fpack', 'conv2d_fpack_dx']


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


def _conv2d_fpack_raw(x: jnp.ndarray, kernel: jnp.ndarray,
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
    # asymmetric (pw, pr) padding folded into the conv itself — an explicit
    # jnp.pad materializes the padded activation in HBM (and showed up as
    # pad ops + layout copies in the round-3 profiler trace)
    kp = pack_kernel_fphase(kernel, sf, phases)
    y = jax.lax.conv_general_dilated(
        x, kp, window_strides=(st, phases * sf), padding=((ph, ph), (pw, pr)),
        rhs_dilation=(dilation[0], 1),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=preferred_element_type)
    Bh, Ho, Wb, _ = y.shape
    y = y.reshape(Bh, Ho, Wb * phases, cout)
    return y[:, :, :w_out, :]


def _dx_combined_kernel(kernel: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Transposed+flipped phase kernel for the input gradient:
    ``[kh, kw, Cin, Cout]`` → ``[kh, w0, Cout, sf·Cin]`` with
    ``w0 = ceil(kw/sf)``.

    dxpad[sf·m + r] = Σ_j g[m−j] · Kᵀ[sf·j + r] — phase r's taps live
    right-aligned in a shared width-``w0`` window (out-channel block r), so
    all sf phases of dx come out of ONE stride-1 conv over the cotangent.
    """
    kh, kw, cin, cout = kernel.shape
    w0 = -(-kw // sf)
    ktf = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # [kh,kw,Co,Ci]
    blocks = []
    for r in range(sf):
        cols = []
        for jf in range(w0):
            idx = kw - 1 - sf * (w0 - 1 - jf) - r
            cols.append(ktf[:, idx] if 0 <= idx < kw
                        else jnp.zeros_like(ktf[:, 0]))
        blocks.append(jnp.stack(cols, axis=1))
    return jnp.concatenate(blocks, axis=3)  # [kh, w0, Cout, sf*Cin]


def conv2d_fpack_dx(g: jnp.ndarray, kernel: jnp.ndarray,
                    stride: Tuple[int, int], dilation: Tuple[int, int],
                    padding: Tuple[int, int], x_shape: Tuple[int, ...],
                    phases: int = 2,
                    preferred_element_type=None) -> jnp.ndarray:
    """Input gradient of the (packed or plain — same math) conv, computed as
    a single phase-packed stride-1 conv over the cotangent ``g``.

    XLA's conv transpose rule evaluates dx as an input-dilated conv whose
    output has only Cin lanes; this formulation packs the sf F-stride phases
    of dx into the channel dim (sf·Cin lanes) and F-phase-packs ``phases``
    output positions on top — measured 3× faster than the plain-conv
    autodiff dx at the disc's mid-conv shapes (PERF_NOTES round 3).

    Requires time-stride 1, no F dilation, and ``(kh−1)·dt ≥ ph`` (true for
    every disc conv). Exact up to fp reduction order.
    """
    return dx_geometry(_conv2d_fpack_raw, g, kernel, stride, dilation,
                       padding, x_shape, phases,
                       preferred_element_type=preferred_element_type)


def dx_geometry(conv_fn, g, kernel, stride, dilation, padding, x_shape,
                phases, **conv_kwargs):
    """The dx bookkeeping shared by every backend (XLA fpack here, the
    Pallas v2 kernel in pallas_conv2d_v2.py): pad the cotangent, run ONE
    stride-1 conv with the combined ``[kh, ceil(kw/sf), Cout, sf*Cin]``
    kernel, unpack the sf phase lanes back onto the F axis. Keeping this
    in one place means a fix to the geometry (row count M, the
    (w0−1, M−w_out) padding, eligibility asserts) applies to every
    backward path at once."""
    st, sf = stride
    dt, df = dilation
    assert st == 1 and df == 1
    ph, pw = padding
    kh, kw, cin, cout = kernel.shape
    B, H, W, _ = x_shape
    w_out = (W + 2 * pw - kw) // sf + 1
    w0 = -(-kw // sf)
    pt = (kh - 1) * dt - ph
    assert pt >= 0, 'dx formulation needs (kh-1)*dt >= ph'
    kc = _dx_combined_kernel(kernel, sf)
    M = (W + 2 * pw - 1) // sf + 1        # dxpad phase-rows needed
    gp = jnp.pad(g, ((0, 0), (0, 0), (w0 - 1, max(0, M - w_out)), (0, 0)))
    d = conv_fn(gp, kc, (1, 1), (dt, 1), (pt, 0), phases=phases,
                **conv_kwargs)
    d = d[:, :, :M]
    d = d.reshape(B, H, M, sf, cin).reshape(B, H, M * sf, cin)
    return d[:, :, pw:pw + W]


def _dx_phase_count(sf: int, cin: int, kw: int) -> int:
    """Pick the dx packing factor: fill ≥128 lanes if the FLOP overhead
    ``((P−1)·sf + w0·sf)/kw`` stays ≤ ~2×, else the best admissible P."""
    w0 = -(-kw // sf)
    best = 1
    for p in (2, 4, 8):
        flop_factor = ((p - 1) + w0) * sf / kw
        if flop_factor <= 2.0:
            best = p
            if p * sf * cin >= 128:
                break
    return best


def _custom_dx_eligible(stride, dilation, padding, kh) -> bool:
    return (stride[0] == 1 and dilation[1] == 1
            and (kh - 1) * dilation[0] >= padding[0])


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _conv2d_fpack_cdx(x, kernel, stride, dilation, padding, phases,
                      preferred_element_type):
    return _conv2d_fpack_raw(x, kernel, stride, dilation, padding, phases,
                             preferred_element_type)


def _cdx_fwd(x, kernel, stride, dilation, padding, phases,
             preferred_element_type):
    y = _conv2d_fpack_raw(x, kernel, stride, dilation, padding, phases,
                          preferred_element_type)
    return y, (x, kernel)


def _cdx_bwd(stride, dilation, padding, phases, preferred_element_type,
             res, g):
    x, kernel = res
    # dW: autodiff of the packed conv wrt the kernel — the contraction over
    # B·H·W is already MXU-shaped and measured faster than the plain-conv dW.
    _, kvjp = jax.vjp(
        lambda kk: _conv2d_fpack_raw(x, kk, stride, dilation, padding,
                                     phases, preferred_element_type), kernel)
    (dk,) = kvjp(g)
    p = _dx_phase_count(stride[1], kernel.shape[2], kernel.shape[1])
    dx = conv2d_fpack_dx(g, kernel, stride, dilation, padding, x.shape,
                         phases=p,
                         preferred_element_type=preferred_element_type)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


_conv2d_fpack_cdx.defvjp(_cdx_fwd, _cdx_bwd)


def conv2d_fpack(x: jnp.ndarray, kernel: jnp.ndarray,
                 stride: Tuple[int, int], dilation: Tuple[int, int],
                 padding: Tuple[int, int], phases: int = 8,
                 preferred_element_type=jnp.float32,
                 custom_dx: Optional[bool] = None) -> jnp.ndarray:
    """Public entry: the F-phase packed conv, with a custom phase-packed
    input-gradient (`conv2d_fpack_dx`) when the layer qualifies.

    ``custom_dx``: None = auto (on whenever the layer is eligible — the
    round-3 sweep measured the custom dx faster on 13/14 production disc
    layer shapes, including the low-lane entry conv), True/False to force.
    The custom VJP is numerically the same conv math re-associated — exact
    to fp reduction order; covered by tests/test_conv2d_pack.py
    gradient-parity cases.
    """
    kh, kw, cin, _ = kernel.shape
    eligible = _custom_dx_eligible(stride, dilation, padding, kh)
    if custom_dx is None:
        custom_dx = eligible
    elif custom_dx and not eligible:
        # a forced custom dx must be loud, not silently downgraded —
        # benchmarks/bisections would otherwise attribute results to the
        # wrong backward implementation
        raise ValueError(
            f'custom_dx=True forced on an ineligible layer (stride={stride},'
            f' dilation={dilation}, padding={padding}, kh={kh}); the '
            'phase-packed dx needs stride[0]==1 and (kh-1)*dil[0] >= pad[0]')
    if custom_dx:
        return _conv2d_fpack_cdx(x, kernel, stride, dilation, padding,
                                 phases, preferred_element_type)
    return _conv2d_fpack_raw(x, kernel, stride, dilation, padding, phases,
                             preferred_element_type)
