"""Normalized 1-D/2-D convolutions with streamable (causal/asymmetric) padding.

TPU-first rebuild of /root/reference/modules/conv.py:
- Layout is NTC / NHWC (channels-last) — the layout XLA:TPU tiles onto the
  MXU — instead of torch's NCT/NCHW.
- ``weight_norm`` is an explicit parametrization (params ``v`` and ``g``,
  kernel = g * v / ||v||) applied at parameter level, matching torch
  ``nn.utils.weight_norm(dim=0)`` semantics so released torch checkpoints
  convert numerically (conv.py:25-34).
- Padding amounts are compile-time constants derived from static shapes
  (conv.py:195-210, 230-252), so everything jits with static shapes.

Supported norms (CONV_NORMALIZATIONS at conv.py:21): ``none``,
``weight_norm``, ``time_group_norm``, ``layer_norm``, ``spectral_norm``
(stateless power iteration — see _spectral_norm_kernel). ``time_layer_norm``
is accepted by the reference's name set but wired to nothing there either.
"""

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pad import get_extra_padding_for_conv1d, pad1d, unpad1d


def _uniform_init(bound: float):
    """torch-style symmetric uniform init U(-bound, bound)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def _preferred(dtype):
    """Accumulation/output dtype for conv/einsum calls.

    f32 mode: accumulate and emit f32 (``preferred_element_type``).
    Reduced-precision mode (the end-to-end bf16 activation pipeline):
    ``None`` — operands and output keep the compute dtype uniformly. This
    is required for the backward pass too: lax conv/dot *transpose* rules
    reject mixed operand dtypes, so promoting outputs to f32 would feed an
    f32 cotangent against bf16 saved operands and fail to differentiate.
    The MXU still accumulates bf16 products in f32 internally; only the
    stored activations are rounded."""
    return jnp.float32 if dtype == jnp.float32 else None

CONV_NORMALIZATIONS = frozenset(['none', 'weight_norm', 'spectral_norm',
                                 'time_layer_norm', 'layer_norm', 'time_group_norm'])


def _spectral_norm_kernel(kernel: jnp.ndarray, u: jnp.ndarray,
                          axis: int = -1, n_iter: int = 3) -> jnp.ndarray:
    """kernel / σ(kernel) with σ from power iteration over the
    ``[out, everything-else]`` matricization (torch spectral_norm semantics).

    Deviation from torch (documented): torch carries ``u`` as a mutable
    buffer updated every forward; here ``u`` is a fixed random param and the
    iteration runs statelessly each call — same fixed point, no hidden state
    (no shipped EnCodec config uses spectral_norm; provided for parity of the
    CONV_NORMALIZATIONS surface, conv.py:21-22).
    """
    km = jnp.moveaxis(kernel, axis, -1)
    out_dim = km.shape[-1]
    w = km.reshape(-1, out_dim).T              # [out, rest]
    for _ in range(n_iter):
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (w @ v)
    return kernel / sigma


def _weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """kernel = g * v / ||v||, norm taken over all axes except ``axis``.

    ``axis`` indexes the dimension kept per-norm (torch weight_norm dim=0 ==
    out_channels for Conv, in_channels for ConvTranspose).
    """
    reduce_axes = tuple(i for i in range(v.ndim) if i != axis)
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=reduce_axes, keepdims=True))
    return g * v / norm


class NormConv1d(nn.Module):
    """Conv1d + normalization with a uniform interface (conv.py:108-122).

    Input/output layout: ``[B, T, C]``. The conv itself is VALID — callers
    (``SConv1d``) do the padding.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = 'none'
    norm_kwargs: Dict[str, Any] = None
    layout: str = 'NTC'   # 'NCT': time-on-lanes tap-einsum lowering
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.norm in CONV_NORMALIZATIONS
        kshape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        fan_in = self.in_channels // self.groups * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        kernel_init = _uniform_init(bound)

        if self.norm == 'weight_norm':
            v = self.param('v', kernel_init, kshape, jnp.float32)
            g = self.param('g', lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, v.shape[-1]), axis=0).reshape(shape),
                (1, 1, self.out_channels))
            kernel = _weight_norm_kernel(v, g, axis=2)
        elif self.norm == 'spectral_norm':
            kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
            u = self.param('u', nn.initializers.normal(1.0),
                           (self.out_channels,))
            kernel = _spectral_norm_kernel(kernel, u, axis=2)
        elif self.norm in ('none', 'time_group_norm', 'layer_norm',
                           'time_layer_norm'):
            kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
        else:
            raise NotImplementedError(
                f"norm '{self.norm}' is not supported")

        if self.layout == 'NCT':
            # Narrow-channel fast path (docs/PERF_NOTES.md "NCT-layout
            # narrow-channel stages"): with C < 128 the (8,128) HBM tiling
            # pads NTC tensors up to 4-8× on the lane dim; computing in
            # [B, C, T] keeps the lanes dense (time-minor). The K-tap VALID
            # conv decomposes into K shifted [C_out, C_in] einsums — MXU
            # matmuls with T on lanes. Measured 4× on the C=32 resblock.
            assert self.stride == 1 and self.groups == 1, \
                'NCT lowering supports stride=1, groups=1 convs'
            assert self.norm in ('none', 'weight_norm'), \
                'NCT lowering supports none/weight_norm'
            w_oim = jnp.transpose(kernel, (2, 1, 0))  # [out, in, k]
            t_out = x.shape[2] - (self.kernel_size - 1) * self.dilation
            xd = x.astype(self.dtype)
            y = None
            for m in range(self.kernel_size):
                o = m * self.dilation
                term = jnp.einsum(
                    'oi,bit->bot', w_oim[:, :, m].astype(self.dtype),
                    jax.lax.slice_in_dim(xd, o, o + t_out, axis=2),
                    preferred_element_type=_preferred(self.dtype))
                y = term if y is None else y + term
            if self.use_bias:
                bias = self.param('bias', _uniform_init(bound),
                                  (self.out_channels,), jnp.float32)
                y = y + bias[:, None].astype(y.dtype)
            return y

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride,), padding='VALID',
            rhs_dilation=(self.dilation,),
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            feature_group_count=self.groups,
            preferred_element_type=_preferred(self.dtype))
        if self.use_bias:
            bias = self.param('bias', _uniform_init(bound),
                              (self.out_channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        if self.norm == 'time_group_norm':
            if self.causal:
                raise ValueError("GroupNorm doesn't support causal evaluation.")
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             dtype=jnp.float32)(y).astype(self.dtype)
        elif self.norm == 'layer_norm':
            # channels-last LayerNorm over C only (fixes the reference's
            # ConvLayerNorm returning None, norm.py:28)
            y = nn.LayerNorm(epsilon=1e-5,
                             dtype=jnp.float32)(y).astype(self.dtype)
        return y


class NormConv2d(nn.Module):
    """Conv2d + normalization (conv.py:125-139). Layout ``[B, H, W, C]``."""
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    norm: str = 'none'
    dtype: Any = jnp.float32
    fpack: int = 0   # >1: F-phase output-packed lowering (ops/conv2d_pack.py)
                     # — packs `fpack` output W positions into the channel
                     # dim so narrow-channel convs fill the MXU lanes;
                     # numerically equal to the plain conv (fp order aside)
    fpack_dx: bool = True   # custom phase-packed input-gradient for the
                            # fpack'd conv (conv2d_fpack_dx) — same math
                            # re-associated; False falls back to autodiff
    pallas_v2: bool = False  # route eligible 32-channel convs through the
                             # pipelined fpack-im2col Pallas kernel
                             # (ops/pallas_conv2d_v2.py); forward + dx on
                             # the MXU-dense kernel, dW via XLA

    @nn.compact
    def __call__(self, x):
        assert self.norm in CONV_NORMALIZATIONS
        kh, kw = self.kernel_size
        kshape = (kh, kw, self.in_channels, self.out_channels)
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel_init = _uniform_init(bound)
        if self.norm == 'weight_norm':
            v = self.param('v', kernel_init, kshape, jnp.float32)
            g = self.param('g', lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, v.shape[-1]), axis=0).reshape(shape),
                (1, 1, 1, self.out_channels))
            kernel = _weight_norm_kernel(v, g, axis=3)
        elif self.norm == 'spectral_norm':
            kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
            u = self.param('u', nn.initializers.normal(1.0),
                           (self.out_channels,))
            kernel = _spectral_norm_kernel(kernel, u, axis=3)
        elif self.norm in ('none', 'time_group_norm', 'layer_norm',
                           'time_layer_norm'):
            kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
        else:
            raise NotImplementedError(f"norm '{self.norm}' unsupported")

        ph, pw = self.padding
        v2_ok = (self.pallas_v2 and self.fpack > 1 and self.stride[0] == 1
                 and self.dilation[1] == 1 and self.in_channels >= 32
                 and self.out_channels >= 32
                 and (kh - 1) * self.dilation[0] >= ph)
        if v2_ok:
            # the packed taps must also fit the kernel's padded tap axis
            from .pallas_conv2d_v2 import taps_fit
            v2_ok = taps_fit(self.fpack, self.stride[1], kw)
        if v2_ok:
            from .pallas_conv2d_v2 import conv2d_v2_op
            y = conv2d_v2_op(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.stride, self.dilation, self.padding, self.fpack)
        elif self.fpack > 1 and self.dilation[1] == 1:
            from .conv2d_pack import conv2d_fpack
            y = conv2d_fpack(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.stride, self.dilation, self.padding, phases=self.fpack,
                preferred_element_type=_preferred(self.dtype),
                custom_dx=None if self.fpack_dx else False)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.stride, padding=((ph, ph), (pw, pw)),
                rhs_dilation=self.dilation,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=_preferred(self.dtype))
        if self.use_bias:
            bias = self.param('bias', _uniform_init(bound),
                              (self.out_channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        if self.norm == 'time_group_norm':
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             dtype=jnp.float32)(y).astype(self.dtype)
        return y


class SConv1d(nn.Module):
    """Conv1d with built-in causal or asymmetric streamable padding
    (conv.py:175-210).

    ``padding_total = (K-1)*d - (s-1)``; extra end padding keeps the last
    window full so decode can restore exactly ``ceil(T/stride)`` frames.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = 'none'
    norm_kwargs: Dict[str, Any] = None
    pad_mode: str = 'reflect'
    layout: str = 'NTC'   # 'NCT' expects/returns [B, C, T] (narrow-C fast path)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        time_axis = 2 if self.layout == 'NCT' else 1
        length = x.shape[time_axis]
        padding_total = (self.kernel_size - 1) * self.dilation - (self.stride - 1)
        extra_padding = get_extra_padding_for_conv1d(
            length, self.kernel_size, self.stride, padding_total)
        if self.causal:
            x = pad1d(x, (padding_total, extra_padding), mode=self.pad_mode,
                      axis=time_axis)
        else:
            padding_right = padding_total // 2
            padding_left = padding_total - padding_right
            x = pad1d(x, (padding_left, padding_right + extra_padding),
                      mode=self.pad_mode, axis=time_axis)
        return NormConv1d(self.in_channels, self.out_channels, self.kernel_size,
                          stride=self.stride, dilation=self.dilation,
                          groups=self.groups, use_bias=self.use_bias,
                          causal=self.causal, norm=self.norm, dtype=self.dtype,
                          layout=self.layout, name='conv')(x)


class SConvTranspose1d(nn.Module):
    """ConvTranspose1d trimming ``padding_total = K - s`` after the op
    (conv.py:213-252). Causal mode trims ``ceil(pt * trim_right_ratio)`` from
    the right; non-causal splits asymmetrically.

    Weight-norm parity: torch normalizes ConvTranspose weights per *input*
    channel (weight_norm dim=0 on a ``[in, out, k]`` weight); we store
    ``v: [k, out, in]`` and keep the norm over ``(k, out)``.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = 'none'
    trim_right_ratio: float = 1.
    norm_kwargs: Dict[str, Any] = None
    layout: str = 'NTC'   # 'NCT' expects/returns [B, C, T] (narrow-C fast path)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.causal or self.trim_right_ratio == 1., \
            "`trim_right_ratio` != 1.0 only makes sense for causal convolutions"
        assert self.norm in CONV_NORMALIZATIONS
        kshape = (self.kernel_size, self.out_channels, self.in_channels)
        fan_in = self.out_channels * self.kernel_size  # torch convT fan-in rule
        bound = 1.0 / math.sqrt(fan_in)
        kernel_init = _uniform_init(bound)
        if self.norm == 'weight_norm':
            v = self.param('v', kernel_init, kshape, jnp.float32)
            g = self.param('g', lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, v.shape[-1]), axis=0).reshape(shape),
                (1, 1, self.in_channels))
            kernel = _weight_norm_kernel(v, g, axis=2)
        elif self.norm == 'spectral_norm':
            kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
            # torch spectral_norm uses dim=1 (out) for ConvTranspose — our
            # layout [k, out, in] has out at axis 1
            u = self.param('u', nn.initializers.normal(1.0),
                           (self.out_channels,))
            kernel = _spectral_norm_kernel(kernel, u, axis=1)
        elif self.norm in ('none', 'time_group_norm', 'layer_norm',
                           'time_layer_norm'):
            kernel = self.param('kernel', kernel_init, kshape, jnp.float32)
        else:
            raise NotImplementedError(f"norm '{self.norm}' unsupported")

        k, s = self.kernel_size, self.stride
        if self.layout == 'NCT':
            # Narrow-channel fast path: the depth-to-space lowering expressed
            # as r tap einsums in [B, C, T] (time on lanes). Same output as
            # the NTC branch below; measured ~1.4× on the 64→32 upsample.
            assert s > 1 and k % s == 0, 'NCT conv-transpose needs k = r·s'
            assert self.norm in ('none', 'weight_norm'), \
                'NCT lowering supports none/weight_norm'
            r = k // s
            Q = x.shape[2]
            K4 = kernel.reshape(r, s, self.out_channels, self.in_channels)[::-1]
            Kt = jnp.transpose(K4, (0, 3, 2, 1))   # [r, in, out, s]
            xp = jnp.pad(x, ((0, 0), (0, 0), (r - 1, r - 1))).astype(self.dtype)
            qout = Q + r - 1
            y = None
            for j in range(r):
                term = jnp.einsum(
                    'iop,biq->bopq', Kt[j].astype(self.dtype),
                    jax.lax.slice_in_dim(xp, j, j + qout, axis=2),
                    preferred_element_type=_preferred(self.dtype))
                y = term if y is None else y + term
            # [B, out, s, qout] → [B, out, qout, s] → [B, out, qout·s]
            y = jnp.swapaxes(y, 2, 3).reshape(
                x.shape[0], self.out_channels, qout * s)
            if self.use_bias:
                bias = self.param('bias', _uniform_init(bound),
                                  (self.out_channels,), jnp.float32)
                y = y + bias[:, None].astype(y.dtype)
            padding_total = k - s
            if self.causal:
                padding_right = math.ceil(padding_total * self.trim_right_ratio)
                padding_left = padding_total - padding_right
            else:
                padding_right = padding_total // 2
                padding_left = padding_total - padding_right
            end = y.shape[2] - padding_right
            return y[:, :, padding_left:end]

        if s > 1 and k % s == 0:
            # TPU-native lowering: a stride-s transposed conv with k = r·s is
            # exactly a stride-1 conv producing s·C_out channels followed by
            # depth-to-space:  y[s·q + p] = Σ_m x[q−m] · W[s·m + p]
            # (phase-major channel grouping). This replaces XLA's
            # input-dilated conv_transpose with one dense MXU matmul of
            # contraction r·C_in — several times faster for the EnCodec
            # upsample layers (k = 2s).
            r = k // s
            # kernel [k, out, in] → K[j, ci, p·out + co] = W[s·(r−1−j)+p, co, ci]
            K = kernel.reshape(r, s, self.out_channels, self.in_channels)
            K = K[::-1]                                  # j = r-1-m
            K = jnp.transpose(K, (0, 3, 1, 2))           # [r, in, s, out]
            K = K.reshape(r, self.in_channels, s * self.out_channels)
            xpad = jnp.pad(x, ((0, 0), (r - 1, r - 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xpad.astype(self.dtype), K.astype(self.dtype),
                window_strides=(1,), padding='VALID',
                dimension_numbers=('NWC', 'WIO', 'NWC'),
                preferred_element_type=_preferred(self.dtype))
            B, Tq, _ = y.shape
            y = y.reshape(B, Tq * s, self.out_channels)
        else:
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), kernel.astype(self.dtype),
                strides=(self.stride,), padding='VALID',
                dimension_numbers=('NWC', 'WIO', 'NWC'),
                transpose_kernel=True)
        y = y.astype(_preferred(self.dtype) or self.dtype)
        if self.use_bias:
            bias = self.param('bias', _uniform_init(bound),
                              (self.out_channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        if self.norm == 'time_group_norm':
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             dtype=jnp.float32)(y).astype(self.dtype)

        padding_total = self.kernel_size - self.stride
        if self.causal:
            padding_right = math.ceil(padding_total * self.trim_right_ratio)
            padding_left = padding_total - padding_right
        else:
            padding_right = padding_total // 2
            padding_left = padding_total - padding_right
        return unpad1d(y, (padding_left, padding_right))
