"""Streaming (chunked) inference with carried state.

The flagship TPU-serving feature: chunk-by-chunk causal encode/decode whose
concatenated output is EXACTLY equal to the offline model's on the same
samples. The reference has no streaming path at all — its long-input story
is offline segment windowing + overlap-add (reference model.py:109-120,
utils.py:22-61); the causal 24 kHz model supports true streaming by
construction and this module exploits it.

How each layer streams (all math mirrors ops/conv.py so offline == streaming
bit-for-bit in f32):

- causal ``SConv1d`` (kernel K, stride s, dilation d): offline left-pads
  ``pt = (K-1)·d - (s-1)`` and the last window ends exactly at ``T + pt``
  when ``s | T`` — so a chunk needs only the previous ``pt`` *input* samples
  as carry. The first chunk reproduces offline's left padding (reflect by
  default) instead of a zero carry.
- ``SLSTM``: carry = per-layer (h, c).
- causal ``SConvTranspose1d`` (trim_right_ratio=1): the raw (untrimmed)
  transposed conv of a chunk is ``n·s + pt`` long (``pt = K - s``); the final
  ``pt`` samples are partial sums that overlap the next chunk's head. We
  carry them (bias excluded) and overlap-add; offline's right-trim == never
  emitting the final carry.

Constraints (asserted): causal model, ``normalize=False``,
``trim_right_ratio == 1``, encoder chunks a multiple of the hop (320 = 13.3
ms at 24 kHz), and the FIRST chunk long enough for every layer's left
padding (≥ ``min_first_chunk`` — 7 latent frames for the default
architecture, ~93 ms).
"""

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.seanet import SEANetDecoder, SEANetEncoder, _act
from .ops.conv import _weight_norm_kernel
from .ops.pad import pad1d

# ------------------------------------------------------------- layer specs


@dataclass(frozen=True)
class ConvSpec:
    name: str
    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    nested: bool = True     # SConv1d stores its NormConv1d under 'conv'

    @property
    def carry_len(self) -> int:
        return (self.kernel - 1) * self.dilation - (self.stride - 1)


@dataclass(frozen=True)
class ConvTrSpec:
    name: str
    in_ch: int
    out_ch: int
    kernel: int
    stride: int

    @property
    def carry_len(self) -> int:
        return self.kernel - self.stride


@dataclass(frozen=True)
class LstmSpec:
    name: str
    dim: int
    num_layers: int
    skip: bool = True


@dataclass(frozen=True)
class BlockSpec:
    name: str
    dim: int
    hidden: int
    kernel_sizes: Tuple[int, ...]
    dilations: Tuple[int, ...]
    true_skip: bool
    # in-block activation mirrors SEANetResnetBlock (models/seanet.py:55)
    activation: str = 'ELU'
    activation_params: Any = None

    def convs(self) -> List[ConvSpec]:
        out = []
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else self.hidden
            out_chs = self.dim if i == n - 1 else self.hidden
            out.append(ConvSpec(f'block_{2 * i + 1}', in_chs, out_chs, k,
                                stride=1, dilation=d))
        return out


@dataclass(frozen=True)
class ActSpec:
    name: str = 'ELU'
    params: Any = None


# --------------------------------------------------------------- layer fns


def _conv_kernel(p):
    if 'v' in p:
        return _weight_norm_kernel(p['v'], p['g'], axis=2)
    return p['kernel']


def _stream_conv(p, spec: ConvSpec, carry, x, dtype, first: bool,
                 pad_mode: str):
    """Causal SConv1d on a chunk. carry: [B, pt, in_ch] previous raw input."""
    pt = spec.carry_len
    if first:
        assert x.shape[1] > pt, (
            f'first chunk too short for {spec.name}: {x.shape[1]} <= pad {pt}')
        xc = pad1d(x, (pt, 0), mode=pad_mode)
    else:
        xc = jnp.concatenate([carry, x], axis=1) if pt else x
    kernel = _conv_kernel(p['conv'] if spec.nested else p)
    y = jax.lax.conv_general_dilated(
        xc.astype(dtype), kernel.astype(dtype),
        window_strides=(spec.stride,), padding='VALID',
        rhs_dilation=(spec.dilation,),
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        preferred_element_type=jnp.float32)
    bias = (p['conv'] if spec.nested else p).get('bias')
    if bias is not None:
        y = y + bias
    if pt:
        tail = jnp.concatenate([carry, x], axis=1) if not first else x
        new_carry = tail[:, tail.shape[1] - pt:, :]
    else:
        new_carry = carry
    return y, new_carry


def _stream_convtr(p, spec: ConvTrSpec, carry, x, dtype):
    """Causal SConvTranspose1d (trim_right_ratio=1) on a chunk.

    carry: [B, pt, out_ch] bias-free partial sums for the next chunk's head.
    Emits ``n·stride`` samples.
    """
    kernel = _conv_kernel(p)          # [k, out, in]
    k, s = spec.kernel, spec.stride
    pt = spec.carry_len
    n = x.shape[1]
    if s > 1 and k % s == 0:
        # depth-to-space MXU lowering (ops/conv.py:281-302), full raw output
        r = k // s
        K = kernel.reshape(r, s, spec.out_ch, spec.in_ch)[::-1]
        K = jnp.transpose(K, (0, 3, 1, 2)).reshape(r, spec.in_ch, s * spec.out_ch)
        xpad = jnp.pad(x, ((0, 0), (r - 1, r - 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xpad.astype(dtype), K.astype(dtype),
            window_strides=(1,), padding='VALID',
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32)
        B, Tq, _ = y.shape
        raw = y.reshape(B, Tq * s, spec.out_ch)   # [(n-1)s + k] == n·s + pt
    else:
        raw = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype), strides=(s,),
            padding='VALID', dimension_numbers=('NWC', 'WIO', 'NWC'),
            transpose_kernel=True)
    raw = raw.astype(jnp.float32)
    emit = raw[:, :n * s, :]
    if pt:
        emit = emit.at[:, :pt, :].add(carry)
        new_carry = raw[:, n * s:, :]
    else:
        new_carry = carry
    bias = p.get('bias')
    if bias is not None:
        emit = emit + bias
    return emit, new_carry


def _stream_lstm(p, spec: LstmSpec, carry, x, dtype):
    """SLSTM with explicit (h, c) carry: [L, B, H] each.

    Always computes in f32 regardless of the pipeline dtype, mirroring the
    offline SLSTM (ops/lstm.py:100-122): the carried cell state compounds
    bf16 rounding across chunks, so bf16 operands here would make streaming
    drift away from the offline model. ``dtype`` is accepted for interface
    uniformity with the conv ops and applied only to the output cast.
    """
    in_dtype = x.dtype
    hs, cs = carry
    x32 = x.astype(jnp.float32)
    y = x32
    new_h, new_c = [], []
    for layer in range(spec.num_layers):
        w_ih = p[f'w_ih_l{layer}'].astype(jnp.float32)
        w_hh = p[f'w_hh_l{layer}'].astype(jnp.float32)
        b = p[f'b_l{layer}'].astype(jnp.float32)
        x_proj = jnp.dot(y, w_ih) + b

        def step(hc, xp_t):
            h, c = hc
            gates = xp_t + jnp.dot(h, w_hh)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(step, (hs[layer].astype(jnp.float32),
                                         cs[layer].astype(jnp.float32)),
                                  jnp.swapaxes(x_proj, 0, 1))
        y = jnp.swapaxes(ys, 0, 1)
        new_h.append(h)
        new_c.append(c)
    if spec.skip:
        y = y + x32
    return y.astype(in_dtype), (jnp.stack(new_h), jnp.stack(new_c))


# ------------------------------------------------------------ op sequences


def _encoder_ops(enc: SEANetEncoder) -> List[Any]:
    ops: List[Any] = []
    idx, mult = 0, 1
    nf = enc.n_filters
    ops.append(ConvSpec(f'layer_{idx}', enc.channels, mult * nf,
                        enc.kernel_size))
    idx += 1
    for ratio in reversed(list(enc.ratios)):
        for j in range(enc.n_residual_layers):
            dim = mult * nf
            ops.append(BlockSpec(f'layer_{idx}', dim, dim // enc.compress,
                                 (enc.residual_kernel_size, 1),
                                 (enc.dilation_base ** j, 1), enc.true_skip,
                                 enc.activation, enc.activation_params))
            idx += 1
        ops.append(ActSpec(enc.activation, enc.activation_params))
        idx += 1
        ops.append(ConvSpec(f'layer_{idx}', mult * nf, mult * nf * 2,
                            ratio * 2, stride=ratio))
        idx += 1
        mult *= 2
    if enc.lstm:
        ops.append(LstmSpec(f'layer_{idx}', mult * nf, enc.lstm))
        idx += 1
    ops.append(ActSpec(enc.activation, enc.activation_params))
    idx += 1
    ops.append(ConvSpec(f'layer_{idx}', mult * nf, enc.dimension,
                        enc.last_kernel_size))
    return ops


def _decoder_ops(dec: SEANetDecoder) -> List[Any]:
    ops: List[Any] = []
    idx = 0
    nf = dec.n_filters
    mult = int(2 ** len(dec.ratios))
    ops.append(ConvSpec(f'layer_{idx}', dec.dimension, mult * nf,
                        dec.kernel_size))
    idx += 1
    if dec.lstm:
        ops.append(LstmSpec(f'layer_{idx}', mult * nf, dec.lstm))
        idx += 1
    for ratio in dec.ratios:
        ops.append(ActSpec(dec.activation, dec.activation_params))
        idx += 1
        ops.append(ConvTrSpec(f'layer_{idx}', mult * nf, mult * nf // 2,
                              ratio * 2, ratio))
        idx += 1
        for j in range(dec.n_residual_layers):
            dim = mult * nf // 2
            ops.append(BlockSpec(f'layer_{idx}', dim, dim // dec.compress,
                                 (dec.residual_kernel_size, 1),
                                 (dec.dilation_base ** j, 1), dec.true_skip,
                                 dec.activation, dec.activation_params))
            idx += 1
        mult //= 2
    ops.append(ActSpec(dec.activation, dec.activation_params))
    idx += 1
    ops.append(ConvSpec(f'layer_{idx}', nf, dec.channels,
                        dec.last_kernel_size))
    return ops


# ----------------------------------------------------------- the streamers


class StreamingSEANet:
    """Streaming interpreter over a causal SEANetEncoder/SEANetDecoder.

    Pure/jittable: ``apply(params, state, x, first=...)`` → ``(y, state)``.
    ``first=True`` reproduces offline's left padding instead of using the
    (zero) carry; jit caches one program per (chunk shape, first).
    """

    def __init__(self, module):
        assert module.causal, 'streaming requires a causal model'
        if isinstance(module, SEANetEncoder):
            self.ops = _encoder_ops(module)
        else:
            assert isinstance(module, SEANetDecoder)
            assert module.trim_right_ratio == 1.0, \
                'streaming decoder requires trim_right_ratio == 1'
            # final_activation is stateless — applied verbatim in apply()
            self.ops = _decoder_ops(module)
        self.module = module
        self.dtype = module.dtype
        self.pad_mode = module.pad_mode
        self._final_act = None
        if isinstance(module, SEANetDecoder) and module.final_activation:
            self._final_act = _act(module.final_activation,
                                   module.final_activation_params or {})

    @property
    def min_first_chunk(self) -> int:
        """Minimum FIRST-chunk length (in this module's input timebase) so
        every conv's left pad fits inside the chunk (reflect constraint)."""
        need = 1
        scale = 1  # cumulative downsampling factor so far
        for op in self.ops:
            if isinstance(op, ConvSpec):
                need = max(need, (op.carry_len + 1) * scale)
                scale *= op.stride
            elif isinstance(op, BlockSpec):
                for c in op.convs():
                    need = max(need, (c.carry_len + 1) * scale)
            elif isinstance(op, ConvTrSpec):
                scale = max(1, scale // op.stride)
        return need

    def init_state(self, batch_size: int) -> Dict[str, Any]:
        state: Dict[str, Any] = {}
        for op in self.ops:
            if isinstance(op, ConvSpec):
                state[op.name] = jnp.zeros(
                    (batch_size, op.carry_len, op.in_ch), jnp.float32)
            elif isinstance(op, ConvTrSpec):
                state[op.name] = jnp.zeros(
                    (batch_size, op.carry_len, op.out_ch), jnp.float32)
            elif isinstance(op, LstmSpec):
                # distinct h/c buffers: the fused roundtrip donates the state
                # pytree, and XLA rejects donating one buffer twice
                state[op.name] = (
                    jnp.zeros((op.num_layers, batch_size, op.dim), jnp.float32),
                    jnp.zeros((op.num_layers, batch_size, op.dim), jnp.float32))
            elif isinstance(op, BlockSpec):
                state[op.name] = {
                    c.name: jnp.zeros((batch_size, c.carry_len, c.in_ch),
                                      jnp.float32)
                    for c in op.convs()}
        return state

    def apply(self, params, state, x, first: bool = False):
        new_state = dict(state)
        for op in self.ops:
            if isinstance(op, ConvSpec):
                x, new_state[op.name] = _stream_conv(
                    params[op.name], op, state[op.name], x, self.dtype,
                    first, self.pad_mode)
            elif isinstance(op, ConvTrSpec):
                x, new_state[op.name] = _stream_convtr(
                    params[op.name], op, state[op.name], x, self.dtype)
            elif isinstance(op, LstmSpec):
                x, new_state[op.name] = _stream_lstm(
                    params[op.name], op, state[op.name], x, self.dtype)
            elif isinstance(op, BlockSpec):
                p = params[op.name]
                act = _act(op.activation, op.activation_params
                           or {'alpha': 1.0})
                bstate = dict(state[op.name])
                y = x
                for c in op.convs():
                    y = act(y)
                    y, bstate[c.name] = _stream_conv(
                        p[c.name], c, state[op.name][c.name], y, self.dtype,
                        first, self.pad_mode)
                if op.true_skip:
                    shortcut = x
                else:
                    sc = ConvSpec('shortcut', op.dim, op.dim, 1)
                    shortcut, _ = _stream_conv(
                        p['shortcut'], sc,
                        jnp.zeros((x.shape[0], 0, op.dim), jnp.float32),
                        x, self.dtype, first, self.pad_mode)
                x = shortcut + y
                new_state[op.name] = bstate
            elif isinstance(op, ActSpec):
                x = _act(op.name, op.params or {'alpha': 1.0})(x)
        if self._final_act is not None:
            x = self._final_act(x)
        return x, new_state


class StreamingCodec:
    """Chunked encode/decode over an ``EncodecModel`` (causal, unnormalized).

    Usage::

        codec = StreamingCodec(model)                 # bandwidth already set
        enc_state, dec_state = codec.init_state(batch_size=1)
        codes, enc_state = codec.encode_chunk(variables, enc_state, wav, first=True)
        wav_out, dec_state = codec.decode_chunk(variables, dec_state, codes, first=True)
        # ... subsequent chunks with first=False

    ``wav`` chunks are ``[B, C, T]`` with ``T % hop == 0`` (hop = 320 → one
    latent frame per 13.3 ms at 24 kHz); the first chunk must be ≥
    ``min_first_chunk_samples``. Concatenated outputs equal the offline
    model's exactly.
    """

    def __init__(self, model):
        assert not model.normalize, \
            'streaming requires audio_normalize=False (per-segment scales ' \
            'are an offline concept)'
        assert model.segment is None, 'streaming replaces segment windowing'
        self.model = model
        self.hop = model.encoder.hop_length
        self.encoder = StreamingSEANet(model.encoder)
        self.decoder = StreamingSEANet(model.decoder)
        self._enc_jit = {}
        self._dec_jit = {}
        self._rt_jit = {}

    @property
    def min_first_chunk_samples(self) -> int:
        enc_need = self.encoder.min_first_chunk
        dec_need = self.decoder.min_first_chunk * self.hop
        need = max(enc_need, dec_need)
        return -(-need // self.hop) * self.hop

    def init_state(self, batch_size: int):
        return (self.encoder.init_state(batch_size),
                self.decoder.init_state(batch_size))

    def encode_chunk(self, variables, state, wav, first: bool = False):
        """wav [B, C, T] (T % hop == 0) → (codes [B, K, T/hop], state)."""
        assert wav.shape[-1] % self.hop == 0, \
            f'chunk length {wav.shape[-1]} must be a multiple of {self.hop}'
        fn = self._enc_jit.get(first)
        if fn is None:
            def _fn(params, qstate, state, x, n_q):
                from .prepare import dequantize_weights
                params = dequantize_weights(params)  # no-op on plain params
                emb, new_state = self.encoder.apply(params, state, x,
                                                    first=first)
                codes = self.model._rvq_encode_impl(qstate, emb, n_q)
                return jnp.transpose(codes, (1, 0, 2)), new_state
            fn = jax.jit(_fn, static_argnums=4)
            self._enc_jit[first] = fn
        n_q = self.model.quantizer.num_quantizers_for_bandwidth(
            self.model.frame_rate, self.model.bandwidth)
        return fn(variables['params']['encoder'], variables['quantizer'],
                  state, jnp.swapaxes(wav, 1, 2), n_q)

    def decode_chunk(self, variables, state, codes, first: bool = False):
        """codes [B, K, t] → (wav [B, C, t*hop], state)."""
        fn = self._dec_jit.get(first)
        if fn is None:
            from .quantization.core_vq import rvq_decode

            def _fn(params, qstate, state, codes):
                from .prepare import dequantize_weights
                params = dequantize_weights(params)  # no-op on plain params
                emb = rvq_decode(qstate, jnp.transpose(codes, (1, 0, 2)))
                y, new_state = self.decoder.apply(params, state, emb,
                                                  first=first)
                return jnp.swapaxes(y, 1, 2), new_state
            fn = jax.jit(_fn)
            self._dec_jit[first] = fn
        return fn(variables['params']['decoder'], variables['quantizer'],
                  state, codes)

    def roundtrip_chunk(self, variables, enc_state, dec_state, wav,
                        first: bool = False):
        """Fused low-latency serving path: encode + quantize + dequantize +
        decode of one chunk in ONE jitted program with DONATED carry state
        (VERDICT r2 item 7 — the 2-call path paid two dispatch fences and
        ~60 kernels of launch overhead at 320-sample chunks while the chip
        sat idle; donation lets XLA update the conv/LSTM carries in place).

        wav [B, C, T] (T % hop == 0) →
        (wav_out [B, C, T], codes [B, K, T/hop], enc_state, dec_state).

        Numerically identical to encode_chunk → decode_chunk (asserted in
        tests/test_streaming.py) — same layer math, one program.
        """
        assert wav.shape[-1] % self.hop == 0, \
            f'chunk length {wav.shape[-1]} must be a multiple of {self.hop}'
        fn = self._rt_jit.get(first)
        if fn is None:
            from .quantization.core_vq import rvq_decode

            def _fn(params, qstate, enc_state, dec_state, x, n_q):
                from .prepare import dequantize_weights
                params = dequantize_weights(params)  # no-op on plain params
                emb, new_enc = self.encoder.apply(params['encoder'], enc_state,
                                                  x, first=first)
                codes = self.model._rvq_encode_impl(qstate, emb, n_q)  # [K,B,t]
                deq = rvq_decode(qstate, codes)
                y, new_dec = self.decoder.apply(params['decoder'], dec_state,
                                                deq, first=first)
                return (jnp.swapaxes(y, 1, 2),
                        jnp.transpose(codes, (1, 0, 2)), new_enc, new_dec)

            # donate the carry states (argnums 2, 3): they are consumed and
            # replaced every chunk, so XLA reuses their buffers in place
            fn = jax.jit(_fn, static_argnums=5, donate_argnums=(2, 3))
            self._rt_jit[first] = fn
        n_q = self.model.quantizer.num_quantizers_for_bandwidth(
            self.model.frame_rate, self.model.bandwidth)
        return fn(variables['params'], variables['quantizer'],
                  enc_state, dec_state, jnp.swapaxes(wav, 1, 2), n_q)
