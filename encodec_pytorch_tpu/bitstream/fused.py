"""Fully on-device LM entropy codec: LM step + CDF build + arithmetic
coding fused into ONE jitted program (a ``lax.scan`` over timesteps).

The host paths (`compress._compress_frame_lm` / `_decompress_frame_lm`)
dispatch one LM step per timestep; the decode side must BLOCK on a
device->host probability fetch every step (the next input is the symbol it
just decoded), which costs a full host<->device round-trip x T — the
measured LM decompress was 0.4x real-time (docs/PERF_NOTES.md). This module
removes every round-trip: the arithmetic coder itself runs on the TPU, so
an entire frame encodes/decodes in ONE device call.

Design notes (why this is safe):

- **Self-consistency by construction.** Encode and decode are the SAME
  compiled program, switched by a traced mode flag inside ``lax.cond`` —
  the LM forward and the CDF quantization sit UPSTREAM of the cond, so the
  probabilities both modes see are bit-identical by construction (the same
  HLO, not merely the same math). This sidesteps the cross-program fusion
  divergence that forbids mixing a scan-based encoder with a step-based
  decoder (see compress.LM.probas_teacher_forced). Streams written by the
  fused encoder carry an extra ``lmv`` metadata key so the decoder picks
  the matching probability model automatically; the wire format itself is
  unchanged (reference binary.py ignores unknown JSON header keys).

- **Integer-exact coder.** The reference AC (reference quantization/
  ac.py:56-260) computes ``ceil/floor(range * (delta / 2**24))`` in Python
  float (double). ``range < 2**24`` and ``delta < 2**25``, so the true
  product is a dyadic rational with a <=49-bit numerator — exactly
  representable in a double — hence the float ceil/floor equal the integer
  forms ``(range*delta + 2**24 - 1) >> 24`` / ``(range*delta) >> 24``
  used here. State (low/high/current) reaches 2**62 (the reference asserts
  ``max_bit <= 61``), which TPUs have no native dtype for: all 64-bit
  values live as (hi, lo) uint32 limb pairs (`u64_*` helpers below), so no
  global ``jax_enable_x64`` is needed and the LM forward keeps its exact
  f32 semantics.

- **No data-dependent while loops.** The coder's renormalize / flush loops
  have closed forms: the number of renorm doublings is ``24 - msb(delta)``
  and a flush emits exactly ``max_bit - msb(low XOR high)`` bits — the
  leading bits of ``low``. Each symbol therefore does straight-line vector
  math plus ONE 64-wide ``dynamic_update_slice`` (encode) or one 24-wide
  ``dynamic_slice`` (decode) on the bit buffer. The decoder's binary
  search (ac.py:235-252) becomes a vectorized searchsorted: symbol =
  ``sum(current >= low + effective_low[i]) - 1`` over the whole CDF.

- Corrupted streams: the host decoder raises RuntimeError from its binary
  search; the device searchsorted returns an arbitrary symbol instead
  (garbage in, garbage out). Exhausted streams set an ``overrun`` flag the
  host wrapper turns into the same EOFError as the host path.

Bit packing matches binary.BitPacker(bits=1): bit i of the stream is bit
``i % 8`` (LSB-first) of byte ``i // 8`` — i.e. numpy's
``packbits/unpackbits(bitorder='little')``.
"""

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

TOTAL_RANGE_BITS = 24
_TR = 1 << TOTAL_RANGE_BITS
_MIN_RANGE = 2
_ROUNDOFF = np.float32(1e-8)

# ---------------------------------------------------------------------------
# uint32-limb 64-bit integer helpers. A "u64" is a (hi, lo) tuple of uint32
# arrays (any broadcastable shape). All shifts guard against the >=width
# undefined behaviour of hardware shifts.
# ---------------------------------------------------------------------------

_U32 = jnp.uint32


def _safe_shl(x, n):
    """x << n, 0 when n is outside [0, 31]. n: int32 scalar/array."""
    ok = (n >= 0) & (n < 32)
    nn = jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where(ok, x << nn, _U32(0))


def _safe_shr(x, n):
    ok = (n >= 0) & (n < 32)
    nn = jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where(ok, x >> nn, _U32(0))


def u64(hi, lo):
    return (jnp.asarray(hi, _U32), jnp.asarray(lo, _U32))


def u64_zero():
    return (_U32(0), _U32(0))


def u64_from_u32(x):
    x = jnp.asarray(x, _U32)
    return (jnp.zeros_like(x), x)


def u64_add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(_U32)
    return (a[0] + b[0] + carry, lo)


def u64_sub(a, b):
    borrow = (a[1] < b[1]).astype(_U32)
    return (a[0] - b[0] - borrow, a[1] - b[1])


def u64_ge(a, b):
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] >= b[1]))


def u64_eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def u64_xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def u64_and(a, b):
    return (a[0] & b[0], a[1] & b[1])


def u64_shl(a, n):
    """a << n for n in [0, 64]; n int32."""
    hi = _safe_shl(a[0], n) | _safe_shr(a[1], 32 - n) | _safe_shl(a[1], n - 32)
    lo = _safe_shl(a[1], n)
    return (hi, lo)


def u64_shr(a, n):
    lo = _safe_shr(a[1], n) | _safe_shl(a[0], 32 - n) | _safe_shr(a[0], n - 32)
    hi = _safe_shr(a[0], n)
    return (hi, lo)


def u64_bit(a, i):
    """Bit i of a, as uint32 0/1. i int32 in [0, 63] (0 outside)."""
    return u64_shr(a, i)[1] & _U32(1)


def _mask32(n):
    """(1 << n) - 1 clamped: all-ones for n >= 32, 0 for n <= 0."""
    full = (n >= 32)
    m = _safe_shl(_U32(1), n) - _U32(1)   # valid for 0 <= n <= 31
    return jnp.where(full, _U32(0xFFFFFFFF), jnp.where(n <= 0, _U32(0), m))


def u64_mask_low(n):
    """u64 with the low n bits set, n in [0, 64]."""
    return (_mask32(n - 32), _mask32(n))


def u64_mul_32x32(a, b):
    """Full 64-bit product of two uint32 values (16-bit limb split)."""
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    al, ah = a & _U32(0xFFFF), a >> _U32(16)
    bl, bh = b & _U32(0xFFFF), b >> _U32(16)
    p0 = al * bl
    m1 = al * bh
    m2 = ah * bl
    lo = p0 + ((m1 & _U32(0xFFFF)) << _U32(16))
    c1 = (lo < p0).astype(_U32)
    lo2 = lo + ((m2 & _U32(0xFFFF)) << _U32(16))
    c2 = (lo2 < lo).astype(_U32)
    hi = ah * bh + (m1 >> _U32(16)) + (m2 >> _U32(16)) + c1 + c2
    return (hi, lo2)


def u64_msb(a):
    """Index of the highest set bit; -1 when a == 0. int32."""
    msb_hi = 31 - jax.lax.clz(a[0]).astype(jnp.int32)   # clz(0) = 32 -> -1
    msb_lo = 31 - jax.lax.clz(a[1]).astype(jnp.int32)
    return jnp.where(a[0] != 0, 32 + msb_hi, msb_lo)


# ---------------------------------------------------------------------------
# CDF quantization (device mirror of ac.build_stable_quantized_cdf).
# Encode and decode share the SAME compiled instance of this, so only
# validity (monotone, >= min_range gaps, total <= 2**24) matters — not
# bit-parity with the numpy host build.
# ---------------------------------------------------------------------------


def build_cdf_device(pdfs: jnp.ndarray) -> jnp.ndarray:
    """pdfs [..., card] float32 -> quantized CDF [..., card] int32
    (values <= 2**24 fit int32). Mirrors ac.py:18-53 with check=False.

    The optimization barriers pin each f32 op to its IEEE result: without
    them XLA's algebraic simplifier rewrites the divide/floor/multiply
    chain under jit (measured: cumsum entries flip by 1 vs the host build
    on the CPU backend). Self-consistency of the fused codec never depends
    on this — encode/decode share this very HLO — but host<->device AC
    byte-parity (the test oracle, tests/test_lm_fused.py) does."""
    card = pdfs.shape[-1]
    alpha = _MIN_RANGE * card / _TR
    scale = np.float32((1 - alpha) * _TR)
    # barrier the CONSTANT: otherwise the simplifier rewrites the divide
    # into a multiply by the (differently rounded) f32 reciprocal
    roundoff = jax.lax.optimization_barrier(jnp.float32(_ROUNDOFF))
    pdfs = jax.lax.optimization_barrier(pdfs / roundoff)
    pdfs = jax.lax.optimization_barrier(jnp.floor(pdfs) * _ROUNDOFF)
    scaled = jax.lax.optimization_barrier(scale * pdfs)
    ranges = jnp.floor(scaled).astype(jnp.int32) + _MIN_RANGE
    return jnp.cumsum(ranges, axis=-1)


# ---------------------------------------------------------------------------
# Scalar coder state and per-symbol transitions (straight-line, no loops).
# ---------------------------------------------------------------------------


class _AcState(tp.NamedTuple):
    low_hi: jnp.ndarray
    low_lo: jnp.ndarray
    high_hi: jnp.ndarray
    high_lo: jnp.ndarray
    cur_hi: jnp.ndarray      # decoder only ("current")
    cur_lo: jnp.ndarray
    max_bit: jnp.ndarray     # int32, >= -1
    bit_pos: jnp.ndarray     # int32: write cursor (encode) / read cursor (decode)
    overrun: jnp.ndarray     # bool: decoder read past the stream end


def ac_init_state() -> _AcState:
    z = _U32(0)
    return _AcState(z, z, z, z, z, z, jnp.int32(-1), jnp.int32(0),
                    jnp.asarray(False))


def _delta(low, high):
    """high - low + 1 as u64."""
    return u64_add(u64_sub(high, low), u64_from_u32(_U32(1)))


def _renorm_count(low, high):
    """Closed form of `while delta < 2**24: ...`: doublings needed."""
    d = _delta(low, high)
    return jnp.maximum(0, TOTAL_RANGE_BITS - u64_msb(d))


def _effective(range_val_u32, delta_u32, ceil: bool):
    """ceil/floor(range * delta / 2**24) — exact integer form. Result fits
    uint32 (< 2**25 * 2**24 / 2**24 = 2**25)."""
    prod = u64_mul_32x32(range_val_u32, delta_u32)
    if ceil:
        prod = u64_add(prod, u64_from_u32(_U32(_TR - 1)))
    return u64_shr(prod, TOTAL_RANGE_BITS)[1]


def ac_encode_symbol(st: _AcState, bits_buf: jnp.ndarray, cdf: jnp.ndarray,
                     symbol: jnp.ndarray):
    """Push one symbol (ac.py:130-158). cdf [card] int32, symbol int32.
    Returns (new_state, new_bits_buf). Writes flushed prefix bits into
    bits_buf (int8, one bit per element) at st.bit_pos via one 64-wide
    dynamic_update_slice (garbage beyond the flush count is overwritten by
    later writes or ignored by the final read)."""
    low = (st.low_hi, st.low_lo)
    high = (st.high_hi, st.high_lo)

    # renormalize: low *= 2**n ; high = high*2**n + (2**n - 1)
    n = _renorm_count(low, high)
    low = u64_shl(low, n)
    high = u64_add(u64_shl(high, n), u64_mask_low(n))
    max_bit = st.max_bit + n

    delta32 = _delta(low, high)[1]                      # in [2**24, 2**25)
    range_low = jnp.where(symbol == 0, jnp.int32(0),
                          jax.lax.dynamic_index_in_dim(
                              cdf, jnp.maximum(symbol - 1, 0), keepdims=False))
    range_high = jax.lax.dynamic_index_in_dim(cdf, symbol, keepdims=False) - 1
    eff_low = _effective(range_low.astype(_U32), delta32, ceil=True)
    eff_high = _effective(range_high.astype(_U32), delta32, ceil=False)
    new_high = u64_add(low, u64_from_u32(eff_high))
    new_low = u64_add(low, u64_from_u32(eff_low))

    # flush common prefix: emit bits of low from max_bit down to msb(xor)+1
    x = u64_xor(new_low, new_high)
    m = u64_msb(x)                                      # >= 0 (delta >= 2)
    n_flush = max_bit - m
    j = jnp.arange(64, dtype=jnp.int32)
    flush_bits = jnp.where(j < n_flush,
                           u64_bit(new_low, max_bit - j), _U32(0))
    bits_buf = jax.lax.dynamic_update_slice(
        bits_buf, flush_bits.astype(bits_buf.dtype), (st.bit_pos,))
    keep = u64_mask_low(m + 1)
    new_low = u64_and(new_low, keep)
    new_high = u64_and(new_high, keep)

    return _AcState(new_low[0], new_low[1], new_high[0], new_high[1],
                    st.cur_hi, st.cur_lo, m, st.bit_pos + n_flush,
                    st.overrun), bits_buf


def ac_encode_flush(st: _AcState, bits_buf: jnp.ndarray):
    """Final flush (ac.py:160-167): emit bits of low from max_bit down to 0
    (max_bit + 1 <= 62 bits, one 64-wide write)."""
    low = (st.low_hi, st.low_lo)
    j = jnp.arange(64, dtype=jnp.int32)
    out = jnp.where(j <= st.max_bit, u64_bit(low, st.max_bit - j), _U32(0))
    bits_buf = jax.lax.dynamic_update_slice(
        bits_buf, out.astype(bits_buf.dtype), (st.bit_pos,))
    n_bits = st.bit_pos + st.max_bit + 1
    return n_bits, bits_buf


def ac_decode_symbol(st: _AcState, bits_buf: jnp.ndarray, n_bits: jnp.ndarray,
                     cdf: jnp.ndarray):
    """Pull one symbol (ac.py:217-260). Returns (new_state, symbol int32)."""
    low = (st.low_hi, st.low_lo)
    high = (st.high_hi, st.high_lo)
    cur = (st.cur_hi, st.cur_lo)

    # renormalize, pulling n stream bits into current (first bit pulled is
    # the most significant of the appended chunk)
    n = _renorm_count(low, high)
    chunk = jax.lax.dynamic_slice(bits_buf, (st.bit_pos,),
                                  (TOTAL_RANGE_BITS,)).astype(_U32)
    i = jnp.arange(TOTAL_RANGE_BITS, dtype=jnp.int32)
    v = jnp.sum(_safe_shl(chunk & _U32(1), n - 1 - i), dtype=_U32)
    low = u64_shl(low, n)
    high = u64_add(u64_shl(high, n), u64_mask_low(n))
    cur = u64_add(u64_shl(cur, n), u64_from_u32(v))
    overrun = st.overrun | (st.bit_pos + n > n_bits)
    bit_pos = st.bit_pos + n

    delta32 = _delta(low, high)[1]
    # vectorized searchsorted over the CDF: symbol = #(current >= low+el) - 1
    card = cdf.shape[0]
    range_lows = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cdf[:card - 1]]).astype(_U32)
    el_vec = _effective(range_lows, delta32, ceil=True)      # [card] uint32
    lows = u64_add((jnp.broadcast_to(low[0], el_vec.shape),
                    jnp.broadcast_to(low[1], el_vec.shape)),
                   (jnp.zeros_like(el_vec), el_vec))
    ge = u64_ge((jnp.broadcast_to(cur[0], el_vec.shape),
                 jnp.broadcast_to(cur[1], el_vec.shape)), lows)
    symbol = jnp.sum(ge.astype(jnp.int32)) - 1

    el = jax.lax.dynamic_index_in_dim(el_vec, symbol, keepdims=False)
    range_high = jax.lax.dynamic_index_in_dim(cdf, symbol, keepdims=False) - 1
    eh = _effective(range_high.astype(_U32), delta32, ceil=False)
    new_low = u64_add(low, u64_from_u32(el))
    new_high = u64_add(low, u64_from_u32(eh))

    # flush common prefix from low/high/current
    x = u64_xor(new_low, new_high)
    m = u64_msb(x)
    keep = u64_mask_low(m + 1)
    new_low = u64_and(new_low, keep)
    new_high = u64_and(new_high, keep)
    cur = u64_and(cur, keep)

    return _AcState(new_low[0], new_low[1], new_high[0], new_high[1],
                    cur[0], cur[1], m, bit_pos, overrun), symbol


# ---------------------------------------------------------------------------
# KV-cached LM step. The flax LMModel stores raw layer INPUTS and reprojects
# the whole past_context history through the K/V matrices every step
# (models/transformer.py:84 — fine for batch inference, 3x redundant work at
# T=1). Here the streaming state holds the PROJECTED keys/values per layer,
# so a step projects only the new token. Mathematically identical attention;
# bitwise parity with the flax path is neither expected nor needed — the
# fused codec only requires encode/decode self-consistency, which the shared
# program provides whatever the step implementation.
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']


def _sin_embedding(position, dim, max_period=10000.0):
    """create_sin_embedding (models/transformer.py:22-30) for one position."""
    half = dim // 2
    adim = jnp.arange(half)
    phase = position / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)])


def kv_init_state(lm_model, params):
    """(k_hist, v_hist) [L, S, C] initialized to the K/V BIASES: history
    slots hold projections of zero layer-inputs (0 @ W + b = b), which is
    exactly what the reference's zero sentinel key contributes
    (models/transformer.py:142-149); invalid slots are masked anyway."""
    L, S, C = (lm_model.num_layers, lm_model.past_context, lm_model.dim)
    k_hist = jnp.zeros((L, S, C), jnp.float32)
    v_hist = jnp.zeros((L, S, C), jnp.float32)
    for i in range(L):
        in_b = params['transformer'][f'layer_{i}']['self_attn']['in_proj_bias']
        k_hist = k_hist.at[i].set(jnp.broadcast_to(in_b[C:2 * C], (S, C)))
        v_hist = v_hist.at[i].set(jnp.broadcast_to(in_b[2 * C:], (S, C)))
    return k_hist, v_hist, jnp.zeros((), jnp.int32)


def kv_lm_step(lm_model, params, indices, state):
    """One LM step with projected-KV streaming state.

    indices [K] int32 (1 + previous codes, 0 = missing) -> (pdfs [K, card]
    f32, new_state). Matches LMModel.__call__ at T=1 (models/lm.py:34-51)
    to float tolerance: summed per-codebook embeddings, norm_in, sinusoidal
    position, 5 post-norm layers with bounded-context attention (the window
    condition 0 <= delta <= past_context is implied because the ring holds
    exactly past_context slots), per-codebook heads + softmax."""
    K = indices.shape[0]
    C = lm_model.dim
    H = lm_model.num_heads
    hd = C // H
    S = lm_model.past_context
    k_hist, v_hist, offset = state
    tr = params['transformer']

    x = sum(params[f'emb_{k}']['embedding'][indices[k]] for k in range(K))
    x = _layer_norm(x, tr['norm_in'])
    x = x + _sin_embedding(offset, C)

    n_valid = jnp.minimum(offset + 1, S)
    hist_mask = jnp.arange(S) >= (S - n_valid)
    mask = jnp.concatenate([hist_mask, jnp.ones((1,), bool)])    # [S+1]

    new_k = []
    new_v = []
    for i in range(lm_model.num_layers):
        p = tr[f'layer_{i}']
        in_w = p['self_attn']['in_proj_weight']      # [3C, C] (torch layout)
        in_b = p['self_attn']['in_proj_bias']
        q = x @ in_w[:C].T + in_b[:C]
        k_new = x @ in_w[C:2 * C].T + in_b[C:2 * C]
        v_new = x @ in_w[2 * C:].T + in_b[2 * C:]
        keys = jnp.concatenate([k_hist[i], k_new[None]], axis=0)   # [S+1, C]
        vals = jnp.concatenate([v_hist[i], v_new[None]], axis=0)
        qh = q.reshape(H, hd)
        kh = keys.reshape(S + 1, H, hd)
        vh = vals.reshape(S + 1, H, hd)
        scores = jnp.einsum('hd,shd->hs', qh, kh) / jnp.sqrt(float(hd))
        scores = jnp.where(mask[None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum('hs,shd->hd', attn, vh).reshape(C)
        out = out @ p['self_attn']['out_proj_weight'].T \
            + p['self_attn']['out_proj_bias']
        x = _layer_norm(x + out, p['norm1'])
        h = x @ p['linear1']['kernel'] + p['linear1']['bias']
        h = jax.nn.gelu(h, approximate=False)
        h = h @ p['linear2']['kernel'] + p['linear2']['bias']
        x = _layer_norm(x + h, p['norm2'])
        new_k.append(keys[1:])
        new_v.append(vals[1:])

    logits = jnp.stack(
        [x @ params[f'linear_{k}']['kernel'] + params[f'linear_{k}']['bias']
         for k in range(K)])                                     # [K, card]
    pdfs = jax.nn.softmax(logits, axis=-1)
    return pdfs, (jnp.stack(new_k), jnp.stack(new_v), offset + 1)


# ---------------------------------------------------------------------------
# The fused codec program.
# ---------------------------------------------------------------------------


def bits_capacity(n_symbols: int) -> int:
    """Static bit-buffer size: each symbol renormalizes at most 24 times
    (one stream bit per doubling on decode / one emitted bit per doubling
    amortized on encode) + final flush (<= 62) + 64 slack for the wide
    writes/reads at the end."""
    return TOTAL_RANGE_BITS * (n_symbols + 2) + 128


def make_fused_lm_codec(lm_model, params, kv_cache: bool = True):
    """Build the jitted fused codec for an LMModel + params.

    Returns ``fn(mode_encode, symbols, bits, n_bits_in)`` where
      - mode_encode: bool scalar. True: arithmetic-encode `symbols`
        ([K, T] int32) into a bit buffer. False: decode T*K symbols from
        `bits` (unpacked, one bit per element).
      - bits: int8 [bits_capacity(K*T)] — encoder scratch / decoder input.
      - n_bits_in: int32, valid bit count of `bits` (decode; EOF detection).
    Returns (symbols_out [K, T] int32, bits_out, n_bits_out int32,
    overrun bool). Shapes are static per (K, T); jit caches per shape.

    ``kv_cache`` selects the projected-KV step (default; ~3x less work per
    step) vs the flax LMModel.apply step. Both are self-consistent codecs;
    their streams are NOT interchangeable with each other (different
    programs -> ulp-level probability differences across the CDF grid).
    """

    if kv_cache:
        state0 = kv_init_state(lm_model, params)

        def lm_step(input_, state):
            return kv_lm_step(lm_model, params, input_[0, :, 0], state)
    else:
        # flax module construction is not legal inside a jit trace (and
        # init_state needs a bound scope) — build the all-zero initial
        # streaming state directly from the module attributes
        # (StreamingTransformerEncoder.init_state shapes)
        state0 = (jnp.zeros((lm_model.num_layers, 1, lm_model.past_context,
                             lm_model.dim), jnp.float32),
                  jnp.zeros((), jnp.int32))

        def lm_step(input_, state):
            probas, new_state, _ = lm_model.apply({'params': params},
                                                  input_, state)
            return probas[0, :, :, 0].T, new_state

    def fn(mode_encode, symbols, bits, n_bits_in):
        K, T = symbols.shape

        def encode_ks(ac, bits_buf, cdfs, syms_t, _n_bits):
            for k in range(K):
                ac, bits_buf = ac_encode_symbol(ac, bits_buf, cdfs[k],
                                                syms_t[k])
            return ac, bits_buf, syms_t

        def decode_ks(ac, bits_buf, cdfs, _syms_t, n_bits):
            out = []
            for k in range(K):
                ac, sym = ac_decode_symbol(ac, bits_buf, n_bits, cdfs[k])
                out.append(sym)
            return ac, bits_buf, jnp.stack(out)

        def body(carry, syms_t):
            lm_state, input_, ac, bits_buf = carry
            pdfs, lm_state = lm_step(input_, lm_state)    # [K, card] f32
            cdfs = build_cdf_device(pdfs)                 # [K, card] int32
            ac, bits_buf, syms_out = jax.lax.cond(
                mode_encode, encode_ks, decode_ks,
                ac, bits_buf, cdfs, syms_t, n_bits_in)
            input_ = (1 + syms_out)[None, :, None]
            return (lm_state, input_, ac, bits_buf), syms_out

        init_input = jnp.zeros((1, K, 1), jnp.int32)
        carry0 = (state0, init_input, ac_init_state(), bits)
        (_, _, ac, bits_out), syms = jax.lax.scan(
            body, carry0, jnp.transpose(symbols, (1, 0)))   # scan over T

        # encoder: final flush; decoder: bit count it consumed
        def fin_enc(ac, bits_buf):
            return ac_encode_flush(ac, bits_buf)

        def fin_dec(ac, bits_buf):
            return ac.bit_pos, bits_buf

        n_bits_out, bits_out = jax.lax.cond(mode_encode, fin_enc, fin_dec,
                                            ac, bits_out)
        return jnp.transpose(syms, (1, 0)), bits_out, n_bits_out, ac.overrun

    return jax.jit(fn)


class FusedLmCoder:
    """Host-side wrapper: bytes <-> codes through the fused device codec."""

    def __init__(self, lm_model, params, kv_cache: bool = True):
        self._fn = make_fused_lm_codec(lm_model, params, kv_cache=kv_cache)

    def encode(self, frame: np.ndarray) -> bytes:
        """frame [K, T] int -> arithmetic-coded bytes (binary.BitPacker
        bits=1 framing: LSB-first bits, zero-padded final byte)."""
        K, T = frame.shape
        cap = bits_capacity(K * T)
        bits = jnp.zeros((cap,), jnp.int8)
        _, bits_out, n_bits, _ = self._fn(
            jnp.asarray(True), jnp.asarray(frame, jnp.int32), bits,
            jnp.int32(0))
        n_bits = int(n_bits)
        host_bits = np.asarray(bits_out[: n_bits]).astype(np.uint8)
        return np.packbits(host_bits, bitorder='little').tobytes()

    def decode(self, data: bytes, K: int, T: int) -> np.ndarray:
        """bytes -> frame [K, T] int64. Raises EOFError when the stream is
        shorter than the host BitUnpacker would tolerate (pull -> None)."""
        cap = bits_capacity(K * T)
        raw = np.frombuffer(data, np.uint8)
        host_bits = np.unpackbits(raw, bitorder='little')[:cap]
        bits = np.zeros((cap,), np.int8)
        bits[: host_bits.size] = host_bits
        syms, _, _, overrun = self._fn(
            jnp.asarray(False), jnp.zeros((K, T), jnp.int32),
            jnp.asarray(bits), jnp.int32(len(data) * 8))
        if bool(overrun):
            raise EOFError("The stream ended sooner than expected.")
        return np.asarray(syms, np.int64)


# ---------------------------------------------------------------------------
# Streaming LM entropy codec: one latent frame (K symbols) per call, with
# the LM + AC state carried across calls — entropy coding for the
# low-latency streaming path (streaming.StreamingCodec), which neither the
# reference nor the one-shot .ecdc format supports.
#
# Protocol notes:
# - ONE program, mode-switched like the one-shot codec, so encoder and
#   decoder probabilities are bit-identical by construction. It is a
#   DIFFERENT program from the one-shot codec (different scan shape), so
#   streaming bytes and .ecdc LM payloads are not interchangeable.
# - Zero per-chunk bitrate overhead: no per-chunk flush, no length
#   prefixes. The decoder instead STALLS exactly when the next symbol's
#   renormalization needs bits that have not arrived (the need is known
#   BEFORE consuming — `_renorm_count(delta)` — and the rest of a symbol
#   decode reads nothing), leaving its state untouched; the host retries
#   the same frame when more bytes arrive. A stalled frame re-runs the LM
#   forward — same program, same state, same probabilities.
# ---------------------------------------------------------------------------


class _StreamCarry(tp.NamedTuple):
    lm_state: tp.Any
    input_: jnp.ndarray          # [1, K, 1] int32 — next LM input
    ac: _AcState                 # bit_pos rebased to 0 every call


def make_fused_lm_stream_step(lm_model, params):
    """One-frame streaming codec step.

    Returns ``(fn, init_carry)`` with
    ``fn(mode_encode, carry, syms_in [K] i32, bits [cap] i8, n_bits i32)
    -> (carry', syms_out [K] i32, stalled bool, bits_out, n_io i32)``
    where ``n_io`` is bits EMITTED (encode, written from index 0) or bits
    CONSUMED (decode, read from index 0). On a decoder stall the carry is
    returned untouched, ``syms_out`` is -1 and ``n_io`` is 0.
    """
    state0 = kv_init_state(lm_model, params)

    def lm_step(input_, state):
        return kv_lm_step(lm_model, params, input_[0, :, 0], state)

    def fn(mode_encode, carry, syms_in, bits, n_bits):
        K = syms_in.shape[0]
        ac0 = carry.ac._replace(bit_pos=jnp.int32(0),
                                overrun=jnp.asarray(False))
        pdfs, lm_state_new = lm_step(carry.input_, carry.lm_state)
        cdfs = build_cdf_device(pdfs)

        def enc(ac, bits_buf):
            for k in range(K):
                ac, bits_buf = ac_encode_symbol(ac, bits_buf, cdfs[k],
                                                syms_in[k])
            return ac, bits_buf, syms_in, jnp.asarray(False)

        def dec(ac, bits_buf):
            stalled = jnp.asarray(False)
            out = []
            for k in range(K):
                low = (ac.low_hi, ac.low_lo)
                high = (ac.high_hi, ac.high_lo)
                need = _renorm_count(low, high)
                stalled = stalled | (ac.bit_pos + need > n_bits)
                # past a stall the transitions compute garbage; the whole
                # frame is discarded below, so only crash-freedom matters
                # (dynamic_slice clamps, searchsorted never asserts)
                ac, sym = ac_decode_symbol(ac, bits_buf, jnp.int32(2 ** 30),
                                           cdfs[k])
                out.append(sym)
            return ac, bits_buf, jnp.stack(out), stalled

        ac, bits_out, syms, stalled = jax.lax.cond(mode_encode, enc, dec,
                                                   ac0, bits)

        def sel(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(stalled, o, n), new, old)

        carry_out = _StreamCarry(
            lm_state=sel(lm_state_new, carry.lm_state),
            input_=sel((1 + syms)[None, :, None].astype(jnp.int32),
                       carry.input_),
            ac=sel(ac, ac0))
        syms_out = jnp.where(stalled, jnp.full_like(syms, -1), syms)
        n_io = jnp.where(stalled, jnp.int32(0), ac.bit_pos)
        return carry_out, syms_out, stalled, bits_out, n_io

    def init_carry(K: int) -> _StreamCarry:
        return _StreamCarry(lm_state=state0,
                            input_=jnp.zeros((1, K, 1), jnp.int32),
                            ac=ac_init_state())

    return jax.jit(fn), init_carry


class StreamingLmEncoder:
    """Push one frame of codes at a time, get wire bytes out as they
    byte-align; ``flush()`` emits the final arithmetic-coder state."""

    def __init__(self, lm_model, params, K: int):
        self._fn, init_carry = make_fused_lm_stream_step(lm_model, params)
        self._carry = init_carry(K)
        self._K = K
        self._cap = bits_capacity(K)
        self._rem = np.zeros((0,), np.uint8)   # bit remainder (< 8 bits)
        self._flush_fn = jax.jit(ac_encode_flush)
        self._finished = False

    def _emit(self, new_bits: np.ndarray) -> bytes:
        bits = np.concatenate([self._rem, new_bits.astype(np.uint8)])
        n_full = (bits.size // 8) * 8
        self._rem = bits[n_full:]
        return np.packbits(bits[:n_full], bitorder='little').tobytes()

    def push_frame(self, codes_t: np.ndarray) -> bytes:
        """codes_t [K] -> zero or more wire bytes."""
        if self._finished:
            raise RuntimeError('push_frame after flush(): flush emits the '
                               'final coder state and ends the stream')
        assert codes_t.shape == (self._K,)
        carry, _, _, bits_out, n = self._fn(
            jnp.asarray(True), self._carry,
            jnp.asarray(codes_t, jnp.int32),
            jnp.zeros((self._cap,), jnp.int8), jnp.int32(0))
        self._carry = carry
        return self._emit(np.asarray(bits_out[: int(n)]))

    def flush(self) -> bytes:
        """Final flush: remaining AC state bits, zero-padded to a byte.
        TERMINAL — the emitted state bits are not consumed from the coder,
        so further pushes/flushes would interleave duplicate state bits
        and desynchronize the decoder; they raise instead."""
        if self._finished:
            raise RuntimeError('flush() called twice: the stream is ended')
        self._finished = True
        buf = jnp.zeros((128,), jnp.int8)
        ac = self._carry.ac._replace(bit_pos=jnp.int32(0))
        n, bits = self._flush_fn(ac, buf)
        out = self._emit(np.asarray(bits[: int(n)]))
        if self._rem.size:
            out += np.packbits(self._rem, bitorder='little').tobytes()
            self._rem = np.zeros((0,), np.uint8)
        return out


class StreamingLmDecoder:
    """Feed wire bytes as they arrive; pull frames as they become
    decodable. ``pull_frame()`` returns None while more bytes are needed."""

    def __init__(self, lm_model, params, K: int):
        self._fn, init_carry = make_fused_lm_stream_step(lm_model, params)
        self._carry = init_carry(K)
        self._K = K
        self._cap = bits_capacity(K)
        self._bits = np.zeros((0,), np.uint8)

    def push_bytes(self, data: bytes):
        if data:
            self._bits = np.concatenate(
                [self._bits,
                 np.unpackbits(np.frombuffer(data, np.uint8),
                               bitorder='little')])

    def pull_frame(self) -> tp.Optional[np.ndarray]:
        """-> codes [K] int64, or None if more bytes are needed."""
        window = self._bits[: self._cap]
        buf = np.zeros((self._cap,), np.int8)
        buf[: window.size] = window
        carry, syms, stalled, _, n = self._fn(
            jnp.asarray(False), self._carry,
            jnp.zeros((self._K,), jnp.int32),
            jnp.asarray(buf), jnp.int32(window.size))
        if bool(stalled):
            return None
        self._carry = carry
        self._bits = self._bits[int(n):]
        return np.asarray(syms, np.int64)


# ---------------------------------------------------------------------------
# LM-free variant for exact byte-compat tests vs the host coder: pdfs are a
# precomputed input instead of an LM forward (same AC + CDF machinery).
# ---------------------------------------------------------------------------


def make_fused_ac_only(card: int):
    """fn(mode_encode, pdfs [N, card] f32, symbols [N] i32, bits, n_bits_in)
    -> (symbols_out, bits_out, n_bits_out, overrun). One symbol per step."""

    def fn(mode_encode, pdfs, symbols, bits, n_bits_in):
        def enc(ac, bits_buf, cdf, sym, _n):
            ac, bits_buf = ac_encode_symbol(ac, bits_buf, cdf, sym)
            return ac, bits_buf, sym

        def dec(ac, bits_buf, cdf, _sym, n):
            ac, sym = ac_decode_symbol(ac, bits_buf, n, cdf)
            return ac, bits_buf, sym

        def body(carry, xs):
            ac, bits_buf = carry
            pdf, sym_in = xs
            cdf = build_cdf_device(pdf)
            ac, bits_buf, sym = jax.lax.cond(mode_encode, enc, dec,
                                             ac, bits_buf, cdf, sym_in,
                                             n_bits_in)
            return (ac, bits_buf), sym

        (ac, bits_out), syms = jax.lax.scan(body, (ac_init_state(), bits),
                                            (pdfs, symbols))

        def fin_enc(ac, b):
            return ac_encode_flush(ac, b)

        def fin_dec(ac, b):
            return ac.bit_pos, b

        n_bits_out, bits_out = jax.lax.cond(mode_encode, fin_enc, fin_dec,
                                            ac, bits_out)
        return syms, bits_out, n_bits_out, ac.overrun

    return jax.jit(fn)
