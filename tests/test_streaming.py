"""Streaming inference: chunk-by-chunk output must EXACTLY match offline.

The causal model admits exact streaming (docstring of streaming.py); these
tests check codes equality and waveform closeness between the offline path
(models/model.py eval encode/decode) and the chunked path with carried
conv/LSTM/transpose state, across uneven chunk patterns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.streaming import StreamingCodec, StreamingSEANet


def _small_model(n_filters=8, n_q=4):
    model = EncodecModel._get_model(
        [1.5, 3., 6.], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=n_q, n_filters=n_filters)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    variables['quantizer'] = variables['quantizer']._replace(
        embed_avg=variables['quantizer'].embed)
    model.set_target_bandwidth(3.)
    return model, variables


def _chunks(total, first, hop):
    """Uneven chunk pattern: first, then 1, 3, 2, 1, ... hops."""
    sizes = [first]
    pattern = [1, 3, 2, 1, 4]
    i = 0
    while sum(sizes) < total:
        n = min(pattern[i % len(pattern)] * hop, total - sum(sizes))
        sizes.append(n)
        i += 1
    return sizes


def test_streaming_encoder_matches_offline():
    model, variables = _small_model()
    enc = StreamingSEANet(model.encoder)
    hop = model.encoder.hop_length
    T = hop * 40
    x = jax.random.normal(jax.random.PRNGKey(2), (2, T, 1)) * 0.3

    offline = model.encoder.apply(
        {'params': variables['params']['encoder']}, x)

    state = enc.init_state(2)
    outs = []
    pos = 0
    for i, n in enumerate(_chunks(T, enc.min_first_chunk
                                  + (-enc.min_first_chunk) % hop, hop)):
        y, state = enc.apply(variables['params']['encoder'], state,
                             x[:, pos:pos + n], first=(i == 0))
        outs.append(y)
        pos += n
    streamed = jnp.concatenate(outs, axis=1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(offline),
                               atol=2e-5, rtol=1e-5)


def test_streaming_decoder_matches_offline():
    model, variables = _small_model()
    dec = StreamingSEANet(model.decoder)
    hop = model.encoder.hop_length
    Tl = 40
    z = jax.random.normal(jax.random.PRNGKey(3), (1, Tl, 128)) * 0.5

    offline = model.decoder.apply(
        {'params': variables['params']['decoder']}, z)

    state = dec.init_state(1)
    outs = []
    pos = 0
    for i, n in enumerate(_chunks(Tl, dec.min_first_chunk, 1)):
        y, state = dec.apply(variables['params']['decoder'], state,
                             z[:, pos:pos + n], first=(i == 0))
        assert y.shape[1] == n * hop
        outs.append(y)
        pos += n
    streamed = jnp.concatenate(outs, axis=1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(offline),
                               atol=2e-5, rtol=1e-5)


def test_streaming_codec_end_to_end():
    """Full chunked encode→quantize→decode equals the offline model call,
    including identical code indices."""
    model, variables = _small_model()
    codec = StreamingCodec(model)
    hop = codec.hop
    T = hop * 32
    wav = (0.5 * jnp.sin(jnp.arange(T) / 24000.0 * 2 * np.pi * 440)
           ).reshape(1, 1, T).astype(jnp.float32)

    frames = model.encode(variables, wav)
    offline_codes = frames[0][0]
    offline_wav = model.decode(variables, frames)[:, :, :T]

    enc_state, dec_state = codec.init_state(1)
    first = codec.min_first_chunk_samples
    codes_chunks, wav_chunks = [], []
    pos = 0
    for i, n in enumerate(_chunks(T, first, hop)):
        codes, enc_state = codec.encode_chunk(
            variables, enc_state, wav[:, :, pos:pos + n], first=(i == 0))
        out, dec_state = codec.decode_chunk(
            variables, dec_state, codes, first=(i == 0))
        codes_chunks.append(codes)
        wav_chunks.append(out)
        pos += n
    streamed_codes = jnp.concatenate(codes_chunks, axis=2)
    streamed_wav = jnp.concatenate(wav_chunks, axis=2)

    np.testing.assert_array_equal(np.asarray(streamed_codes),
                                  np.asarray(offline_codes))
    np.testing.assert_allclose(np.asarray(streamed_wav),
                               np.asarray(offline_wav),
                               atol=2e-5, rtol=1e-5)


def test_streaming_encoder_non_default_activation():
    """In-block activations must follow the module's configuration, not a
    hardcoded ELU (regression: BlockSpec ignored activation/params)."""
    from encodec_pytorch_tpu.models.seanet import SEANetEncoder
    enc_mod = SEANetEncoder(channels=1, norm='weight_norm', causal=True,
                            n_filters=8, activation='LeakyReLU',
                            activation_params={'negative_slope': 0.2})
    hop = enc_mod.hop_length
    T = hop * 20
    x = jax.random.normal(jax.random.PRNGKey(5), (1, T, 1)) * 0.3
    params = enc_mod.init(jax.random.PRNGKey(0), x)['params']
    offline = enc_mod.apply({'params': params}, x)

    enc = StreamingSEANet(enc_mod)
    state = enc.init_state(1)
    outs, pos = [], 0
    first = enc.min_first_chunk + (-enc.min_first_chunk) % hop
    for i, n in enumerate(_chunks(T, first, hop)):
        y, state = enc.apply(params, state, x[:, pos:pos + n], first=(i == 0))
        outs.append(y)
        pos += n
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                               np.asarray(offline), atol=2e-5, rtol=1e-5)


def test_streaming_codec_bf16_matches_offline():
    """bf16 models: the LSTM must compute in f32 exactly like the offline
    SLSTM (regression: bf16 gate operands made carried state drift)."""
    model = EncodecModel._get_model(
        [1.5, 3., 6.], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=4, n_filters=8,
        dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)

    codec = StreamingCodec(model)
    hop = codec.hop
    T = hop * 48  # long enough for carried-state drift to show
    wav = (0.5 * jnp.sin(jnp.arange(T) / 24000.0 * 2 * np.pi * 313)
           ).reshape(1, 1, T).astype(jnp.float32)

    frames = model.encode(variables, wav)
    offline_codes = frames[0][0]
    offline_wav = model.decode(variables, frames)[:, :, :T]

    enc_state, dec_state = codec.init_state(1)
    codes_chunks, wav_chunks, pos = [], [], 0
    for i, n in enumerate(_chunks(T, codec.min_first_chunk_samples, hop)):
        out, codes, enc_state, dec_state = codec.roundtrip_chunk(
            variables, enc_state, dec_state, wav[:, :, pos:pos + n],
            first=(i == 0))
        codes_chunks.append(codes)
        wav_chunks.append(out)
        pos += n
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate(codes_chunks, axis=2)),
        np.asarray(offline_codes))
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(wav_chunks, axis=2), np.float32),
        np.asarray(offline_wav, np.float32), atol=2e-2, rtol=2e-2)


def test_streaming_fused_roundtrip_matches_two_call():
    """roundtrip_chunk (one jitted program, donated state) is numerically
    identical to encode_chunk → decode_chunk, chunk by chunk."""
    model, variables = _small_model()
    codec = StreamingCodec(model)
    codec2 = StreamingCodec(model)
    hop = codec.hop
    T = hop * 24
    rng = np.random.RandomState(5)
    wav = jnp.asarray(0.3 * rng.randn(1, 1, T).astype(np.float32))

    enc_a, dec_a = codec.init_state(1)
    enc_b, dec_b = codec2.init_state(1)
    first = codec.min_first_chunk_samples
    pos = 0
    for i, n in enumerate(_chunks(T, first, hop)):
        chunk = wav[:, :, pos:pos + n]
        codes_a, enc_a = codec.encode_chunk(variables, enc_a, chunk,
                                            first=(i == 0))
        out_a, dec_a = codec.decode_chunk(variables, dec_a, codes_a,
                                          first=(i == 0))
        out_b, codes_b, enc_b, dec_b = codec2.roundtrip_chunk(
            variables, enc_b, dec_b, chunk, first=(i == 0))
        np.testing.assert_array_equal(np.asarray(codes_b), np.asarray(codes_a))
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                                   atol=2e-6, rtol=1e-6)
        pos += n


def test_streaming_rejects_bad_chunk():
    model, variables = _small_model()
    codec = StreamingCodec(model)
    enc_state, _ = codec.init_state(1)
    with pytest.raises(AssertionError, match='multiple'):
        codec.encode_chunk(variables, enc_state,
                           jnp.zeros((1, 1, 321)), first=True)


def test_streaming_rejects_normalized_model():
    model = EncodecModel._get_model(
        [3.], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=True, segment=None, n_q=2, n_filters=4)
    with pytest.raises(AssertionError, match='normalize'):
        StreamingCodec(model)
