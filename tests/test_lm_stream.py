"""Streaming LM entropy codec (bitstream/fused.py StreamingLm{En,De}coder):
frame-at-a-time arithmetic coding with carried LM+AC state, zero per-chunk
overhead, and exact decoder stalls when bytes haven't arrived yet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from encodec_pytorch_tpu.bitstream.fused import (StreamingLmDecoder,
                                                 StreamingLmEncoder)
from encodec_pytorch_tpu.models.lm import LMModel


@pytest.fixture(scope='module')
def lm_and_codes():
    lm_def = LMModel(n_q=4, card=64, num_layers=2, dim=32, num_heads=4,
                     past_context=24)
    params = lm_def.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 4, 1), jnp.int32))['params']
    rng = np.random.RandomState(11)
    codes = rng.randint(0, 64, size=(4, 60)).astype(np.int64)
    return lm_def, params, codes


def test_streaming_roundtrip_with_bursty_delivery(lm_and_codes):
    """Encoder pushes frame-by-frame; the 'network' delivers bytes in
    random bursts; the decoder pulls whenever it can. All frames must
    come back exact, and the decoder must stall at least once."""
    lm_def, params, codes = lm_and_codes
    K, T = codes.shape
    enc = StreamingLmEncoder(lm_def, params, K)
    dec = StreamingLmDecoder(lm_def, params, K)

    rng = np.random.RandomState(0)
    wire = b''
    decoded = []
    stalls = 0
    for t in range(T):
        wire += enc.push_frame(codes[:, t])
        # deliver a random prefix of what's pending
        n = rng.randint(0, len(wire) + 1)
        dec.push_bytes(wire[:n])
        wire = wire[n:]
        while len(decoded) < T:
            frame = dec.pull_frame()
            if frame is None:
                stalls += 1
                break
            decoded.append(frame)
    dec.push_bytes(wire + enc.flush())
    while len(decoded) < T:
        frame = dec.pull_frame()
        assert frame is not None, \
            f'decoder still stalled after flush at frame {len(decoded)}'
        decoded.append(frame)

    np.testing.assert_array_equal(np.stack(decoded, axis=1), codes)
    assert stalls > 0, 'delivery pattern never exercised a stall'


def test_stall_leaves_state_untouched(lm_and_codes):
    """A stalled pull must not corrupt the decoder: repeated stalled pulls
    followed by the bytes arriving must decode the same frame."""
    lm_def, params, codes = lm_and_codes
    K, _ = codes.shape
    enc = StreamingLmEncoder(lm_def, params, K)
    dec = StreamingLmDecoder(lm_def, params, K)

    data = enc.push_frame(codes[:, 0])
    assert dec.pull_frame() is None
    assert dec.pull_frame() is None           # stall twice: no state change
    dec.push_bytes(data + enc.flush())
    out = dec.pull_frame()
    assert out is not None
    np.testing.assert_array_equal(out, codes[:, 0])


def test_streaming_through_codec_codes(lm_and_codes):
    """Full pipeline: StreamingCodec encode_chunk -> entropy wire ->
    decode: the transmitted codes match the encoder's exactly."""
    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.streaming import StreamingCodec

    # LM card must match the codec's codebook bins (1024)
    lm_def = LMModel(n_q=4, card=1024, num_layers=2, dim=32, num_heads=4,
                     past_context=24)
    params = lm_def.init(jax.random.PRNGKey(9),
                         jnp.zeros((1, 4, 1), jnp.int32))['params']
    model = EncodecModel._get_model(
        [3.], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='my_encodec',
        n_filters=4, n_q=4)
    model.set_target_bandwidth(3.)
    variables = model.init(jax.random.PRNGKey(1), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(2),
                                variables['quantizer'].embed.shape))

    codec = StreamingCodec(model)
    enc_state, _ = codec.init_state(1)
    hop = codec.hop
    first_len = codec.min_first_chunk_samples
    wav = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3),
                          (1, 1, first_len + 4 * hop)) * 0.1, np.float32)

    K = 4
    enc = StreamingLmEncoder(lm_def, params, K)
    dec = StreamingLmDecoder(lm_def, params, K)
    sent = []
    wire = b''
    pos = 0
    for i, end in enumerate([first_len] + [first_len + j * hop
                                           for j in range(1, 5)]):
        chunk = wav[:, :, pos:end]
        pos = end
        codes, enc_state = codec.encode_chunk(variables, enc_state, chunk,
                                              first=(i == 0))
        codes = np.asarray(codes[0])          # [K, t]
        for t in range(codes.shape[1]):
            sent.append(codes[:, t])
            wire += enc.push_frame(codes[:, t])
    wire += enc.flush()
    dec.push_bytes(wire)
    got = [dec.pull_frame() for _ in range(len(sent))]
    assert all(g is not None for g in got)
    np.testing.assert_array_equal(np.stack(got), np.stack(sent))


def test_flush_is_terminal(lm_and_codes):
    """flush() emits the final AC state without consuming it — a second
    flush or a push afterwards would interleave duplicate state bits and
    desynchronize the decoder, so both must raise."""
    lm_def, params, codes = lm_and_codes
    K = codes.shape[0]
    enc = StreamingLmEncoder(lm_def, params, K)
    enc.push_frame(codes[:, 0])
    enc.flush()
    with pytest.raises(RuntimeError, match='twice'):
        enc.flush()
    with pytest.raises(RuntimeError, match='after flush'):
        enc.push_frame(codes[:, 1])
