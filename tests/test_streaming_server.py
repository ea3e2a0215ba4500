"""StreamingServer (serve.py): N concurrent chunked streams multiplexed
through one fixed-shape masked batched step must each equal the offline
model on their own signal, across staggered joins, slot reuse, and idle
slots."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.serve import StreamingServer


@pytest.fixture(scope='module')
def model_vars():
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=4,
        n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    return model, variables


def _signal(i, total):
    t = np.arange(total, dtype=np.float32)
    return (0.3 * np.sin(2 * np.pi * (80 + 40 * i) * t / 24000)
            ).astype(np.float32)[None]


def test_streaming_server_matches_offline(model_vars):
    """3 streams (one joining late), chunk-by-chunk through the shared
    masked step == each stream through the offline model."""
    model, variables = model_vars
    server = StreamingServer(model, variables, max_streams=4,
                             chunk_hops=1, max_wait_ms=50.0)
    first = server.min_first_chunk_samples
    hop = server.chunk_samples
    n_steady = 5
    total = first + n_steady * hop
    signals = [_signal(i, total) for i in range(3)]
    offline = [np.asarray(model(variables, jnp.asarray(s[None])))[0]
               for s in signals]

    outputs = [None, None, None]
    late_join = threading.Event()

    def run_stream(i):
        if i == 2:
            late_join.wait()  # join after the others are steady-streaming
        with server.open_stream() as stream:
            outs = [stream.process(signals[i][:, :first], timeout=300)]
            for k in range(n_steady):
                if i == 0 and k == 2:
                    late_join.set()
                start = first + k * hop
                outs.append(stream.process(
                    signals[i][:, start:start + hop], timeout=300))
            outputs[i] = np.concatenate(outs, axis=-1)

    with server:
        threads = [threading.Thread(target=run_stream, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = server.stats()

    for out, ref in zip(outputs, offline):
        assert out.shape == ref.shape == (1, total)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    assert stats['joins'] == 3
    assert stats['chunks'] == 3 * (1 + n_steady)
    assert stats['ticks'] < stats['chunks']  # multiplexing happened


def test_streaming_server_slot_lifecycle(model_vars):
    model, variables = model_vars
    server = StreamingServer(model, variables, max_streams=2,
                             chunk_hops=1, max_wait_ms=1.0)
    first = server.min_first_chunk_samples
    sig = _signal(0, first + server.chunk_samples)

    with server:
        s1, s2 = server.open_stream(), server.open_stream()
        with pytest.raises(RuntimeError, match='slots'):
            server.open_stream()
        s1.close()
        s3 = server.open_stream()          # freed slot is reusable
        out = s3.process(sig[:, :first], timeout=300)
        assert out.shape == (1, first)
        out = s3.process(sig[:, first:], timeout=300)
        assert out.shape == (1, server.chunk_samples)

        # steady chunks must be exactly chunk_samples
        with pytest.raises(ValueError, match='steady chunks'):
            s3.process(sig[:, :2 * server.chunk_samples])
        s3.close()
        with pytest.raises(RuntimeError, match='closed'):
            s3.process(sig[:, :first])
        s2.close()

    with pytest.raises(ValueError, match='max_streams'):
        StreamingServer(model, variables, max_streams=1)


def test_streaming_server_inflight_chunks_never_hang(model_vars):
    """close() and stop() must resolve in-flight futures, not strand the
    blocked caller."""
    model, variables = model_vars
    server = StreamingServer(model, variables, max_streams=2,
                             chunk_hops=1, max_wait_ms=1.0)
    first = server.min_first_chunk_samples
    chunk = _signal(0, first)

    # worker not started: process() blocks until close() fails the future
    s = server.open_stream()
    err = [None]

    def call():
        try:
            s.process(chunk)
        except RuntimeError as e:
            err[0] = e
    t = threading.Thread(target=call)
    t.start()
    import time
    time.sleep(0.2)       # let the chunk land in _pending
    s.close()
    t.join(timeout=30)
    assert not t.is_alive() and 'in flight' in str(err[0])

    # stop() fails pending chunks and rejects new submissions
    s2 = server.open_stream()
    err2 = [None]

    def call2():
        try:
            s2.process(chunk)
        except RuntimeError as e:
            err2[0] = e
    t2 = threading.Thread(target=call2)
    t2.start()
    time.sleep(0.2)
    server.stop()
    t2.join(timeout=30)
    assert not t2.is_alive() and 'stopped' in str(err2[0])
    with pytest.raises(RuntimeError, match='stopped'):
        s2.process(chunk)


def test_streaming_server_recovers_after_step_failure(model_vars):
    """A failed (donated-state) mux call must not brick the server: active
    streams are closed with the error, fresh streams work after."""
    model, variables = model_vars
    server = StreamingServer(model, variables, max_streams=2,
                             chunk_hops=1, max_wait_ms=1.0)
    first, hop = server.min_first_chunk_samples, server.chunk_samples
    sig = _signal(1, first + 2 * hop)

    real_mux = server._mux
    boom = {'armed': True}

    def flaky(*a, **k):
        if boom.pop('armed', False):
            raise RuntimeError('injected device failure')
        return real_mux(*a, **k)
    server._mux = flaky

    with server:
        s = server.open_stream()
        s.process(sig[:, :first], timeout=300)
        with pytest.raises(RuntimeError, match='injected'):
            s.process(sig[:, first:first + hop], timeout=300)
        assert s.closed      # carries were donated — stream is dead
        assert server.stats()['resets'] == 1

        s2 = server.open_stream()   # fresh stream on rebuilt state works
        offline = np.asarray(model(variables, jnp.asarray(sig[None])))[0]
        outs = [s2.process(sig[:, :first], timeout=300)]
        for k in range(2):
            a = first + k * hop
            outs.append(s2.process(sig[:, a:a + hop], timeout=300))
        s2.close()
    np.testing.assert_allclose(np.concatenate(outs, axis=-1), offline,
                               atol=2e-5, rtol=1e-5)


def test_streaming_server_int8(model_vars):
    """Int8 weight-only streaming through the multiplexer == the offline
    model evaluated with host-dequantized weights (same f32 kernels)."""
    from encodec_pytorch_tpu.prepare import (dequantize_weights,
                                             prepare_for_inference)
    model, variables = model_vars
    qmodel, qvars = prepare_for_inference(model, variables, weights='int8')
    deq_vars = dict(qvars, params=dequantize_weights(qvars['params']))

    server = StreamingServer(qmodel, qvars, max_streams=2, chunk_hops=1,
                             max_wait_ms=1.0)
    first, hop = server.min_first_chunk_samples, server.chunk_samples
    total = first + 3 * hop
    sig = _signal(2, total)
    offline = np.asarray(qmodel(deq_vars, jnp.asarray(sig[None])))[0]

    with server:
        with server.open_stream() as stream:
            outs = [stream.process(sig[:, :first], timeout=300)]
            for k in range(3):
                a = first + k * hop
                outs.append(stream.process(sig[:, a:a + hop], timeout=300))
    np.testing.assert_allclose(np.concatenate(outs, axis=-1), offline,
                               atol=2e-5, rtol=1e-5)


def test_streaming_server_reused_slot_state_is_fresh(model_vars):
    """A stream reusing a slot must not inherit the previous stream's
    carries: its output equals a fresh offline run."""
    model, variables = model_vars
    server = StreamingServer(model, variables, max_streams=2,
                             chunk_hops=1, max_wait_ms=1.0)
    first = server.min_first_chunk_samples
    total = first + 2 * server.chunk_samples
    a, b = _signal(0, total), _signal(5, total)
    offline_b = np.asarray(model(variables, jnp.asarray(b[None])))[0]

    with server:
        s = server.open_stream()
        s.process(a[:, :first], timeout=300)
        s.process(a[:, first:first + server.chunk_samples], timeout=300)
        slot = s.slot
        s.close()

        s2 = server.open_stream()
        assert s2.slot == slot  # same slot, different stream
        outs = [s2.process(b[:, :first], timeout=300)]
        for k in range(2):
            start = first + k * server.chunk_samples
            outs.append(s2.process(
                b[:, start:start + server.chunk_samples], timeout=300))
        s2.close()

    np.testing.assert_allclose(np.concatenate(outs, axis=-1), offline_b,
                               atol=2e-5, rtol=1e-5)
