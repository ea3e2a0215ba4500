"""Serving runtime (serve.py): the micro-batching server must return
exactly what direct calls return, coalesce compatible queued requests
into one padded dispatch, keep incompatible requests apart, propagate
errors, and run from either backend (live model / StableHLO artifact)."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu import deploy
from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.serve import CodecServer, LiveCodec


@pytest.fixture(scope='module')
def live():
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
    return model, variables, LiveCodec(model, variables)


def _clips(n, t, seed=0):
    k = jax.random.PRNGKey(seed)
    return [np.asarray(jax.random.normal(jax.random.fold_in(k, i),
                                         (1, t))) * 0.1 for i in range(n)]


def test_live_codec_matches_model(live):
    model, variables, codec = live
    x = _clips(1, 2400)[0][None]
    live_out = np.asarray(model(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(codec.roundtrip(x)), live_out,
                               atol=1e-6)
    codes = codec.encode(x, bandwidth=1.5)
    ref = model.encode(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(codes[0]),
                                  np.asarray(ref[0][0]))
    dec = codec.decode(codes, bandwidth=1.5, length=2400)
    model.set_target_bandwidth(1.5)
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(model(variables, jnp.asarray(x))),
        atol=1e-6)
    model.set_target_bandwidth(3.)


def test_server_coalesces_and_matches(live):
    """Requests queued before the worker starts land in ONE padded batch,
    and each result equals the direct single-clip call."""
    _, _, codec = live
    clips = _clips(5, 2400)
    direct = [np.asarray(codec.roundtrip(c[None]))[0] for c in clips]

    server = CodecServer(codec, max_batch=8, max_wait_ms=1.0)
    futures = [server.submit('roundtrip', c) for c in clips]  # not started
    server.start()
    try:
        outs = [f.result(timeout=300) for f in futures]
    finally:
        server.stop()

    for out, ref in zip(outs, direct):
        assert out.shape == ref.shape == (1, 2400)
        np.testing.assert_allclose(out, ref, atol=1e-6)
    s = server.stats()
    assert s['requests'] == 5 and s['batches'] == 1
    assert s['mean_batch'] == 5 and s['padded_items'] == 3  # bucket 8
    assert 'latency_p50_ms' in s


def test_server_separates_incompatible(live):
    """Different lengths / bandwidths / kinds never share a dispatch."""
    _, _, codec = live
    a, b = _clips(1, 2400)[0], _clips(1, 1200, seed=9)[0]
    server = CodecServer(codec, max_batch=8, max_wait_ms=1.0)
    f1 = server.submit('roundtrip', a)
    f2 = server.submit('roundtrip', b)            # different T
    f3 = server.submit('roundtrip', a, bandwidth=1.5)   # different bw
    f4 = server.submit('encode', a)               # different kind
    server.start()
    try:
        r1, r2, r3, r4 = [f.result(timeout=300) for f in (f1, f2, f3, f4)]
    finally:
        server.stop()
    assert r1.shape == (1, 2400) and r2.shape == (1, 1200)
    np.testing.assert_allclose(
        r3, np.asarray(codec.roundtrip(a[None], bandwidth=1.5))[0],
        atol=1e-6)
    assert r4[0].shape[0] == 4  # n_q at bw=3 (0.75 kbps/codebook)
    assert server.stats()['batches'] == 4


def test_server_encode_decode_roundtrip(live):
    """encode → decode through the server == roundtrip through the server."""
    _, _, codec = live
    clip = _clips(1, 2400, seed=3)[0]
    with CodecServer(codec, max_wait_ms=0.5) as server:
        codes = server.encode(clip, timeout=300)
        wav = server.decode(codes, length=2400, timeout=300)
        rt = server.roundtrip(clip, timeout=300)
    np.testing.assert_allclose(wav, rt, atol=1e-6)


def test_server_concurrent_threads(live):
    """Many caller threads, mixed shapes: all results correct."""
    _, _, codec = live
    clips = _clips(6, 2400, seed=5) + _clips(6, 1200, seed=6)
    direct = [np.asarray(codec.roundtrip(c[None]))[0] for c in clips]
    results = [None] * len(clips)

    with CodecServer(codec, max_batch=4, max_wait_ms=20.0) as server:
        def call(i):
            results[i] = server.roundtrip(clips[i], timeout=300)
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(clips))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        s = server.stats()

    for out, ref in zip(results, direct):
        np.testing.assert_allclose(out, ref, atol=1e-6)
    assert s['requests'] == 12
    assert s['batches'] < 12  # some coalescing must have happened


def test_server_randomized_concurrency_fuzz(live):
    """Randomized mixed workload: N threads, random kind/length/bandwidth
    per request — every result must equal its direct single-call value
    regardless of how the batcher grouped them."""
    import random
    _, _, codec = live
    rng = random.Random(42)
    lengths = [1200, 2400]
    bandwidths = [1.5, 3.0]
    jobs = []
    for i in range(20):
        kind = rng.choice(['roundtrip', 'encode'])
        t = rng.choice(lengths)
        bw = rng.choice(bandwidths)
        clip = _clips(1, t, seed=100 + i)[0]
        jobs.append((kind, clip, bw))

    direct = []
    for kind, clip, bw in jobs:
        if kind == 'roundtrip':
            direct.append(np.asarray(codec.roundtrip(clip[None],
                                                     bandwidth=bw))[0])
        else:
            direct.append(np.asarray(codec.encode(clip[None],
                                                  bandwidth=bw)[0])[0])

    results = [None] * len(jobs)
    with CodecServer(codec, max_batch=4, max_wait_ms=10.0) as server:
        def call(i):
            kind, clip, bw = jobs[i]
            if kind == 'roundtrip':
                results[i] = server.roundtrip(clip, bandwidth=bw,
                                              timeout=300)
            else:
                results[i] = server.encode(clip, bandwidth=bw,
                                           timeout=300)[0]
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(jobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    for (kind, _c, _b), out, ref in zip(jobs, results, direct):
        if kind == 'encode':
            np.testing.assert_array_equal(out, ref)
        else:
            np.testing.assert_allclose(out, ref, atol=1e-6)


def test_server_error_propagates(live):
    _, _, codec = live
    with CodecServer(codec, max_wait_ms=0.5) as server:
        fut = server.submit('roundtrip', np.zeros((3, 7, 5), np.float32))
        with pytest.raises(Exception):
            fut.result(timeout=300)
        # server stays alive for good requests afterwards
        out = server.roundtrip(_clips(1, 1200)[0], timeout=300)
    assert out.shape == (1, 1200)
    with pytest.raises(ValueError, match='kind'):
        server.submit('stream', np.zeros((1, 10), np.float32))


def test_live_codec_default_bandwidth_is_order_independent():
    """A model that never had set_target_bandwidth called must serve a
    deterministic default (highest bandwidth), not whatever a previous
    request left on the shared mutable model."""
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=4,
        n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited))
    assert model.bandwidth is None
    codec = LiveCodec(model, variables)
    assert codec.default_bandwidth == 3.

    x = np.zeros((1, 1, 1200), np.float32)
    k_before = codec.encode(x)[0].shape[-2]
    codec.encode(x, bandwidth=1.5)          # mutates the shared model
    k_after = codec.encode(np.zeros((2, 1, 1200), np.float32))[0].shape[-2]
    assert k_before == k_after == 4         # n_q at 3 kbps, both times


def test_server_int8_backend(live):
    """LiveCodec over int8 weight-only variables (in-program dequant) must
    match prepare.quantized_call's math through the server."""
    from encodec_pytorch_tpu.prepare import prepare_for_inference, \
        quantized_call
    model, variables, _ = live
    qmodel, qvars = prepare_for_inference(model, variables, weights='int8')
    clip = _clips(1, 2400, seed=11)[0]
    ref = np.asarray(quantized_call(qmodel, qvars, jnp.asarray(clip[None]),
                                    dtype=jnp.float32))[0]
    with CodecServer(LiveCodec(qmodel, qvars), max_wait_ms=0.5) as server:
        out = server.roundtrip(clip, timeout=300)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_server_artifact_backend(tmp_path, live):
    """The same server runs from a StableHLO artifact (DeployedCodec)."""
    model, variables, codec = live
    path = tmp_path / 'codec.ecdz'
    deploy.save_artifact(path, model, variables, lengths=[2400],
                         bandwidths=[3.], kinds=['encode', 'decode',
                                                 'roundtrip'])
    artifact = deploy.DeployedCodec.load(path)
    clips = _clips(3, 2400, seed=7)
    with CodecServer(artifact, max_batch=4, max_wait_ms=1.0) as server:
        outs = [server.roundtrip(c, bandwidth=3., timeout=300)
                for c in clips]
    for c, out in zip(clips, outs):
        ref = np.asarray(codec.roundtrip(c[None], bandwidth=3.))[0]
        np.testing.assert_allclose(out, ref, atol=1e-6)


# ------------------------------------------------------- length bucketing


@pytest.fixture(scope='module')
def live_const():
    """Constant-pad variant: the configuration where length bucketing is
    provably BIT-exact (LiveCodec.length_pad_exact)."""
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=4,
        n_filters=4, pad_mode='constant')
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    return model, variables, LiveCodec(model, variables)


def test_length_pad_exact_constant_mode(live_const):
    """With pad_mode='constant', right-zero-padding the time axis is
    value-exact: the padding an unpadded encode adds to complete its last
    window is zeros too, so code indices are identical and wavs agree to
    per-shape XLA compilation fp noise (~1e-7 — different input lengths
    compile different fusions) after slicing — at every length, including
    ones where the reflect-pad model diverges (800, 1600)."""
    model, variables, codec = live_const
    assert codec.length_pad_exact
    hop = codec.hop_length
    Tpad = 2400
    for T in (800, 1600, 2000, 2399):
        x = _clips(1, T, seed=7)[0][None]
        xp = np.pad(x, [(0, 0), (0, 0), (0, Tpad - T)])
        frames = -(-T // hop)

        codes = np.asarray(codec.encode(x)[0])
        codes_p = np.asarray(codec.encode(xp)[0])
        np.testing.assert_array_equal(codes_p[..., :frames], codes)

        rt = np.asarray(codec.roundtrip(x))
        rt_p = np.asarray(codec.roundtrip(xp))
        np.testing.assert_allclose(rt_p[..., :T], rt[..., :T], atol=1e-6)

        dec = np.asarray(codec.decode((codes,)))
        dec_p = np.asarray(codec.decode((codes_p,)))
        np.testing.assert_allclose(dec_p[..., :frames * hop],
                                   dec[..., :frames * hop], atol=1e-6)


def test_length_pad_tail_exact_reflect_mode(live):
    """With the reference-default pad_mode='reflect' (the `live` fixture),
    the unpadded call reflects REAL samples into each layer's last-window
    completion while a zero-bucketed call sees zeros — so the FINAL frame
    of codes (and the final hop of audio) may legitimately differ, and
    everything before it is exact (the divergence's causal cone). This
    pins the length_pad_tail_exact contract."""
    model, variables, codec = live
    assert not codec.length_pad_exact and codec.length_pad_tail_exact
    hop = codec.hop_length
    m = codec.length_pad_min_samples
    assert m > 0   # reflect models have a short-input horizon
    Tpad = -(-(m + 480) // hop) * hop
    for T in (m, m + 160, Tpad - 1):
        x = _clips(1, T, seed=7)[0][None]
        xp = np.pad(x, [(0, 0), (0, 0), (0, Tpad - T)])
        frames = -(-T // hop)
        codes = np.asarray(codec.encode(x)[0])
        codes_p = np.asarray(codec.encode(xp)[0])
        np.testing.assert_array_equal(codes_p[..., :frames - 1],
                                      codes[..., :frames - 1])
        rt = np.asarray(codec.roundtrip(x))
        rt_p = np.asarray(codec.roundtrip(xp))
        cut = (frames - 1) * hop
        np.testing.assert_allclose(rt_p[..., :cut], rt[..., :cut],
                                   atol=1e-6)


def test_server_length_buckets_coalesce_mixed_lengths(live_const):
    """Mixed-length roundtrip traffic coalesces into ONE batch under
    length_buckets (without them the exact-shape key dispatches serially),
    and every result matches the direct call (tolerance = batch-size fp
    variation only, measured ~6e-8)."""
    _, _, codec = live_const
    lengths = [1600, 2000, 2399, 2400, 800]
    clips = [_clips(1, t, seed=10 + i)[0] for i, t in enumerate(lengths)]
    direct = [np.asarray(codec.roundtrip(c[None]))[0] for c in clips]

    server = CodecServer(codec, max_batch=8, max_wait_ms=1.0,
                         length_buckets=[2400])
    futures = [server.submit('roundtrip', c) for c in clips]
    server.start()
    try:
        outs = [f.result(timeout=300) for f in futures]
    finally:
        server.stop()

    for out, ref, t in zip(outs, direct, lengths):
        assert out.shape == (1, t)
        np.testing.assert_allclose(out, ref[..., :t], atol=1e-6)
    s = server.stats()
    assert s['batches'] == 1 and s['mean_batch'] == 5


def test_server_length_buckets_encode_decode(live_const):
    """Encode and decode requests bucket too: codes are sliced to the true
    frame count (bit-exact), decoded wavs to frames*hop."""
    model, variables, codec = live_const
    hop = codec.hop_length
    lengths = [1200, 2000, 2400]
    clips = [_clips(1, t, seed=20 + i)[0] for i, t in enumerate(lengths)]
    direct_codes = [np.asarray(codec.encode(c[None])[0])[0] for c in clips]

    server = CodecServer(codec, max_batch=8, max_wait_ms=1.0,
                         length_buckets=[2400]).start()
    try:
        futs = [server.submit('encode', c) for c in clips]
        codes = [np.asarray(f.result(timeout=300)[0]) for f in futs]
        for got, ref, t in zip(codes, direct_codes, lengths):
            assert got.shape[-1] == -(-t // hop)
            np.testing.assert_array_equal(got, ref)

        dfuts = [server.submit('decode', ((c,),)) for c in codes]
        decs = [np.asarray(f.result(timeout=300)) for f in dfuts]
        for dec, c in zip(decs, codes):
            ref = np.asarray(codec.decode((c[None],)))[0]
            assert dec.shape[-1] == c.shape[-1] * hop
            np.testing.assert_allclose(dec, ref[..., :dec.shape[-1]],
                                       atol=1e-6)
    finally:
        server.stop()


def test_server_length_buckets_mixed_concurrency_fuzz(live_const):
    """Randomized mixed-length concurrent traffic (the VERDICT r3 case):
    exact outputs AND real coalescing (mean_batch > 1)."""
    _, _, codec = live_const
    rng = np.random.RandomState(0)
    lengths = [int(rng.randint(400, 2401)) for _ in range(24)]
    clips = [_clips(1, t, seed=100 + i)[0] for i, t in enumerate(lengths)]
    direct = {i: np.asarray(codec.roundtrip(c[None]))[0]
              for i, c in enumerate(clips)}

    server = CodecServer(codec, max_batch=8, max_wait_ms=20.0,
                         length_buckets=[800, 1600, 2400]).start()
    results = {}
    errors = []

    def call(i):
        try:
            results[i] = server.roundtrip(clips[i], timeout=600)
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    try:
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(clips))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        server.stop()

    assert not errors, errors
    for i, t in enumerate(lengths):
        assert results[i].shape == (1, t)
        np.testing.assert_allclose(results[i], direct[i][..., :t],
                                   atol=1e-6)
    s = server.stats()
    assert s['requests'] == 24
    assert s['mean_batch'] > 1.0, s   # coalescing actually happened


def test_length_buckets_refused_for_normalizing_backend():
    model = EncodecModel._get_model(
        [1.5], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=True, segment=None, name='toy', n_q=2, n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    model.set_target_bandwidth(1.5)
    codec = LiveCodec(model, variables)
    assert not codec.length_pad_exact
    assert not codec.length_pad_tail_exact
    with pytest.raises(ValueError, match='length_buckets'):
        CodecServer(codec, length_buckets=[2400])


def test_length_buckets_overflow_falls_back_exact(live_const):
    """A request longer than the largest bucket keeps its exact shape and
    still returns the exact direct result."""
    _, _, codec = live_const
    c = _clips(1, 3200, seed=42)[0]
    direct = np.asarray(codec.roundtrip(c[None]))[0]
    with CodecServer(codec, max_wait_ms=1.0,
                     length_buckets=[2400]) as server:
        out = server.roundtrip(c, timeout=300)
    np.testing.assert_array_equal(out, direct)


def test_server_length_buckets_deployed_backend(tmp_path, live_const):
    """Length bucketing works over a StableHLO artifact backend too: the
    artifact records the pad-exactness gates (deploy.save_artifact meta)
    and the server pads mixed-length traffic up to an exported length."""
    from encodec_pytorch_tpu import deploy

    model, variables, codec = live_const
    path = tmp_path / 'codec.ecdz'
    deploy.save_artifact(str(path), model, variables, lengths=[2400],
                         bandwidths=[3.0], platforms=['cpu'])
    dc = deploy.DeployedCodec.load(str(path))
    assert dc.length_pad_exact and dc.hop_length == codec.hop_length

    lengths = [1600, 2000, 800]
    clips = [_clips(1, t, seed=30 + i)[0] for i, t in enumerate(lengths)]
    direct = [np.asarray(codec.roundtrip(c[None], bandwidth=3.0))[0]
              for c in clips]
    server = CodecServer(dc, max_batch=4, max_wait_ms=1.0,
                         length_buckets=[2400])
    futures = [server.submit('roundtrip', c, bandwidth=3.0) for c in clips]
    server.start()
    try:
        outs = [f.result(timeout=300) for f in futures]
    finally:
        server.stop()
    for out, ref, t in zip(outs, direct, lengths):
        assert out.shape == (1, t)
        np.testing.assert_allclose(out, ref[..., :t], atol=1e-5)
    assert server.stats()['batches'] == 1
