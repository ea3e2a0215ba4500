"""Deployment artifacts (deploy.py): serialized StableHLO programs with
baked weights must reproduce the live jitted model (exact codes, float-
tolerance waveforms — the exported program is one fused compilation, the
live op-by-op eval is not), round-trip through the zip container, stay
batch-polymorphic, and cover the segmented/normalized (48 kHz-style)
family including ragged last segments."""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu import deploy
from encodec_pytorch_tpu.models.model import EncodecModel


def _small_model(normalize=False, segment=None, norm='weight_norm',
                 causal=True):
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=causal, model_norm=norm,
        audio_normalize=normalize, segment=segment, name='encodec_24khz',
        n_q=4, n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    return model, variables


def test_artifact_roundtrip(tmp_path):
    """Artifact == live model (exact codes / 1e-6 wavs), across bandwidths
    and a polymorphic batch dim; encode∘decode == roundtrip."""
    model, variables = _small_model()
    path = tmp_path / 'codec.ecdz'
    meta = deploy.save_artifact(path, model, variables, lengths=[1200, 2400],
                                bandwidths=[1.5, 3.])
    assert len(meta['entries']) == 2 * 2 * 3

    codec = deploy.DeployedCodec.load(path)
    assert codec.lengths == [1200, 2400]
    assert codec.bandwidths == [1.5, 3.]

    for batch in (1, 3):
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), (batch, 1, 2400))) * 0.1
        for bw in (1.5, 3.):
            model.set_target_bandwidth(bw)
            live = np.asarray(model(variables, jnp.asarray(x)))
            out = np.asarray(codec.roundtrip(x, bandwidth=bw))
            np.testing.assert_allclose(out, live, atol=1e-6)

            codes = codec.encode(x, bandwidth=bw)
            frames = model.encode(variables, jnp.asarray(x))
            assert len(codes) == len(frames) == 1
            np.testing.assert_array_equal(np.asarray(codes[0]),
                                          np.asarray(frames[0][0]))
            dec = codec.decode(codes, bandwidth=bw, length=2400)
            np.testing.assert_allclose(np.asarray(dec), live, atol=1e-6)


def test_artifact_segmented_normalized_ragged(tmp_path):
    """48 kHz-style flavor: segmentation (incl. the shorter ragged last
    segment the overlap produces) + per-segment scales live inside the
    exported programs; the consumer only sees arrays."""
    model, variables = _small_model(normalize=True, segment=0.1,
                                    norm='time_group_norm', causal=False)
    stride = model.segment_stride
    length = 3 * stride + stride // 2  # ragged tail on purpose
    path = tmp_path / 'codec48.ecdz'
    deploy.save_artifact(path, model, variables, lengths=[length])
    codec = deploy.DeployedCodec.load(path)

    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 1, length))) * 0.2
    live = np.asarray(model(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(codec.roundtrip(x)), live,
                               atol=1e-6)

    codes, scales = codec.encode(x)
    ref_frames = model.encode(variables, jnp.asarray(x))
    assert len(codes) == len(ref_frames) > 1
    # ragged: the last frame is shorter than the first
    assert codes[-1].shape[-1] < codes[0].shape[-1]
    for c, (rc, _) in zip(codes, ref_frames):
        np.testing.assert_array_equal(np.asarray(c), np.asarray(rc))
    assert scales[0].shape == (2, 1)

    dec = codec.decode(codes, scales)  # shape-matched, no length needed
    np.testing.assert_allclose(np.asarray(dec), live, atol=1e-6)

    # scales are mandatory for normalizing artifacts
    with pytest.raises(ValueError, match='normalize'):
        codec.decode(codes, length=length)


def test_kinds_subset_roundtrip_fallback(tmp_path):
    """Artifacts saved without 'roundtrip' entries are smaller (weights are
    baked per entry) and the loader composes encode∘decode instead."""
    model, variables = _small_model(normalize=True, segment=0.1,
                                    norm='time_group_norm', causal=False)
    length = 2 * model.segment_stride + model.segment_length
    full, lean = tmp_path / 'full.ecdz', tmp_path / 'lean.ecdz'
    deploy.save_artifact(full, model, variables, lengths=[length])
    deploy.save_artifact(lean, model, variables, lengths=[length],
                         kinds=['encode', 'decode'])
    assert lean.stat().st_size < 0.8 * full.stat().st_size

    codec = deploy.DeployedCodec.load(lean)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (1, 1, length))) * 0.2
    live = np.asarray(model(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(codec.roundtrip(x)), live,
                               atol=1e-6)

    with pytest.raises(ValueError, match='unknown kinds'):
        deploy.save_artifact(tmp_path / 'x.ecdz', model, variables,
                             lengths=[length], kinds=['encode', 'stream'])


def test_loader_errors_and_container(tmp_path):
    model, variables = _small_model()
    path = tmp_path / 'codec.ecdz'
    deploy.save_artifact(path, model, variables, lengths=[1200])
    codec = deploy.DeployedCodec.load(path)

    with pytest.raises(KeyError, match='serves lengths'):
        codec.roundtrip(np.zeros((1, 1, 999), np.float32))

    # container is a plain zip: meta + one .shlo per entry
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        meta = json.loads(zf.read('meta.json'))
    assert 'meta.json' in names
    assert {e['name'] + '.shlo' for e in meta['entries']} <= names
    assert meta['model_name'] == 'encodec_24khz'
    assert meta['platforms'] == ['cpu', 'tpu']


def test_deploy_cli(tmp_path, monkeypatch):
    from encodec_pytorch_tpu import deploy_cli
    model, variables = _small_model()
    monkeypatch.setitem(
        __import__('encodec_pytorch_tpu.models.model',
                   fromlist=['MODELS']).MODELS,
        'encodec_24khz', lambda checkpoint=None: (model, variables))
    out = tmp_path / 'a.ecdz'
    meta = deploy_cli.main([str(out), '-m', 'encodec_24khz',
                            '--seconds', '0.05', '--bandwidths', '3'])
    assert out.exists() and len(meta['entries']) == 3

    codec = deploy.DeployedCodec.load(out)
    x = np.zeros((1, 1, 1200), np.float32)
    live = np.asarray(model(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(codec.roundtrip(x)), live,
                               atol=1e-6)

    # unsupported bandwidth is refused
    with pytest.raises(SystemExit):
        deploy_cli.main([str(out), '-f', '--bandwidths', '24'])


def test_pallas_gates_refuse_symbolic_dims(monkeypatch):
    """On a TPU host the export trace reaches the Pallas dispatch gates
    with a SYMBOLIC batch dim (shape-polymorphic artifacts). Both gates
    must fall back to the XLA paths instead of raising
    InconclusiveDimensionOperation (found by scripts/check_deploy_tpu.py
    on real hardware) or trying to serialize a Pallas call."""
    from jax import export as jax_export

    from encodec_pytorch_tpu.ops import pallas_lstm, pallas_vq

    b, = jax_export.symbolic_shape('b')
    # VMEM-fit gate: undecidable fit → False, never raises
    assert pallas_lstm.fits((b, 2304, 512), 512) is False
    assert pallas_lstm.fits((12, b, 512), 512) is False
    assert pallas_lstm.fits((1, 2304, 512), 512) is True

    # RVQ gate: force the TPU branch on CPU; the concrete-shape guard must
    # still route the symbolic-batch trace to the scan path (tracing would
    # otherwise die inside rvq_encode_pallas on `M_pad != M`)
    monkeypatch.setattr(pallas_vq, 'available', lambda: True)
    model, variables = _small_model()
    qstate = variables['quantizer']

    exported = jax_export.export(jax.jit(
        lambda st, e: EncodecModel._rvq_encode_impl(st, e, 2)))(
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                         qstate),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32))
    emb = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 128)) * 0.1
    got = exported.call(qstate, emb)
    from encodec_pytorch_tpu.quantization.core_vq import rvq_encode
    want = rvq_encode(qstate, emb, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
