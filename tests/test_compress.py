"""Compress/decompress: exact code round-trips (packed + LM paths), wire
format, and CLI round-trip."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu import compress as C
from encodec_pytorch_tpu.bitstream import read_ecdc_header
from encodec_pytorch_tpu.models.lm import LMModel
from encodec_pytorch_tpu.models.model import EncodecModel


@pytest.fixture(scope='module')
def small_model():
    model = EncodecModel._get_model(
        [1.5, 3., 6.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=8,
        n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(6.)
    return model, variables


def test_compress_roundtrip_packed(small_model):
    model, variables = small_model
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 24000))) * 0.1
    data = C.compress(model, variables, wav, use_lm=False)

    # header sanity
    meta = read_ecdc_header(io.BytesIO(data))
    assert meta['m'] == 'encodec_24khz' and meta['al'] == 24000
    assert meta['nc'] == 8 and meta['lm'] is False

    # decompressed codes must reproduce the direct eval forward
    out, sr = C.decompress(model, variables, data)
    assert sr == 24000
    direct = np.asarray(model(variables, jnp.asarray(wav[None]))[0])
    np.testing.assert_allclose(out, direct, atol=1e-5)

    # achieved bitrate ≈ 6 kbps (8 codebooks × 10 bits × 75 Hz) + header
    kbps = 8 * len(data) / 1000 / (wav.shape[-1] / model.sample_rate)
    assert 5.5 < kbps < 7.5, kbps


def test_compress_normalized_scale_roundtrip():
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=None, name='my_encodec', n_q=2,
        n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(1.5)
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 2400))) * 0.3
    data = C.compress(model, variables, wav)
    out, _ = C.decompress(model, variables, data)
    direct = np.asarray(model(variables, jnp.asarray(wav[None]))[0])
    # float32 scale serialization costs a little precision
    np.testing.assert_allclose(out, direct, atol=1e-4)


def test_compress_roundtrip_lm(small_model):
    model, variables = small_model
    lm_def = LMModel(n_q=model.quantizer.n_q, card=model.quantizer.bins,
                     num_layers=1, dim=16, num_heads=4, past_context=8)
    lm_params = lm_def.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, 8, 1), jnp.int32))['params']
    lm = C.LM(lm_def, lm_params)
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 1200))) * 0.1
    data_lm = C.compress(model, variables, wav, use_lm=True, lm=lm)
    out, _ = C.decompress(model, variables, data_lm, lm=lm)
    direct = np.asarray(model(variables, jnp.asarray(wav[None]))[0])
    np.testing.assert_allclose(out, direct, atol=1e-5)


def test_cli_weights_fold(tmp_path, small_model, monkeypatch):
    """``--weights fold`` folds weight norm at load (prepare.py) and must be
    wire-invisible: bit-identical .ecdc vs the raw path (the folded model
    keeps its name, which rides in the ECDC header) and a clean decode
    through the folded graph."""
    from encodec_pytorch_tpu import cli
    from encodec_pytorch_tpu.data.audio_io import read_wav, write_wav
    model, variables = small_model
    monkeypatch.setitem(
        __import__('encodec_pytorch_tpu.models.model',
                   fromlist=['MODELS']).MODELS,
        'encodec_24khz', lambda checkpoint=None: (model, variables))

    wav = (0.2 * np.sin(np.linspace(0, 200, 2400))).astype(np.float32)[None]
    inp = tmp_path / 'in.wav'
    write_wav(inp, wav, 24000)

    raw_ecdc = tmp_path / 'raw.ecdc'
    fold_ecdc = tmp_path / 'fold.ecdc'
    cli.main([str(inp), str(raw_ecdc), '-b', '6', '--weights', 'raw'])
    cli.main([str(inp), str(fold_ecdc), '-b', '6', '--weights', 'fold'])
    assert raw_ecdc.read_bytes() == fold_ecdc.read_bytes()

    out_wav = tmp_path / 'fold.wav'
    cli.main([str(fold_ecdc), str(out_wav), '--weights', 'fold'])
    dec, sr = read_wav(out_wav)
    assert sr == 24000 and dec.shape == (1, 2400)


def test_cli_weights_fold_rejects_non_weight_norm(tmp_path, monkeypatch):
    """--weights fold on a non-weight_norm flavor must fail loudly
    (fold_weight_norm only folds the (v, g) parametrization)."""
    from encodec_pytorch_tpu import cli
    from encodec_pytorch_tpu.data.audio_io import write_wav
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=2,
        n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    monkeypatch.setitem(
        __import__('encodec_pytorch_tpu.models.model',
                   fromlist=['MODELS']).MODELS,
        'encodec_24khz', lambda checkpoint=None: (model, variables))
    inp = tmp_path / 'in.wav'
    write_wav(inp, np.zeros((1, 2400), np.float32), 24000)
    with pytest.raises(SystemExit):
        cli.main([str(inp), str(tmp_path / 'o.ecdc'), '-b', '3',
                  '--weights', 'fold'])


def test_cli_roundtrip(tmp_path, small_model, monkeypatch):
    from encodec_pytorch_tpu import cli
    from encodec_pytorch_tpu.data.audio_io import read_wav, write_wav
    model, variables = small_model
    # route the CLI's model factory to the fixture model
    monkeypatch.setitem(
        __import__('encodec_pytorch_tpu.models.model',
                   fromlist=['MODELS']).MODELS,
        'encodec_24khz', lambda checkpoint=None: (model, variables))

    wav = (0.2 * np.sin(np.linspace(0, 200, 2400))).astype(np.float32)[None]
    inp = tmp_path / 'in.wav'
    write_wav(inp, wav, 24000)

    ecdc = tmp_path / 'out.ecdc'
    cli.main([str(inp), str(ecdc), '-b', '6'])
    assert ecdc.read_bytes()[:4] == b'ECDC'

    out_wav = tmp_path / 'out.wav'
    cli.main([str(ecdc), str(out_wav)])
    dec, sr = read_wav(out_wav)
    assert sr == 24000 and dec.shape == (1, 2400)
