"""Device-side teacher-forced LM scan (VERDICT r2 item 3): the encoder's
one-program ``lax.scan`` probabilities must be BITWISE equal to the
incremental streaming steps the decoder replays — anything less can flip a
quantized-CDF bin and corrupt the arithmetic-coded stream."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from encodec_pytorch_tpu import compress as C
from encodec_pytorch_tpu.models.lm import LMModel
from encodec_pytorch_tpu.models.model import EncodecModel


@pytest.fixture(scope='module')
def lm_and_codes():
    lm_def = LMModel(n_q=4, card=64, num_layers=2, dim=32, num_heads=4,
                     past_context=24)
    params = lm_def.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 4, 1), jnp.int32))['params']
    lm = C.LM(lm_def, params)
    rng = np.random.RandomState(7)
    # T=57 spans several past_context windows and a non-bucket-aligned length
    codes = rng.randint(0, 64, size=(1, 4, 57)).astype(np.int64)
    return lm, codes


def test_scan_probas_bitwise_equal_incremental(lm_and_codes):
    lm, codes = lm_and_codes
    B, K, T = codes.shape
    scan_probas = lm.probas_teacher_forced(codes)       # [B, card, K, T]

    state = None
    input_ = np.zeros((B, K, 1), np.int64)
    for t in range(T):
        probas, state = lm.step(input_, state)
        input_ = 1 + codes[:, :, t:t + 1]
        same = scan_probas[..., t:t + 1] == probas
        assert same.all(), (
            f"step {t}: {(~same).sum()} of {same.size} probas differ "
            f"(max |Δ| {np.abs(scan_probas[..., t:t+1] - probas).max():.3e})")


def test_scan_and_incremental_streams_byte_identical(lm_and_codes):
    import io

    lm, codes = lm_and_codes
    fo_scan, fo_inc = io.BytesIO(), io.BytesIO()
    C._compress_frame_lm(lm, codes, fo_scan, device_scan=True)
    C._compress_frame_lm(lm, codes, fo_inc, device_scan=False)
    assert fo_scan.getvalue() == fo_inc.getvalue()

    # and the incremental decoder (the only decoder) recovers the codes
    frame = C._decompress_frame_lm(lm, io.BytesIO(fo_scan.getvalue()),
                                   codes.shape[1], codes.shape[2])
    np.testing.assert_array_equal(frame, codes[0])


def test_lm_roundtrip_through_codec_uses_scan(lm_and_codes):
    """Full compress/decompress with the scan default stays exact."""
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=4,
        n_filters=4)
    variables = model.init(jax.random.PRNGKey(1), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(2),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    lm_def = LMModel(n_q=model.quantizer.n_q, card=model.quantizer.bins,
                     num_layers=1, dim=16, num_heads=4, past_context=8)
    lm = C.LM(lm_def, lm_def.init(jax.random.PRNGKey(3),
                                  jnp.zeros((1, 4, 1), jnp.int32))['params'])
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (1, 2400))) * 0.1

    data_scan = C.compress(model, variables, wav, use_lm=True, lm=lm)
    data_inc = C.compress(model, variables, wav, use_lm=True, lm=lm,
                          lm_device_scan=False)
    assert data_scan == data_inc
    out, _ = C.decompress(model, variables, data_scan, lm=lm)
    direct = np.asarray(model(variables, jnp.asarray(wav[None]))[0])
    np.testing.assert_allclose(out, direct, atol=1e-5)
