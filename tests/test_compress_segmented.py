"""Segmented (48k-style) .ecdc compression: multi-frame packed streams with
per-frame scale floats round-trip exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu import compress as C
from encodec_pytorch_tpu.models.model import EncodecModel


def test_multi_frame_packed_roundtrip():
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=0.1, n_q=2, n_filters=4,
        name='encodec_48khz')
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)

    # 3 full segments + stride overlap
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                       (1, 2400 * 3))) * 0.3
    data = C.compress(model, variables, wav)
    out, sr = C.decompress(model, variables, data)
    direct = np.asarray(model(variables, jnp.asarray(wav[None]))[0])
    np.testing.assert_allclose(out, direct, atol=1e-4)


def test_lm_segmented_raises():
    import pytest
    model = EncodecModel._get_model(
        [1.5], 24000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=0.05, n_q=2, n_filters=4,
        name='encodec_48khz')
    variables = model.init(jax.random.PRNGKey(0), example_length=1200)
    wav = np.zeros((1, 3600), np.float32)
    with pytest.raises(ValueError, match='segmented'):
        C.compress(model, variables, wav, use_lm=True, lm=object())


def test_lm_fused_segmented_roundtrip():
    """48k-style segmented + normalized + LM: the fused codec supports
    multi-frame LM streams (length-prefixed per frame under the 'lmv'
    extension — the host/reference format cannot, compress.py:120-156).
    The decoded wav must equal the packed-path decode bit-for-bit."""
    from encodec_pytorch_tpu.models.lm import LMModel

    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=0.1, n_q=2, n_filters=4,
        name='encodec_48khz')
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)

    lm_def = LMModel(n_q=model.quantizer.n_q, card=model.quantizer.bins,
                     num_layers=2, dim=32, num_heads=4, past_context=24)
    params = lm_def.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, lm_def.n_q, 1), jnp.int32))['params']
    lm = C.LM(lm_def, params)

    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                       (1, 2400 * 3))) * 0.3
    data_lm = C.compress(model, variables, wav, use_lm=True, lm=lm,
                         lm_fused=True)
    out_lm, sr = C.decompress(model, variables, data_lm, lm=lm)
    data_packed = C.compress(model, variables, wav)
    out_packed, _ = C.decompress(model, variables, data_packed)
    np.testing.assert_array_equal(out_lm, out_packed)
    assert sr == 24000
