"""Inference preparation (prepare.py): weight-norm folding + int8 weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.prepare import (
    dequantize_weights, fold_weight_norm, param_bytes, prepare_for_inference,
    quantize_weights, quantized_call)


def _model_and_vars(n_filters=8, norm='weight_norm', causal=True):
    model = EncodecModel._get_model(
        [1.5, 3., 6.], 24_000, 1, causal=causal, model_norm=norm,
        audio_normalize=False, segment=None, n_q=8, n_filters=n_filters)
    model.set_target_bandwidth(6.)
    variables = model.init(jax.random.PRNGKey(0), example_length=1920)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    return model, variables


def test_fold_weight_norm_is_exact():
    """The folded norm='none' twin computes the same forward — the fold is
    the same g·v/‖v‖ arithmetic done once instead of per call."""
    model, variables = _model_and_vars()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1920)) * 0.1
    y_ref = np.asarray(model(variables, x))
    folded, fvars = fold_weight_norm(model, variables)
    # param tree really changed parametrization
    flat = jax.tree_util.tree_flatten_with_path(fvars['params'])[0]
    keys = {str(p[-1]) for p, _ in flat}
    assert not any('v' == str(k)[-2:-1] for k in keys)
    y_fold = np.asarray(folded(fvars, x))
    np.testing.assert_allclose(y_fold, y_ref, atol=1e-6, rtol=1e-6)


def test_fold_rejects_group_norm():
    model, variables = _model_and_vars(norm='time_group_norm', causal=False)
    with pytest.raises(ValueError, match='weight_norm'):
        fold_weight_norm(model, variables)


def test_quantize_roundtrip_error_bound():
    """Dequantized weights match originals within the symmetric-int8 bound
    max|w|/254 per trailing channel, and int8 storage is ~4× smaller."""
    model, variables = _model_and_vars()
    _, fvars = fold_weight_norm(model, variables)
    qp = quantize_weights(fvars['params'])
    dq = dequantize_weights(qp)

    flat_orig = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(fvars['params'])[0]}
    n_quantized = 0
    for path, v in jax.tree_util.tree_flatten_with_path(dq)[0]:
        key = jax.tree_util.keystr(path)
        w = flat_orig[key]
        if w.ndim >= 2 and ('kernel' in key or 'w_ih' in key or 'w_hh' in key):
            amax = np.max(np.abs(np.asarray(w)),
                          axis=tuple(range(w.ndim - 1)), keepdims=True)
            assert np.max(np.abs(np.asarray(v) - np.asarray(w))
                          - amax / 254.0) <= 1e-6
            n_quantized += 1
        else:
            np.testing.assert_array_equal(np.asarray(v), np.asarray(w))
    assert n_quantized > 30  # the whole conv/LSTM stack got quantized

    b_f32 = param_bytes(fvars['params'])
    b_q = param_bytes(qp)
    assert b_q < 0.35 * b_f32  # kernels dominate → ~4× smaller


def test_int8_forward_is_close():
    """Weight-only int8 serving forward stays close to the f32 forward:
    identical code indices on most frames and small waveform error."""
    model, variables = _model_and_vars(n_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1920)) * 0.1
    y_ref = np.asarray(model(variables, x))

    qmodel, qvars = prepare_for_inference(model, variables, weights='int8')
    y_q = np.asarray(quantized_call(qmodel, qvars, x))
    assert y_q.shape == y_ref.shape
    rel = np.linalg.norm(y_q - y_ref) / (np.linalg.norm(y_ref) + 1e-12)
    assert rel < 0.25, rel  # random-weight model; bounded end-to-end drift

    # decode side is linear in the weights: same codes must decode closely
    frames = model.encode(variables, x)
    dq_vars = dict(qvars, params=dequantize_weights(qvars['params']))
    y_dec_ref = np.asarray(model.decode(variables, frames))
    y_dec_q = np.asarray(qmodel.decode(dq_vars, frames))
    rel_dec = (np.linalg.norm(y_dec_q - y_dec_ref)
               / (np.linalg.norm(y_dec_ref) + 1e-12))
    assert rel_dec < 0.05, rel_dec


def test_quantized_call_tracks_bandwidth():
    """Regression: the quantized-serving jit cache must be keyed on the
    model bandwidth (it selects n_q at trace time) — switching via
    set_target_bandwidth must not reuse the stale compiled program."""
    model, variables = _model_and_vars(n_filters=8)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 1920)) * 0.1
    qmodel, qvars = prepare_for_inference(model, variables, weights='int8')

    qmodel.set_target_bandwidth(1.5)
    model.set_target_bandwidth(1.5)
    y_lo = np.asarray(quantized_call(qmodel, qvars, x))
    ref_lo = np.asarray(model(variables, x))
    qmodel.set_target_bandwidth(6.)
    model.set_target_bandwidth(6.)
    y_hi = np.asarray(quantized_call(qmodel, qvars, x))
    ref_hi = np.asarray(model(variables, x))

    assert not np.allclose(ref_lo, ref_hi)  # bandwidths really differ
    # each quantized output tracks its own bandwidth's reference, and the
    # int8 outputs differ from each other the same way
    assert np.linalg.norm(y_lo - ref_lo) < np.linalg.norm(y_lo - ref_hi)
    assert np.linalg.norm(y_hi - ref_hi) < np.linalg.norm(y_hi - ref_lo)
    assert not np.allclose(y_lo, y_hi)


def test_prepared_variables_feed_streaming():
    """Folded params run through the streaming interpreter (it consumes the
    'kernel' parametrization directly) and match the batch forward."""
    from encodec_pytorch_tpu.streaming import StreamingCodec

    model, variables = _model_and_vars(n_filters=8)
    folded, fvars = fold_weight_norm(model, variables)
    codec = StreamingCodec(folded)
    hop = codec.hop
    T = hop * 16
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 1, T)) * 0.1
    y_batch = np.asarray(folded(fvars, x))

    enc_state, dec_state = codec.init_state(1)
    first = codec.min_first_chunk_samples
    assert first < T
    outs = []
    pos = 0
    chunk_sizes = [first] + [hop] * ((T - first) // hop)
    for i, n in enumerate(chunk_sizes):
        wav = x[:, :, pos:pos + n]
        pos += n
        out, _codes, enc_state, dec_state = codec.roundtrip_chunk(
            fvars, enc_state, dec_state, wav, first=(i == 0))
        outs.append(np.asarray(out))
    y_stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        y_stream, y_batch[:, :, :y_stream.shape[-1]], atol=2e-5)

    # int8 variables stream too: the chunk programs dequantize in-program
    # (HBM holds int8) and must match the batched quantized forward
    qmodel, qvars = prepare_for_inference(model, variables, weights='int8')
    qmodel.set_target_bandwidth(6.)
    y_qbatch = np.asarray(quantized_call(qmodel, qvars, x))
    qcodec = StreamingCodec(qmodel)
    enc_state, dec_state = qcodec.init_state(1)
    outs_q = []
    pos = 0
    for i, n in enumerate(chunk_sizes):
        wav = x[:, :, pos:pos + n]
        pos += n
        out, _codes, enc_state, dec_state = qcodec.roundtrip_chunk(
            qvars, enc_state, dec_state, wav, first=(i == 0))
        outs_q.append(np.asarray(out))
    y_qstream = np.concatenate(outs_q, axis=-1)
    np.testing.assert_allclose(
        y_qstream, y_qbatch[:, :, :y_qstream.shape[-1]], atol=2e-5)


if __name__ == '__main__':
    pytest.main([__file__, '-v'])
