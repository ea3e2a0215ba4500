"""Segment-major batching (models/model.py encode_segmajor/decode_segmajor):
flattening a segmented model's S per-segment subgraphs into the batch axis
must reproduce the per-frame path — frame shapes identical, codes/wavs equal
to fp-reduction-order noise — at every batch size, with and without a ragged
tail segment. This is the fix for the measured 48 kHz B>1 serving regression
(VERDICT r4 item 2; docs/PERF_NOTES.md '48 kHz stereo family on chip')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu.models.model import EncodecModel


def _model_48k_style(segment=0.1, channels=2):
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, channels, causal=False,
        model_norm='time_group_norm', audio_normalize=True, segment=segment,
        n_q=2, n_filters=4, name='encodec_48khz')
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    return model, variables


@pytest.mark.parametrize('batch', [1, 3])
@pytest.mark.parametrize('n_samples', [2400 * 3, 2400 * 3 + 1111])
def test_segmajor_matches_perframe(batch, n_samples):
    model, variables = _model_48k_style()
    wav = np.asarray(jax.random.normal(
        jax.random.PRNGKey(2), (batch, 2, n_samples))) * 0.3

    ref_frames = model.encode(variables, jnp.asarray(wav))
    sm_frames = model.encode_segmajor(variables, jnp.asarray(wav))

    assert len(ref_frames) == len(sm_frames)
    for (c0, s0), (c1, s1) in zip(ref_frames, sm_frames):
        assert c0.shape == c1.shape
        # identical per-item math, different program batch dim: codes are
        # argmins over distances that agree to fp noise — equality expected
        # except at near-ties (the tiny test codebook makes each frame only
        # a few dozen codes, so one tie flip moves the ratio a lot)
        agree = float(np.mean(np.asarray(c0) == np.asarray(c1)))
        assert agree >= 0.95, agree
        if s0 is not None:
            np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                       rtol=1e-6)

    ref_wav = model.decode(variables, ref_frames)
    sm_wav = model.decode_segmajor(variables, ref_frames)   # same codes in
    assert ref_wav.shape == sm_wav.shape
    np.testing.assert_allclose(np.asarray(ref_wav), np.asarray(sm_wav),
                               atol=2e-4)


def test_segmajor_roundtrip_close_to_perframe():
    model, variables = _model_48k_style()
    wav = np.asarray(jax.random.normal(
        jax.random.PRNGKey(3), (2, 2, 2400 * 4 + 600))) * 0.3
    ref = np.asarray(model(variables, jnp.asarray(wav)))

    from encodec_pytorch_tpu.deploy import _roundtrip_fn
    sm = np.asarray(_roundtrip_fn(model, variables, segmajor=True)(
        jnp.asarray(wav)))
    assert sm.shape == ref.shape
    # end-to-end through fp-noise-perturbed codes: allow a tiny fraction of
    # samples to sit on flipped-code segments, the bulk must match closely
    close = np.isclose(sm, ref, atol=2e-3).mean()
    assert close > 0.99, close


def test_segmajor_identity_on_single_frame_models():
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(3.)
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(4),
                                       (2, 1, 4800))) * 0.3
    a = model.encode(variables, jnp.asarray(wav))
    b = model.encode_segmajor(variables, jnp.asarray(wav))
    assert len(a) == len(b) == 1
    np.testing.assert_array_equal(np.asarray(a[0][0]), np.asarray(b[0][0]))
    wa = model.decode(variables, a)
    wb = model.decode_segmajor(variables, a)
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))


def test_segmajor_deploy_export_roundtrip(tmp_path):
    """The deployment artifact path (symbolic batch dim) composes with
    segment-major graphs: export a segmented model, run encode+decode via
    DeployedCodec at B>1, match the live per-frame path."""
    from encodec_pytorch_tpu.deploy import DeployedCodec, save_artifact

    model, variables = _model_48k_style(segment=0.1, channels=1)
    length = 2400 * 3 + 600
    path = tmp_path / 'seg.codec'
    save_artifact(str(path), model, variables, lengths=[length],
                  bandwidths=[3.], platforms=('cpu',))
    dep = DeployedCodec.load(str(path))
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                       (2, 1, length))) * 0.3
    out = np.asarray(dep.roundtrip(wav, bandwidth=3.))
    ref = np.asarray(model(variables, jnp.asarray(wav)))
    assert out.shape == ref.shape
    close = np.isclose(out, ref, atol=2e-3).mean()
    assert close > 0.99, close
