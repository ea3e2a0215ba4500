"""Bitstream robustness: truncated streams fail loudly; every bandwidth's
bit width (incl. non-byte-aligned) round-trips; bitrate matches the policy."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_pytorch_tpu import compress as C
from encodec_pytorch_tpu.models.model import EncodecModel


@pytest.fixture(scope='module')
def model():
    m = EncodecModel._get_model(
        [1.5, 3., 6.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, name='encodec_24khz', n_q=8,
        n_filters=4)
    variables = m.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    return m, variables


@pytest.mark.parametrize('bw,n_q', [(1.5, 2), (3., 4), (6., 8)])
def test_every_bandwidth_roundtrips_at_policy_bitrate(model, bw, n_q):
    m, variables = model
    m.set_target_bandwidth(bw)
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 24000))) * 0.1
    data = C.compress(m, variables, wav)
    # payload bits = n_q codebooks × 10 bits × 75 frames (+ header ~90 B)
    payload_kbps = n_q * 10 * 75 / 1000
    kbps = 8 * len(data) / 1000
    assert payload_kbps < kbps < payload_kbps + 1.5, (kbps, payload_kbps)
    out, _ = C.decompress(m, variables, data)
    direct = np.asarray(m(variables, jnp.asarray(wav[None]))[0])
    np.testing.assert_allclose(out, direct, atol=1e-5)


def test_truncated_stream_raises(model):
    m, variables = model
    m.set_target_bandwidth(6.)
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 2400))) * 0.1
    data = C.compress(m, variables, wav)
    with pytest.raises(EOFError):
        C.decompress(m, variables, data[:len(data) - 40])


def test_corrupt_magic_raises(model):
    m, variables = model
    with pytest.raises(ValueError, match='ECDC'):
        C.decompress(m, variables, b'NOPE' + b'\x00' * 64)
