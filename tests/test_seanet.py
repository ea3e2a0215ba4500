"""SEANet encoder/decoder: shape contract + full numeric parity vs the
reference torch implementation (imported read-only from /root/reference)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from encodec_pytorch_tpu import convert
from encodec_pytorch_tpu.models.seanet import SEANetDecoder, SEANetEncoder

REF = '/root/reference'


def _ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import modules as ref_m  # noqa
    return ref_m


def test_encoder_decoder_shapes_24k():
    # mirrors reference seanet.py:241-253
    enc = SEANetEncoder(causal=True)
    dec = SEANetDecoder(causal=True)
    x = jnp.zeros((1, 24000, 1))
    pe = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(pe, x)
    assert z.shape == (1, 75, 128), z.shape
    pd = dec.init(jax.random.PRNGKey(1), z)
    y = dec.apply(pd, z)
    assert y.shape == x.shape, y.shape


@pytest.mark.parametrize("causal,norm,true_skip", [
    (True, 'weight_norm', False),
    (False, 'time_group_norm', False),
])
def test_encoder_parity_vs_reference(causal, norm, true_skip):
    ref_m = _ref_modules()
    torch.manual_seed(0)
    tenc = ref_m.SEANetEncoder(channels=1, norm=norm, causal=causal,
                               true_skip=true_skip)
    tenc.eval()
    xt = torch.randn(2, 1, 4800)
    with torch.no_grad():
        ref = tenc(xt).numpy()

    enc = SEANetEncoder(channels=1, norm=norm, causal=causal, true_skip=true_skip)
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    params = convert.seanet_params_from_torch(sd)
    out = enc.apply({'params': params}, jnp.asarray(xt.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal,norm", [
    (True, 'weight_norm'),
    (False, 'time_group_norm'),
])
def test_decoder_parity_vs_reference(causal, norm):
    ref_m = _ref_modules()
    torch.manual_seed(1)
    tdec = ref_m.SEANetDecoder(channels=1, norm=norm, causal=causal)
    tdec.eval()
    zt = torch.randn(2, 128, 15)
    with torch.no_grad():
        ref = tdec(zt).numpy()

    dec = SEANetDecoder(channels=1, norm=norm, causal=causal)
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = convert.seanet_params_from_torch(sd)
    out = dec.apply({'params': params}, jnp.asarray(zt.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-4, rtol=1e-4)
