"""Numeric parity of SConv1d / SConvTranspose1d / NormConv2d vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from encodec_pytorch_tpu import convert
from encodec_pytorch_tpu.ops.conv import NormConv2d, SConv1d, SConvTranspose1d

ATOL = 2e-5


def _to_jax_nct(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 1))


def _from_jax_ntc(y):
    return np.asarray(y).transpose(0, 2, 1)


@pytest.mark.parametrize("cin,cout,k,s,d,causal", [
    (1, 32, 7, 1, 1, True),
    (32, 64, 16, 8, 1, True),
    (64, 64, 3, 1, 2, True),
    (32, 64, 10, 5, 1, False),
    (4, 8, 3, 1, 4, False),
])
def test_sconv1d_weightnorm_parity(cin, cout, k, s, d, causal):
    torch.manual_seed(0)
    conv = nn.utils.weight_norm(nn.Conv1d(cin, cout, k, stride=s, dilation=d))
    xt = torch.randn(2, cin, 97)

    # reference-style forward with streamable padding
    import math
    pt = (k - 1) * d - (s - 1)
    length = xt.shape[-1]
    n_frames = (length - k + pt) / s + 1
    extra = (math.ceil(n_frames) - 1) * s + (k - pt) - length
    import torch.nn.functional as F
    if causal:
        pl, pr = pt, extra
    else:
        pr = pt // 2
        pl = pt - pr
        pr = pr + extra
    max_pad = max(pl, pr)
    xp = xt
    extra_guard = 0
    if length <= max_pad:
        extra_guard = max_pad - length + 1
        xp = F.pad(xp, (0, extra_guard))
    xp = F.pad(xp, (pl, pr), mode='reflect')
    xp = xp[..., :xp.shape[-1] - extra_guard]
    with torch.no_grad():
        ref = conv(xp).numpy()

    mod = SConv1d(cin, cout, k, stride=s, dilation=d, causal=causal,
                  norm='weight_norm', pad_mode='reflect')
    v, g = convert.conv1d_wn(conv.weight_v.detach().numpy(),
                             conv.weight_g.detach().numpy())
    params = {'params': {'conv': {
        'v': jnp.asarray(v), 'g': jnp.asarray(g),
        'bias': jnp.asarray(conv.bias.detach().numpy())}}}
    out = mod.apply(params, _to_jax_nct(xt))
    np.testing.assert_allclose(_from_jax_ntc(out), ref, atol=ATOL, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,k,s,causal,trr", [
    (64, 32, 16, 8, True, 1.0),
    (64, 32, 10, 5, True, 1.0),
    (64, 32, 8, 4, False, 1.0),
    (16, 8, 4, 2, True, 0.5),
])
def test_sconvtranspose1d_parity(cin, cout, k, s, causal, trr):
    torch.manual_seed(1)
    convtr = nn.utils.weight_norm(nn.ConvTranspose1d(cin, cout, k, stride=s))
    xt = torch.randn(2, cin, 19)
    with torch.no_grad():
        y = convtr(xt)
    import math
    pt = k - s
    if causal:
        pr = math.ceil(pt * trr)
        pl = pt - pr
    else:
        pr = pt // 2
        pl = pt - pr
    ref = y[..., pl:y.shape[-1] - pr].numpy()

    mod = SConvTranspose1d(cin, cout, k, stride=s, causal=causal,
                           norm='weight_norm', trim_right_ratio=trr)
    v, g = convert.convtr1d_wn(convtr.weight_v.detach().numpy(),
                               convtr.weight_g.detach().numpy())
    params = {'params': {
        'v': jnp.asarray(v), 'g': jnp.asarray(g),
        'bias': jnp.asarray(convtr.bias.detach().numpy())}}
    out = mod.apply(params, _to_jax_nct(xt))
    np.testing.assert_allclose(_from_jax_ntc(out), ref, atol=ATOL, rtol=1e-5)


def test_sconv1d_time_group_norm_parity():
    torch.manual_seed(2)
    cin, cout, k = 3, 6, 7
    conv = nn.Conv1d(cin, cout, k)
    gn = nn.GroupNorm(1, cout)
    with torch.no_grad():
        gn.weight.mul_(1.7).add_(0.1)
        gn.bias.add_(0.05)
    xt = torch.randn(2, cin, 50)
    import torch.nn.functional as F
    pt = k - 1
    pl = pt - pt // 2
    with torch.no_grad():
        ref = gn(conv(F.pad(xt, (pl, pt // 2), mode='reflect'))).numpy()

    mod = SConv1d(cin, cout, k, causal=False, norm='time_group_norm')
    params = {'params': {'conv': {
        'kernel': jnp.asarray(convert.conv1d_weight(conv.weight.detach().numpy())),
        'bias': jnp.asarray(conv.bias.detach().numpy()),
        'GroupNorm_0': {'scale': jnp.asarray(gn.weight.detach().numpy()),
                        'bias': jnp.asarray(gn.bias.detach().numpy())}}}}
    out = mod.apply(params, _to_jax_nct(xt))
    np.testing.assert_allclose(_from_jax_ntc(out), ref, atol=ATOL, rtol=1e-5)


def test_normconv2d_weightnorm_parity():
    torch.manual_seed(3)
    conv = nn.utils.weight_norm(
        nn.Conv2d(2, 8, (3, 9), stride=(1, 2), dilation=(2, 1), padding=(2, 4)))
    xt = torch.randn(2, 2, 17, 40)
    with torch.no_grad():
        ref = conv(xt).numpy()
    mod = NormConv2d(2, 8, (3, 9), stride=(1, 2), dilation=(2, 1),
                     padding=(2, 4), norm='weight_norm')
    v, g = convert.conv2d_wn(conv.weight_v.detach().numpy(),
                             conv.weight_g.detach().numpy())
    params = {'params': {'v': jnp.asarray(v), 'g': jnp.asarray(g),
                         'bias': jnp.asarray(conv.bias.detach().numpy())}}
    out = mod.apply(params, jnp.asarray(xt.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=ATOL, rtol=1e-5)


def test_sconv1d_output_length_is_ceil():
    # output frames == ceil(T / stride) for the streamable conv
    for T in [24000, 24001, 23999, 10000]:
        mod = SConv1d(1, 4, 16, stride=8, causal=True, norm='none')
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, T, 1)))
        y = mod.apply(params, jnp.zeros((1, T, 1)))
        assert y.shape[1] == -(-T // 8)
