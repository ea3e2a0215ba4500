"""SLSTM (scan LSTM) numeric parity vs torch nn.LSTM."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from encodec_pytorch_tpu import convert
from encodec_pytorch_tpu.ops.lstm import SLSTM


def test_slstm_parity_two_layers_with_skip():
    torch.manual_seed(0)
    dim, T, B = 32, 23, 2
    lstm = nn.LSTM(dim, dim, num_layers=2)
    xt = torch.randn(B, dim, T)

    with torch.no_grad():
        xs = xt.permute(2, 0, 1)
        y, _ = lstm(xs)
        ref = (y + xs).permute(1, 2, 0).numpy()

    params = {}
    for layer in range(2):
        w_ih, w_hh, b = convert.lstm_layer(
            getattr(lstm, f'weight_ih_l{layer}').detach().numpy(),
            getattr(lstm, f'weight_hh_l{layer}').detach().numpy(),
            getattr(lstm, f'bias_ih_l{layer}').detach().numpy(),
            getattr(lstm, f'bias_hh_l{layer}').detach().numpy())
        params[f'w_ih_l{layer}'] = jnp.asarray(w_ih)
        params[f'w_hh_l{layer}'] = jnp.asarray(w_hh)
        params[f'b_l{layer}'] = jnp.asarray(b)

    mod = SLSTM(dimension=dim, num_layers=2)
    out = mod.apply({'params': params}, jnp.asarray(xt.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=2e-5, rtol=1e-5)
