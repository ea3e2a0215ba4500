"""Pallas LSTM kernel == scan LSTM (interpret mode) incl. the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.ops.lstm import _lstm_layer
from encodec_pytorch_tpu.ops.pallas_lstm import lstm_layer_pallas


def _weights(C, H, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (jax.random.normal(ks[0], (C, 4 * H)) * 0.05,
            jax.random.normal(ks[1], (H, 4 * H)) * 0.05,
            jax.random.normal(ks[2], (4 * H,)) * 0.01)


def test_forward_matches_scan():
    B, T, C, H = 2, 300, 64, 64  # T not a multiple of TIME_BLOCK → padding
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    w_ih, w_hh, b = _weights(C, H)
    ref = _lstm_layer(x, w_ih, w_hh, b, jnp.float32)
    got = lstm_layer_pallas(x, w_ih, w_hh, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_custom_vjp_gradients_match_scan():
    from encodec_pytorch_tpu.ops import lstm as lstm_mod
    B, T, C, H = 1, 128, 32, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, C))
    w_ih, w_hh, b = _weights(C, H, seed=3)

    # force the fused path in interpret mode by monkeypatching availability
    orig = lstm_mod._use_pallas_lstm
    try:
        def loss_fused(x, w_ih, w_hh, b):
            from encodec_pytorch_tpu.ops.pallas_lstm import lstm_layer_pallas
            return jnp.sum(jnp.square(lstm_mod._fused_lstm_layer(x, w_ih, w_hh, b)))

        def loss_scan(x, w_ih, w_hh, b):
            return jnp.sum(jnp.square(_lstm_layer(x, w_ih, w_hh, b, jnp.float32)))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w_ih, w_hh, b)
        g_scan = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(x, w_ih, w_hh, b)
        for a, r in zip(g_fused, g_scan):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)
    finally:
        lstm_mod._use_pallas_lstm = orig
