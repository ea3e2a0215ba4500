"""bfloat16 compute mode: output stays close to the f32 path (the sanctioned
replacement for the reference's broken AMP, README.md:14-15 there)."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.seanet import SEANetEncoder


def test_bf16_encoder_close_to_f32():
    enc32 = SEANetEncoder(causal=True, norm='weight_norm', n_filters=8)
    enc16 = SEANetEncoder(causal=True, norm='weight_norm', n_filters=8,
                          dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4800, 1)) * 0.3
    params = enc32.init(jax.random.PRNGKey(1), x)
    y32 = np.asarray(enc32.apply(params, x))
    y16 = np.asarray(enc16.apply(params, x))
    assert y16.dtype == np.float32  # f32 accumulation/output
    err = np.abs(y32 - y16).mean()
    scale = np.abs(y32).mean()
    assert err / scale < 0.05, (err, scale)
