"""LSTM bottleneck as a `lax.scan` over time.

TPU-first rebuild of /root/reference/modules/lstm.py (SLSTM, 2 layers with a
residual skip). Instead of translating cuDNN LSTM, the input projection
``x @ W_ih`` for ALL timesteps is hoisted out of the recurrence into one big
MXU matmul; the scan carries only ``(h, c)`` and does the ``h @ W_hh``
recurrent matmul. Gate order follows torch (i, f, g, o) so torch checkpoints
convert directly (``weight_ih_l{k}: [4H, in]`` → ``w_ih: [in, 4H]``).

Layout: ``[B, T, C]`` in and out (the reference permutes NCT→TNC and back,
lstm.py:23-27; we stay channels-last throughout).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_layer(x, w_ih, w_hh, b, dtype):
    """One LSTM layer over ``x: [B, T, C]``. Returns ``[B, T, H]``.

    ``w_ih: [C, 4H]``, ``w_hh: [H, 4H]``, ``b: [4H]`` (sum of torch's
    ``bias_ih + bias_hh``). Gates in torch order i, f, g, o.
    """
    B, T, C = x.shape
    H = w_hh.shape[0]
    # Hoist the input projection out of the scan: one [B*T, C] @ [C, 4H]
    # matmul that XLA tiles onto the MXU.
    x_proj = jnp.dot(x.astype(dtype), w_ih.astype(dtype),
                     preferred_element_type=jnp.float32) + b

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h.astype(dtype), w_hh.astype(dtype),
                               preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    # scan over time: x_proj [B, T, 4H] -> [T, B, 4H]
    (_, _), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


@jax.custom_vjp
def _fused_lstm_layer(x, w_ih, w_hh, b):
    """Pallas-forward LSTM layer with a scan-based backward.

    The Pallas kernel (ops/pallas_lstm.py) is ~30% faster than the XLA scan
    on v5e for the forward; pallas_call is not differentiable, so the VJP
    recomputes through the scan implementation (rematerialized backward).
    """
    from .pallas_lstm import lstm_layer_pallas
    return lstm_layer_pallas(x, w_ih, w_hh, b)


def _fused_lstm_fwd(x, w_ih, w_hh, b):
    return _fused_lstm_layer(x, w_ih, w_hh, b), (x, w_ih, w_hh, b)


def _fused_lstm_bwd(residuals, g):
    x, w_ih, w_hh, b = residuals
    _, vjp = jax.vjp(lambda x, wi, wh, b: _lstm_layer(x, wi, wh, b, jnp.float32),
                     x, w_ih, w_hh, b)
    return vjp(g)


_fused_lstm_layer.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)


def _use_pallas_lstm(H: int, dtype, x_shape=None) -> bool:
    from .pallas_lstm import available, fits
    return (available() and H % 128 == 0 and dtype == jnp.float32
            and (x_shape is None or fits(x_shape, H)))


class SLSTM(nn.Module):
    """Multi-layer LSTM with residual skip (lstm.py:12-28).

    The recurrence always computes in f32 regardless of the surrounding
    activation pipeline's dtype (``self.dtype`` is accepted for interface
    uniformity with the conv stack): the bottleneck LSTM is latency-bound
    (sequential carry), not HBM-bandwidth-bound, and the carried cell state
    compounds rounding error across hundreds of steps in bf16. Inputs are
    cast up at entry and back to the incoming dtype at exit.
    """
    dimension: int
    num_layers: int = 2
    skip: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        y = x
        H = self.dimension
        for layer in range(self.num_layers):
            in_dim = y.shape[-1]
            bound = 1.0 / (H ** 0.5)

            def init(key, shape, dtype=jnp.float32, _b=bound):
                return jax.random.uniform(key, shape, dtype, minval=-_b, maxval=_b)

            w_ih = self.param(f'w_ih_l{layer}', init, (in_dim, 4 * H), jnp.float32)
            w_hh = self.param(f'w_hh_l{layer}', init, (H, 4 * H), jnp.float32)
            b = self.param(f'b_l{layer}', init, (4 * H,), jnp.float32)
            if _use_pallas_lstm(H, jnp.float32, y.shape):
                y = _fused_lstm_layer(y, w_ih, w_hh, b)
            else:
                y = _lstm_layer(y, w_ih, w_hh, b, jnp.float32)
        if self.skip:
            y = y + x
        return y.astype(in_dtype)
