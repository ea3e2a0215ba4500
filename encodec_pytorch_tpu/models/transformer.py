"""Streaming causal transformer (entropy-LM backbone).

Rebuild of /root/reference/modules/transformer.py. The reference carries a
*growing* list of past inputs per layer (transformer.py:115-118), which would
retrace XLA at every new length; here the per-layer KV history is a
FIXED-SIZE ring-padded buffer ``[B, past_context, C]`` with an offset-derived
validity mask, so every streaming step hits one compiled program.

Attention math mirrors torch ``nn.TransformerEncoderLayer`` (norm_first=False,
gelu) + ``nn.MultiheadAttention`` (packed in_proj), with the reference's
bounded-context mask ``0 <= q_pos - k_pos <= past_context``
(transformer.py:44-59), so torch LM checkpoints convert numerically.
"""

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def create_sin_embedding(positions: jnp.ndarray, dim: int,
                         max_period: float = 10000) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-first layout (transformer.py:16-27).
    positions: [B, T, 1] → [B, T, dim]."""
    assert dim % 2 == 0
    half_dim = dim // 2
    adim = jnp.arange(half_dim).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half_dim - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


class _MHA(nn.Module):
    """torch nn.MultiheadAttention with packed qkv projection."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, mask):
        """q: [B,T,C], k/v: [B,S,C]; mask [T,S] True=valid → [B,T,C]."""
        E, H = self.dim, self.num_heads
        hd = E // H
        in_w = self.param('in_proj_weight', nn.initializers.xavier_uniform(),
                          (3 * E, E))
        in_b = self.param('in_proj_bias', nn.initializers.zeros, (3 * E,))
        out_w = self.param('out_proj_weight', nn.initializers.xavier_uniform(),
                           (E, E))
        out_b = self.param('out_proj_bias', nn.initializers.zeros, (E,))

        qp = q @ in_w[:E].T + in_b[:E]
        kp = k @ in_w[E:2 * E].T + in_b[E:2 * E]
        vp = v @ in_w[2 * E:].T + in_b[2 * E:]

        B, T, _ = qp.shape
        S = kp.shape[1]
        qh = qp.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum('bhtd,bhsd->bhts', qh, kh) / jnp.sqrt(float(hd))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        # fully-masked rows (no valid key) produce NaN in torch too; they
        # cannot occur here because the current position is always valid
        out = jnp.einsum('bhts,bhsd->bhtd', attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        return out @ out_w.T + out_b


class StreamingTransformerEncoderLayer(nn.Module):
    """post-norm encoder layer (torch TransformerEncoderLayer default)."""
    dim: int
    num_heads: int
    hidden_dim: int
    gelu: bool = True

    @nn.compact
    def __call__(self, x, x_past, past_mask, past_context: int, offset):
        """x: [B,T,C]; x_past: [B,S,C] fixed-size padded history;
        past_mask: [S] validity of history slots; offset: traced scalar,
        global position of x[:, 0]. Returns (y, sa_input)."""
        B, T, C = x.shape
        S = x_past.shape[1]
        sa_input = x
        keys = jnp.concatenate([x_past, x], axis=1)

        # positions: history slot j holds global pos offset - S + j;
        # current t holds offset + t
        q_pos = offset + jnp.arange(T)[:, None]                 # [T, 1]
        k_pos = offset - S + jnp.arange(S + T)[None, :]         # [1, S+T]
        delta = q_pos - k_pos
        valid = (delta >= 0) & (delta <= past_context)
        valid = valid & jnp.concatenate(
            [past_mask, jnp.ones((T,), bool)])[None, :]

        attn = _MHA(self.dim, self.num_heads, name='self_attn')(
            sa_input, keys, keys, valid)
        x = nn.LayerNorm(epsilon=1e-5, name='norm1')(x + attn)
        h = nn.Dense(self.hidden_dim, name='linear1')(x)
        h = jax.nn.gelu(h, approximate=False) if self.gelu else jax.nn.relu(h)
        h = nn.Dense(self.dim, name='linear2')(h)
        x = nn.LayerNorm(epsilon=1e-5, name='norm2')(x + h)
        return x, sa_input


class StreamingTransformerEncoder(nn.Module):
    """Streaming encoder (transformer.py:62-119) with fixed-size state.

    State: (history [num_layers+? , ...]) — we carry per-layer buffers
    ``[B, past_context, C]`` plus the integer offset; `__call__` returns
    ``(y, new_state, new_offset)`` like the reference.
    """
    dim: int
    hidden_scale: float = 4.
    num_heads: int = 8
    num_layers: int = 5
    max_period: float = 10000
    past_context: int = 1000
    gelu: bool = True
    norm_in: bool = True

    def init_state(self, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(per-layer history [L, B, S, C], offset scalar int32)."""
        S = self.past_context
        hist = jnp.zeros((self.num_layers, batch, S, self.dim), jnp.float32)
        return hist, jnp.zeros((), jnp.int32)

    @nn.compact
    def __call__(self, x, state=None):
        B, T, C = x.shape
        S = self.past_context
        if state is None:
            hist, offset = self.init_state(B)
        else:
            hist, offset = state

        positions = jnp.arange(T).reshape(1, -1, 1) + offset
        pos_emb = create_sin_embedding(positions, C, max_period=self.max_period)
        if self.norm_in:
            x = nn.LayerNorm(epsilon=1e-5, name='norm_in')(x)
        x = x + pos_emb

        # History slot j is valid iff it holds a real past position. Slots
        # are right-aligned; the reference seeds the stream with ONE zero
        # sentinel key (`states=None` → zeros_like(x[:, :1]), transformer.py
        # :106) that attends as a real position until it slides out of the
        # context window — hence `offset + 1` filled slots, with the
        # sentinel at global position -1.
        n_valid = jnp.minimum(offset + 1, S)
        past_mask = jnp.arange(S) >= (S - n_valid)

        hidden_dim = int(self.dim * self.hidden_scale)
        new_hist = []
        for i in range(self.num_layers):
            x, sa_input = StreamingTransformerEncoderLayer(
                self.dim, self.num_heads, hidden_dim, gelu=self.gelu,
                name=f'layer_{i}')(x, hist[i], past_mask, self.past_context,
                                   offset)
            # shift-in the new inputs on the right (keep last S positions)
            upd = jnp.concatenate([hist[i], sa_input], axis=1)[:, -S:]
            new_hist.append(upd)
        return x, (jnp.stack(new_hist), offset + T), offset + T
