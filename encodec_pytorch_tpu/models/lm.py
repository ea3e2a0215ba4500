"""Entropy language model over RVQ indices (reference model.py:27-65).

Per-codebook embeddings (card+1, value 0 = missing/first step) are summed,
run through the streaming transformer, and projected by per-codebook linear
heads to a softmax over the card entries → ``[B, card, K, T]``.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .transformer import StreamingTransformerEncoder


class LMModel(nn.Module):
    n_q: int = 32
    card: int = 1024
    dim: int = 200
    num_heads: int = 8
    num_layers: int = 5
    past_context: int = 1000

    def transformer_def(self) -> StreamingTransformerEncoder:
        return StreamingTransformerEncoder(
            dim=self.dim, num_heads=self.num_heads, num_layers=self.num_layers,
            past_context=self.past_context, name='transformer')

    def init_state(self, batch: int):
        return self.transformer_def().init_state(batch)

    @nn.compact
    def __call__(self, indices: jnp.ndarray, state=None,
                 return_logits: bool = False):
        """indices: [B, K, T] (1 + actual code, 0 = missing) →
        (probabilities [B, card, K, T], new_state, new_offset).
        ``return_logits=True`` skips the softmax (for the training loss)."""
        B, K, T = indices.shape
        input_ = sum(
            nn.Embed(self.card + 1, self.dim, name=f'emb_{k}')(indices[:, k])
            for k in range(K))
        out, new_state, offset = self.transformer_def()(input_, state)
        logits = jnp.stack(
            [nn.Dense(self.card, name=f'linear_{k}')(out) for k in range(K)],
            axis=1)                      # [B, K, T, card]
        logits = jnp.transpose(logits, (0, 3, 1, 2))   # [B, card, K, T]
        if return_logits:
            return logits, new_state, offset
        return jax.nn.softmax(logits, axis=1), new_state, offset


def lm_params_from_torch(sd) -> dict:
    """Convert a torch LMModel state_dict (reference model.py:27-65 naming:
    ``emb.{k}.weight``, ``linears.{k}.{weight,bias}``, ``transformer...``)."""
    params: dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(v)

    for key, val in sd.items():
        toks = key.split('.')
        v = np.asarray(val)
        if toks[0] == 'emb':
            put([f'emb_{toks[1]}', 'embedding'], v)
        elif toks[0] == 'linears':
            if toks[2] == 'weight':
                put([f'linear_{toks[1]}', 'kernel'], v.T)
            else:
                put([f'linear_{toks[1]}', 'bias'], v)
        elif toks[0] == 'transformer':
            toks = toks[1:]
            if toks[0] == 'norm_in':
                put(['transformer', 'norm_in',
                     {'weight': 'scale', 'bias': 'bias'}[toks[1]]], v)
            elif toks[0] == 'layers':
                layer = f'layer_{toks[1]}'
                rest = toks[2:]
                if rest[0] == 'self_attn':
                    if rest[1] == 'in_proj_weight':
                        put(['transformer', layer, 'self_attn',
                             'in_proj_weight'], v)
                    elif rest[1] == 'in_proj_bias':
                        put(['transformer', layer, 'self_attn',
                             'in_proj_bias'], v)
                    elif rest[1] == 'out_proj':
                        name = {'weight': 'out_proj_weight',
                                'bias': 'out_proj_bias'}[rest[2]]
                        put(['transformer', layer, 'self_attn', name], v)
                elif rest[0] in ('linear1', 'linear2'):
                    if rest[1] == 'weight':
                        put(['transformer', layer, rest[0], 'kernel'], v.T)
                    else:
                        put(['transformer', layer, rest[0], 'bias'], v)
                elif rest[0] in ('norm1', 'norm2'):
                    put(['transformer', layer, rest[0],
                         {'weight': 'scale', 'bias': 'bias'}[rest[1]]], v)
                else:
                    raise ValueError(f'unparsed LM key {key}')
            else:
                raise ValueError(f'unparsed LM key {key}')
        else:
            raise ValueError(f'unparsed LM key {key}')
    return params
