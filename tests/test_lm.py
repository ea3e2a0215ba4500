"""Streaming transformer + LM: parity vs reference torch modules and
streaming-vs-batch equivalence."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from encodec_pytorch_tpu.models.lm import LMModel, lm_params_from_torch
from encodec_pytorch_tpu.models.transformer import (
    StreamingTransformerEncoder, create_sin_embedding)

REF = '/root/reference'


def _ref_transformer(dim, num_layers, past_context):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from modules.transformer import StreamingTransformerEncoder as RefEnc
    torch.manual_seed(0)
    enc = RefEnc(dim=dim, num_layers=num_layers, past_context=past_context,
                 num_heads=4)
    enc.eval()
    return enc


def _torch_lm(n_q, card, dim, num_layers, past_context):
    """Reference LMModel rebuilt on reference modules (reference model.py
    imports torchaudio-needing utils, so we assemble the same graph here:
    model.py:37-65)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from modules.transformer import StreamingTransformerEncoder as RefEnc

    class RefLM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.transformer = RefEnc(dim=dim, num_layers=num_layers,
                                      past_context=past_context, num_heads=4)
            self.emb = torch.nn.ModuleList(
                [torch.nn.Embedding(card + 1, dim) for _ in range(n_q)])
            self.linears = torch.nn.ModuleList(
                [torch.nn.Linear(dim, card) for _ in range(n_q)])

        def forward(self, indices, states=None, offset=0):
            B, K, T = indices.shape
            input_ = sum([self.emb[k](indices[:, k]) for k in range(K)])
            out, states, offset = self.transformer(input_, states, offset)
            logits = torch.stack(
                [self.linears[k](out) for k in range(K)], dim=1).permute(0, 3, 1, 2)
            return torch.softmax(logits, dim=1), states, offset

    torch.manual_seed(1)
    lm = RefLM()
    lm.eval()
    return lm


def test_sin_embedding_matches_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from modules.transformer import create_sin_embedding as ref_sin
    pos = torch.arange(7).view(1, -1, 1).float() + 3
    ref = ref_sin(pos, 16).numpy()
    ours = np.asarray(create_sin_embedding(jnp.asarray(pos.numpy()), 16))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _convert_transformer(tenc):
    sd = {f'transformer.{k}': v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    return lm_params_from_torch(sd)['transformer']


def test_transformer_full_forward_parity():
    dim, L, ctx = 32, 2, 16
    tenc = _ref_transformer(dim, L, ctx)
    xt = torch.randn(2, 24, dim)
    with torch.no_grad():
        ref, _, ref_off = tenc(xt)

    enc = StreamingTransformerEncoder(dim=dim, num_layers=L, past_context=ctx,
                                      num_heads=4)
    params = _convert_transformer(tenc)
    out, _, off = enc.apply({'params': params}, jnp.asarray(xt.numpy()))
    assert int(off) == int(ref_off)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5,
                               rtol=1e-4)


def test_transformer_streaming_equals_batch():
    """Feeding T=1 steps with carried state must equal one batched pass."""
    dim, L, ctx = 32, 2, 8
    tenc = _ref_transformer(dim, L, ctx)
    enc = StreamingTransformerEncoder(dim=dim, num_layers=L, past_context=ctx,
                                      num_heads=4)
    params = _convert_transformer(tenc)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, dim))

    batch_out, _, _ = enc.apply({'params': params}, x)

    state = None
    outs = []
    apply = jax.jit(lambda p, x, s: enc.apply({'params': p}, x, s))
    for t in range(20):
        y, state, _ = apply(params, x[:, t:t + 1], state) if state is not None \
            else enc.apply({'params': params}, x[:, t:t + 1], None)
        outs.append(y)
    stream_out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream_out), np.asarray(batch_out),
                               atol=2e-4, rtol=1e-3)


def test_lm_parity_and_streaming():
    n_q, card, dim, L, ctx = 3, 32, 32, 2, 8
    tlm = _torch_lm(n_q, card, dim, L, ctx)
    params = lm_params_from_torch(
        {k: v.detach().numpy() for k, v in tlm.state_dict().items()})
    lm = LMModel(n_q=n_q, card=card, dim=dim, num_heads=4, num_layers=L,
                 past_context=ctx)

    idx = torch.randint(0, card + 1, (1, n_q, 10))
    with torch.no_grad():
        ref, _, _ = tlm(idx)
    ours, _, _ = lm.apply({'params': params}, jnp.asarray(idx.numpy()))
    assert ours.shape == (1, card, n_q, 10)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                               rtol=1e-4)
    # probabilities sum to 1 over the card axis
    np.testing.assert_allclose(np.asarray(ours.sum(axis=1)), 1.0, atol=1e-5)

    # streaming emulation as used by compress (step-by-step, input shifted)
    state = None
    step_outs = []
    for t in range(10):
        p, state, _ = lm.apply({'params': params}, jnp.asarray(
            idx.numpy()[:, :, t:t + 1]), state)
        step_outs.append(np.asarray(p))
    stream = np.concatenate(step_outs, axis=-1)
    np.testing.assert_allclose(stream, ref.numpy(), atol=1e-4, rtol=1e-3)
