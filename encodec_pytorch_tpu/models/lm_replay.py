"""Bit-exact torch replay of the reference entropy LM, for `.ecdc` interop.

Why this exists: arithmetic-coded LM streams are only decodable when the
decoder reproduces the encoder's quantized CDFs EXACTLY — even a ±1 shift in
one cumulative boundary drifts the range coder's window, and renormalization
amplifies the drift until decode desyncs (measured in
tests/test_ref_interop.py: our JAX LM agrees with the torch LM to ~1e-8,
which sits right AT the reference's 1e-8 roundoff grid (reference
ac.py:29-38), so a fraction of CDF values shift by ±1 and a
reference-written stream desyncs within a few symbols). The reference has
the identical limitation across torch architectures — the roundoff exists
to mitigate it, not to remove it.

So for streams written by the REFERENCE (torch f32 CPU probabilities), the
only reliable route is to replay the probability evaluation on the same
software stack: this module rebuilds the reference ``LMModel`` forward
(reference model.py:27-65 + modules/transformer.py:16-119) from a torch
state dict using the same torch kernels (``nn.MultiheadAttention``,
``F.linear``, ``F.layer_norm``, ``F.gelu``) in the same composition order,
which makes the outputs bit-identical to the reference's
(tests/test_lm_replay.py asserts tensor equality, including past_context
trimming). It runs host-side on CPU — which also removes the per-symbol
device round-trip that made reference-interop LM decompress 0.4× real time
(docs/PERF_NOTES.md "LM entropy-coding throughput").

Duck-types the ``compress.LM`` surface the host coder paths use
(``step`` / ``probas_teacher_forced``); the fused on-device coder is not
available for replay streams by construction (its probabilities are a
different XLA program).
"""

import typing as tp

import numpy as np


class TorchReplayLM:
    """Replays reference-LM probabilities bit-exactly from a torch state
    dict (reference naming: ``emb.{k}.weight``, ``linears.{k}.*``,
    ``transformer.*`` — the same dict lm_params_from_torch consumes)."""

    backend = 'torch'

    def __init__(self, sd: tp.Dict[str, 'tp.Any'], n_q: int, card: int,
                 dim: int, num_layers: int, num_heads: int = 8,
                 past_context: int = 1000, max_period: float = 10000.0):
        import torch
        self._torch = torch
        self.n_q = n_q
        self.card = card
        self.dim = dim
        self.num_layers = num_layers
        self.past_context = past_context
        self.max_period = max_period

        def t(key):
            v = sd[key]
            return (v.detach().clone().float() if torch.is_tensor(v)
                    else torch.from_numpy(np.asarray(v, np.float32)))

        self.emb = [t(f'emb.{k}.weight') for k in range(n_q)]
        self.linears = [(t(f'linears.{k}.weight'), t(f'linears.{k}.bias'))
                        for k in range(n_q)]
        self.norm_in = (t('transformer.norm_in.weight'),
                        t('transformer.norm_in.bias'))
        self.layers = []
        for i in range(num_layers):
            p = f'transformer.layers.{i}.'
            # the same module the reference's TransformerEncoderLayer holds —
            # same kernel path, bit-identical attention
            mha = torch.nn.MultiheadAttention(dim, num_heads, dropout=0.0,
                                              batch_first=True)
            with torch.no_grad():
                mha.in_proj_weight.copy_(t(p + 'self_attn.in_proj_weight'))
                mha.in_proj_bias.copy_(t(p + 'self_attn.in_proj_bias'))
                mha.out_proj.weight.copy_(t(p + 'self_attn.out_proj.weight'))
                mha.out_proj.bias.copy_(t(p + 'self_attn.out_proj.bias'))
            mha.eval()
            self.layers.append({
                'mha': mha,
                'linear1': (t(p + 'linear1.weight'), t(p + 'linear1.bias')),
                'linear2': (t(p + 'linear2.weight'), t(p + 'linear2.bias')),
                'norm1': (t(p + 'norm1.weight'), t(p + 'norm1.bias')),
                'norm2': (t(p + 'norm2.weight'), t(p + 'norm2.bias')),
            })

    # ------------------------------------------------------------ forward

    def _pos_emb(self, T: int, offset: int):
        """Sinusoidal embedding, reference transformer.py:16-27 dtype-exact:
        int64 positions / f32 periods → f32."""
        torch = self._torch
        half = self.dim // 2
        adim = torch.arange(half).view(1, 1, -1)
        positions = torch.arange(T).view(1, -1, 1) + offset
        phase = positions / (self.max_period ** (adim / (half - 1)))
        return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)

    def _forward(self, indices, states, offset: int):
        """indices torch.long [B, K, T] → (probas [B, card, K, T], states,
        offset+T); reference model.py:46-65 + transformer.py:101-119."""
        torch = self._torch
        F = torch.nn.functional
        B, K, T = indices.shape
        # left-fold sum, same accumulation order as the reference
        x = sum(F.embedding(indices[:, k], self.emb[k]) for k in range(K))

        if states is None:
            states = [torch.zeros_like(x[:, :1])
                      for _ in range(1 + self.num_layers)]

        pos_emb = self._pos_emb(T, offset)
        x = F.layer_norm(x, (self.dim,), *self.norm_in)
        x = x + pos_emb

        new_states = []
        for state, layer in zip(states, self.layers):
            sa_input = x
            H = state.shape[1]
            keys = torch.cat([state, x], dim=1)
            q_pos = torch.arange(H, T + H).view(-1, 1)
            k_pos = torch.arange(T + H).view(1, -1)
            delta = q_pos - k_pos
            valid = (delta >= 0) & (delta <= self.past_context)
            attn = layer['mha'](x, keys, keys, attn_mask=~valid,
                                need_weights=False)[0]
            x = F.layer_norm(x + attn, (self.dim,), *layer['norm1'])
            ff = F.linear(F.gelu(F.linear(x, *layer['linear1'])),
                          *layer['linear2'])
            x = F.layer_norm(x + ff, (self.dim,), *layer['norm2'])
            new_states.append(
                torch.cat([state, sa_input], dim=1)[:, -self.past_context:])
        # the reference threads 1 + num_layers state slots; the extra one is
        # never consumed (transformer.py:106,115) — preserve the shape
        new_states.append(states[self.num_layers])

        logits = torch.stack(
            [F.linear(x, *self.linears[k]) for k in range(K)],
            dim=1).permute(0, 3, 1, 2)
        return torch.softmax(logits, dim=1), new_states, offset + T

    # ----------------------------------------------- compress.LM surface

    def step(self, indices: np.ndarray, state):
        """indices [B, K, 1] → (probas np [B, card, K, 1], new_state)."""
        torch = self._torch
        states, offset = state if state is not None else (None, 0)
        with torch.no_grad():
            probas, states, offset = self._forward(
                torch.from_numpy(np.asarray(indices)).long(), states, offset)
        return probas.numpy(), (states, offset)

    def probas_teacher_forced(self, codes: np.ndarray) -> np.ndarray:
        """codes [B, K, T] → probas [B, card, K, T], stepping exactly like
        the reference compress loop (compress.py:75-81)."""
        torch = self._torch
        B, K, T = codes.shape
        inputs = np.zeros((B, K, T), np.int64)
        inputs[:, :, 1:] = 1 + codes[:, :, :T - 1]
        inp = torch.from_numpy(inputs)
        states, offset = None, 0
        out = []
        with torch.no_grad():
            for t in range(T):
                p, states, offset = self._forward(inp[:, :, t:t + 1],
                                                  states, offset)
                out.append(p.numpy())
        return np.concatenate(out, axis=-1)


def replay_lm_from_checkpoint(path: str, n_q: int, card: int = 1024,
                              dim: tp.Optional[int] = None,
                              num_layers: tp.Optional[int] = None,
                              num_heads: int = 8,
                              past_context: int = 1000) -> TorchReplayLM:
    """Load a reference-format torch LM checkpoint (.th state dict, the
    file get_lm_model downloads — reference model.py:221-240) as a replay
    backend.

    ``dim``/``num_layers`` default to the shapes found in the state dict
    (``emb.0.weight`` columns / count of ``transformer.layers.{i}.``
    prefixes); passing values that disagree with the dict raises instead
    of silently ignoring extra layers (which would yield wrong
    probabilities and an undiagnosable range-coder desync)."""
    import torch
    # reference-format .th files are plain tensor state dicts; load them
    # without unpickling arbitrary objects
    sd = torch.load(path, map_location='cpu', weights_only=True)
    found_layers = len({int(k.split('.')[2]) for k in sd
                        if k.startswith('transformer.layers.')})
    found_dim = int(sd['emb.0.weight'].shape[1])
    if num_layers is None:
        num_layers = found_layers
    elif num_layers != found_layers:
        raise ValueError(f'num_layers={num_layers} but checkpoint has '
                         f'{found_layers} transformer layers')
    if dim is None:
        dim = found_dim
    elif dim != found_dim:
        raise ValueError(f'dim={dim} but checkpoint emb.0.weight has '
                         f'dim {found_dim}')
    return TorchReplayLM(sd, n_q=n_q, card=card, dim=dim,
                         num_layers=num_layers, num_heads=num_heads,
                         past_context=past_context)
