"""TorchReplayLM must be BIT-identical to the reference LMModel — that is
its entire reason to exist (models/lm_replay.py docstring): arithmetic-coded
streams desync under any probability difference at all, so the replay
backend must reproduce the reference's torch kernels exactly, not closely.

Asserted with np.testing.assert_array_equal (no tolerance) across:
- multi-step batch forwards,
- one-step streaming (the decoder's access pattern) with threaded state,
- sequences longer than past_context (state trimming, transformer.py:118),
- several (n_q, dim, heads, layers) configurations.
"""

import numpy as np
import pytest
import torch

from ref_compat import install_audio_stubs, ref_path, to_numpy_sd

from encodec_pytorch_tpu.models.lm_replay import TorchReplayLM


def _ref_lm(n_q, card, dim, num_layers, num_heads, past_context, seed):
    install_audio_stubs()
    ref_path()
    import model as ref_model_mod
    torch.manual_seed(seed)
    lm = ref_model_mod.LMModel(n_q=n_q, card=card, dim=dim,
                               num_layers=num_layers, num_heads=num_heads,
                               past_context=past_context)
    lm.eval()
    return lm


@pytest.mark.parametrize('n_q,dim,num_layers,num_heads,ctx', [
    (2, 32, 1, 4, 8),
    (4, 64, 2, 8, 12),
    (8, 200, 5, 8, 20),   # released LM architecture (model.py:226-231)
])
def test_replay_streaming_bit_identical(n_q, dim, num_layers, num_heads,
                                        ctx):
    """One-token steps over 3×past_context symbols (covers state trimming
    and the long-context steady state) — tensor-equal at every step."""
    card = 1024
    ref = _ref_lm(n_q, card, dim, num_layers, num_heads, ctx, seed=n_q)
    replay = TorchReplayLM(to_numpy_sd(ref), n_q=n_q, card=card, dim=dim,
                           num_layers=num_layers, num_heads=num_heads,
                           past_context=ctx)

    rng = np.random.RandomState(0)
    T = 3 * ctx + 5
    codes = rng.randint(0, card, size=(1, n_q, T))
    inputs = np.zeros((1, n_q, T), np.int64)
    inputs[:, :, 1:] = 1 + codes[:, :, :T - 1]

    r_states, r_offset = None, 0
    j_state = None
    with torch.no_grad():
        for t in range(T):
            inp = torch.from_numpy(inputs[:, :, t:t + 1])
            p_ref, r_states, r_offset = ref(inp, r_states, r_offset)
            p_rep, j_state = replay.step(inputs[:, :, t:t + 1], j_state)
            np.testing.assert_array_equal(p_rep, p_ref.numpy()), t


def test_replay_batch_forward_bit_identical():
    """Whole-sequence forward (the encode-side access pattern)."""
    n_q, card, dim = 4, 1024, 64
    ref = _ref_lm(n_q, card, dim, 2, 8, 30, seed=11)
    replay = TorchReplayLM(to_numpy_sd(ref), n_q=n_q, card=card, dim=dim,
                           num_layers=2, num_heads=8, past_context=30)
    rng = np.random.RandomState(2)
    codes = rng.randint(0, card, size=(1, n_q, 50))

    # reference teacher-forced stepping (compress.py:75-81)
    inputs = np.zeros((1, n_q, 50), np.int64)
    inputs[:, :, 1:] = 1 + codes[:, :, :49]
    states, offset = None, 0
    ps = []
    with torch.no_grad():
        for t in range(50):
            p, states, offset = ref(torch.from_numpy(inputs[:, :, t:t + 1]),
                                    states, offset)
            ps.append(p.numpy())
    ref_probas = np.concatenate(ps, axis=-1)

    np.testing.assert_array_equal(replay.probas_teacher_forced(codes),
                                  ref_probas)


def test_replay_checkpoint_loader(tmp_path):
    from encodec_pytorch_tpu.models.lm_replay import replay_lm_from_checkpoint
    ref = _ref_lm(2, 1024, 32, 1, 4, 10, seed=5)
    path = tmp_path / 'lm.th'
    torch.save(ref.state_dict(), str(path))
    replay = replay_lm_from_checkpoint(str(path), n_q=2, card=1024, dim=32,
                                       num_layers=1, num_heads=4,
                                       past_context=10)
    codes = np.random.RandomState(1).randint(0, 1024, size=(1, 2, 12))
    inputs = np.zeros((1, 2, 12), np.int64)
    inputs[:, :, 1:] = 1 + codes[:, :, :11]
    with torch.no_grad():
        p_ref, _, _ = ref(torch.from_numpy(inputs), None, 0)
    with torch.no_grad():
        p_rep, _, _ = replay._forward(torch.from_numpy(inputs), None, 0)
    np.testing.assert_array_equal(p_rep.numpy(), p_ref.numpy())


def test_get_lm_model_torch_backend(tmp_path):
    """compress.get_lm_model(backend='torch') loads a reference-format .th
    into a TorchReplayLM; the fused coder refuses it loudly."""
    import io

    import jax
    import jax.numpy as jnp

    from encodec_pytorch_tpu import compress as C
    from encodec_pytorch_tpu.models.model import EncodecModel

    ref_lm = _ref_lm(2, 1024, 200, 5, 8, 262, seed=9)
    path = tmp_path / 'lm.th'
    torch.save(ref_lm.state_dict(), str(path))

    model = EncodecModel._get_model([1.5], 24000, 1, causal=True, n_q=2,
                                    n_filters=4, name='my_encodec')
    model.set_target_bandwidth(1.5)
    lm = C.get_lm_model(model, checkpoint=str(path), backend='torch')
    assert isinstance(lm, TorchReplayLM) and lm.n_q == 2

    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited))
    wav = np.random.RandomState(0).randn(1, 2400).astype(np.float32) * 0.1
    data = C.compress(model, variables, wav, use_lm=True, lm=lm)
    out, sr = C.decompress(model, variables, data, lm=lm)
    assert out.shape == wav.shape and sr == 24000

    with pytest.raises(ValueError, match='fused'):
        C.compress(model, variables, wav, use_lm=True, lm=lm, lm_fused=True)

    # a fused1 stream must refuse the replay backend LOUDLY on decode too
    from encodec_pytorch_tpu.models.lm import LMModel
    jax_lm = C.LM(LMModel(n_q=2, card=1024, dim=32, num_heads=4,
                          num_layers=1, past_context=24),
                  LMModel(n_q=2, card=1024, dim=32, num_heads=4,
                          num_layers=1, past_context=24).init(
                      jax.random.PRNGKey(5),
                      jnp.zeros((1, 2, 1), jnp.int32))['params'])
    fused = C.compress(model, variables, wav, use_lm=True, lm=jax_lm,
                       lm_fused=True)
    with pytest.raises(ValueError, match='fused1'):
        C.decompress(model, variables, fused, lm=lm)

    with pytest.raises(ValueError, match='torch'):
        C.get_lm_model(model, checkpoint='x.msgpack', backend='torch')
