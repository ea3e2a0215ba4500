"""End-to-end torch-checkpoint conversion through the model factories,
including the trainer-style `quantizer.model → quantizer.vq` key remap
(reference model.py:346-347)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from encodec_pytorch_tpu.models.model import my_encodec_model

REF = '/root/reference'


def _build_ref_state_dict(n_q=2):
    """Assemble a reference-architecture torch state dict (my_encodec flavor:
    non-causal, time_group_norm) with trainer-checkpoint key naming."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import modules as ref_m
    from quantization.vq import ResidualVectorQuantizer as RefRVQ
    torch.manual_seed(7)
    enc = ref_m.SEANetEncoder(channels=1, norm='time_group_norm', causal=False)
    dec = ref_m.SEANetDecoder(channels=1, norm='time_group_norm', causal=False)
    rvq = RefRVQ(dimension=128, n_q=n_q, bins=1024)
    for layer in rvq.vq.layers:
        cb = layer._codebook
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed)
        cb.inited.fill_(1)
        cb.cluster_size.fill_(1.0)
    sd = {}
    for prefix, mod in [('encoder', enc), ('decoder', dec)]:
        for k, v in mod.state_dict().items():
            sd[f'{prefix}.{k}'] = v
    for k, v in rvq.state_dict().items():
        # trainer checkpoints store the quantizer under `quantizer.model`
        sd[f'quantizer.model.{k[len("vq."):] if k.startswith("vq.") else k}'] = v
    return (enc, dec, rvq), sd


def test_my_encodec_model_loads_trainer_checkpoint(tmp_path):
    (enc, dec, rvq), sd = _build_ref_state_dict(n_q=2)
    path = tmp_path / 'epoch2.pt'
    torch.save({'epoch': 2, 'model_state_dict': sd}, path)

    model, variables = my_encodec_model(str(path))
    assert model.name == 'my_encodec'
    assert model.normalize is True and model.segment is None

    # converted weights reproduce the torch encoder numerically
    enc.eval()
    xt = torch.randn(1, 1, 2400)
    with torch.no_grad():
        ref_emb = enc(xt).numpy()
    emb = model.encoder.apply({'params': variables['params']['encoder']},
                              jnp.asarray(xt.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(emb).transpose(0, 2, 1), ref_emb,
                               atol=1e-4, rtol=1e-4)

    # n_q inferred from the checkpoint
    assert model.quantizer.n_q == 2
    # codebooks carried across
    np.testing.assert_allclose(
        np.asarray(variables['quantizer'].embed),
        np.stack([layer._codebook.embed.numpy() for layer in rvq.vq.layers]),
        atol=0)

    # full eval roundtrip runs
    model.set_target_bandwidth(1.5)
    out = model(variables, jnp.asarray(xt.numpy()))
    assert out.shape == (1, 1, 2400)


def test_my_encodec_model_rejects_missing(tmp_path):
    with pytest.raises(Exception):
        my_encodec_model(str(tmp_path / 'nope.pt'))


def test_encodec_model_bw_loads_trainer_checkpoint(tmp_path):
    """The fourth factory (reference model.py:351-368): single-bandwidth
    trainer checkpoint with segment=1 s — scalar and list/tuple `bandwidth`
    arguments, the n_q-from-bandwidth formula, and the segmented eval path."""
    from encodec_pytorch_tpu.models.model import encodec_model_bw

    (enc, dec, rvq), sd = _build_ref_state_dict(n_q=2)
    path = tmp_path / 'epoch5.pt'
    torch.save({'epoch': 5, 'model_state_dict': sd}, path)

    # scalar bandwidth: n_q = 1000*1.5 // (75*10) = 2 matches the checkpoint
    model, variables = encodec_model_bw(str(path), bandwidth=1.5)
    assert model.name == 'my_encodec'
    assert model.normalize is True and model.segment == 1.0
    assert model.target_bandwidths == [1.5]
    assert model.quantizer.n_q == 2

    enc.eval()
    xt = torch.randn(1, 1, 2400)
    with torch.no_grad():
        ref_emb = enc(xt).numpy()
    emb = model.encoder.apply({'params': variables['params']['encoder']},
                              jnp.asarray(xt.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(emb).transpose(0, 2, 1), ref_emb,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(variables['quantizer'].embed),
        np.stack([layer._codebook.embed.numpy() for layer in rvq.vq.layers]),
        atol=0)

    # segmented (segment=1 s) normalized eval roundtrip preserves shape,
    # including an input longer than one segment (exercises overlap-add)
    model.set_target_bandwidth(1.5)
    for T in (2400, 30000):
        out = model(variables, jnp.asarray(torch.randn(1, 1, T).numpy()))
        assert out.shape == (1, 1, T)

    # list bandwidth argument (reference accepts a list here, model.py:351)
    model2, _ = encodec_model_bw(str(path), bandwidth=[1.5])
    assert model2.target_bandwidths == [1.5]
    assert model2.quantizer.n_q == 2
