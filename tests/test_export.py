"""JAX → torch export (`export.py`): the inverse of the conversion path.

Checks, against the actual reference torch modules on CPU:
- torch → jax → torch roundtrips the reference state dict exactly
  (LSTM biases compared as the sum torch itself consumes);
- an exported state dict loads **strict** into the reference modules and
  reproduces our forward numerics (the "train on TPU, deploy with the
  reference runtime" contract — reference model.py:286,306-307);
- jax → torch → jax is bit-exact through `variables_from_torch_state_dict`;
- the trainer-style wrapper round-trips through our `my_encodec_model`
  factory exactly as a reference trainer checkpoint would
  (reference utils.py:132-148, model.py:332-349);
- `add_checksum` embeds the sha256 prefix the reference's repository
  loader verifies (reference model.py:281-284).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from encodec_pytorch_tpu import export
from encodec_pytorch_tpu.models.model import (EncodecModel,
                                              my_encodec_model,
                                              variables_from_torch_state_dict)

REF = '/root/reference'
if REF not in sys.path:
    sys.path.insert(0, REF)


def _ref_modules(norm='weight_norm', causal=True, n_q=2, n_filters=32,
                 seed=11):
    import modules as ref_m
    from quantization.vq import ResidualVectorQuantizer as RefRVQ
    torch.manual_seed(seed)
    enc = ref_m.SEANetEncoder(channels=1, norm=norm, causal=causal,
                              n_filters=n_filters)
    dec = ref_m.SEANetDecoder(channels=1, norm=norm, causal=causal,
                              n_filters=n_filters)
    rvq = RefRVQ(dimension=enc.dimension, n_q=n_q, bins=1024)
    for layer in rvq.vq.layers:
        cb = layer._codebook
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed * 1.5)
        cb.inited.fill_(1)
        cb.cluster_size.normal_().abs_()
    enc.eval(), dec.eval()
    return enc, dec, rvq


def _released_sd(enc, dec, rvq):
    """Flat released-checkpoint layout (encoder./decoder./quantizer.vq.)."""
    sd = {}
    for prefix, mod in [('encoder', enc), ('decoder', dec)]:
        for k, v in mod.state_dict().items():
            sd[f'{prefix}.{k}'] = v.detach().numpy()
    for k, v in rvq.state_dict().items():   # keys 'vq.layers...'
        sd[f'quantizer.{k}'] = v.detach().numpy()
    return sd


def _our_model(norm='weight_norm', causal=True, n_q=2, n_filters=32):
    return EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=causal, model_norm=norm,
        audio_normalize=False, name='test', n_q=n_q, n_filters=n_filters)


def test_roundtrip_torch_jax_torch_exact():
    """torch sd → jax variables → exported sd: identical keys, exact values
    (LSTM bias pair compared as its sum — the only quantity torch uses)."""
    for norm, causal in [('weight_norm', True), ('time_group_norm', False)]:
        enc, dec, rvq = _ref_modules(norm=norm, causal=causal)
        sd = _released_sd(enc, dec, rvq)
        model = _our_model(norm=norm, causal=causal)
        variables = variables_from_torch_state_dict(model, sd)
        out = export.model_state_dict(variables)

        assert set(out) == set(sd), (
            set(out) ^ set(sd))
        done_bias_pairs = set()
        for k in sd:
            if '.bias_ih_l' in k or '.bias_hh_l' in k:
                base = k.replace('.bias_hh_l', '.bias_ih_l')
                if base in done_bias_pairs:
                    continue
                done_bias_pairs.add(base)
                hh = base.replace('.bias_ih_l', '.bias_hh_l')
                np.testing.assert_allclose(
                    out[base] + out[hh], sd[base] + sd[hh], atol=1e-6,
                    err_msg=base)
            else:
                np.testing.assert_array_equal(out[k], np.asarray(sd[k]),
                                              err_msg=k)


def test_roundtrip_jax_torch_jax_bitexact():
    """jax → torch sd → jax is bit-exact for every leaf (the bias split
    b → (b, 0) recombines to b exactly)."""
    model = _our_model()
    variables = model.init(jax.random.PRNGKey(3), example_length=2400)
    sd = export.model_state_dict(variables)
    back = variables_from_torch_state_dict(model, sd)

    flat_a, tree_a = jax.tree.flatten(variables)
    flat_b, tree_b = jax.tree.flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_export_strict_load_forward_parity():
    """Exported weights load strict into the reference torch modules and
    reproduce our encoder/decoder numerics."""
    model = _our_model(n_filters=16)
    variables = model.init(jax.random.PRNGKey(7), example_length=2400)
    sd = export.model_state_dict(variables)

    enc, dec, rvq = _ref_modules(n_filters=16)
    tens = {k: torch.from_numpy(v) for k, v in sd.items()}
    # strict=True (default) — any missing/extra key fails the test
    enc.load_state_dict({k[len('encoder.'):]: v for k, v in tens.items()
                         if k.startswith('encoder.')})
    dec.load_state_dict({k[len('decoder.'):]: v for k, v in tens.items()
                         if k.startswith('decoder.')})
    rvq.load_state_dict({k[len('quantizer.'):]: v for k, v in tens.items()
                         if k.startswith('quantizer.')})

    x = np.random.RandomState(0).randn(1, 1, 2400).astype(np.float32)
    with torch.no_grad():
        emb_t = enc(torch.from_numpy(x))
        out_t = dec(emb_t)
    emb_j = model.encoder.apply({'params': variables['params']['encoder']},
                                jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(emb_j).transpose(0, 2, 1),
                               emb_t.numpy(), atol=1e-4, rtol=1e-4)
    out_j = model.decoder.apply({'params': variables['params']['decoder']},
                                emb_j)
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                               out_t.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        np.stack([l._codebook.embed.numpy() for l in rvq.vq.layers]),
        np.asarray(variables['quantizer'].embed, np.float32))


def test_trainer_style_roundtrip_through_factory(tmp_path):
    """style='trainer' writes the reference trainer layout; our
    `my_encodec_model` factory (the same loader the reference's factory
    is, model.py:332-349) restores it exactly."""
    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=False,
        model_norm='time_group_norm', audio_normalize=True, name='my_encodec',
        n_q=2)
    variables = model.init(jax.random.PRNGKey(5), example_length=2400)
    path = tmp_path / 'epoch9.pt'
    export.save_torch_checkpoint(variables, str(path), style='trainer',
                                 epoch=9)

    obj = torch.load(str(path), map_location='cpu', weights_only=False)
    assert obj['epoch'] == 9
    assert any(k.startswith('quantizer.model.layers.')
               for k in obj['model_state_dict'])

    model2, variables2 = my_encodec_model(str(path))
    assert model2.quantizer.n_q == 2
    flat_a, _ = jax.tree.flatten(variables)
    flat_b, _ = jax.tree.flatten(variables2)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_released_style_checksum_and_loader(tmp_path):
    """add_checksum renames to the `name-{sha8}.th` form; the released-file
    loader verifies the checksum and restores exactly."""
    from encodec_pytorch_tpu.models.model import _load_torch_checkpoint
    from encodec_pytorch_tpu.utils import check_checksum

    model = _our_model(n_filters=8)
    variables = model.init(jax.random.PRNGKey(1), example_length=2400)
    path = export.save_torch_checkpoint(
        variables, str(tmp_path / 'tiny_24khz.th'), style='released',
        add_checksum=True)
    stem = path.rsplit('/', 1)[-1]
    assert '-' in stem and len(stem.split('-')[1].split('.')[0]) == 8
    check_checksum(path, stem.split('-')[1].split('.')[0])

    back = _load_torch_checkpoint(model, path, nested=False)
    flat_a, _ = jax.tree.flatten(variables)
    flat_b, _ = jax.tree.flatten(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_disc_export_strict_load_parity():
    """Exported discriminator loads strict into the reference
    MultiScaleSTFTDiscriminator (incl. the synthesized spec_transform
    windows) and reproduces our logits/fmaps."""
    from ref_compat import install_audio_stubs, ref_path
    install_audio_stubs()
    ref_path()
    import msstftd as ref_msstftd

    from encodec_pytorch_tpu.models.msstftd import \
        MultiScaleSTFTDiscriminator

    disc = MultiScaleSTFTDiscriminator(
        filters=8, n_ffts=(512, 256), hop_lengths=(128, 64),
        win_lengths=(512, 256))
    x = np.random.RandomState(2).randn(2, 1, 4000).astype(np.float32)
    params = disc.init(jax.random.PRNGKey(2), jnp.asarray(x))['params']
    sd = export.msstftd_state_dict(params, win_lengths=(512, 256))

    ref = ref_msstftd.MultiScaleSTFTDiscriminator(
        filters=8, n_ffts=[512, 256], hop_lengths=[128, 64],
        win_lengths=[512, 256])
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    ref.eval()
    with torch.no_grad():
        logits_t, fmaps_t = ref(torch.from_numpy(x))
    logits_j, fmaps_j = disc.apply({'params': params}, jnp.asarray(x))

    def nchw(a):
        return np.transpose(np.asarray(a), (0, 3, 1, 2))

    for lt, lj in zip(logits_t, logits_j):
        np.testing.assert_allclose(nchw(lj), lt.numpy(), atol=2e-4, rtol=1e-3)
    for fm_t, fm_j in zip(fmaps_t, fmaps_j):
        for a, b in zip(fm_t, fm_j):
            np.testing.assert_allclose(nchw(b), a.numpy(), atol=2e-4,
                                       rtol=1e-3)


def test_export_cli_end_to_end(tmp_path):
    """export_cli: trainer .ckpt (our format) → torch .pt, restored through
    the same config template the train CLI uses."""
    import jax.random as jrandom

    from encodec_pytorch_tpu import export_cli
    from encodec_pytorch_tpu.config import load_config
    from encodec_pytorch_tpu.train.balancer import Balancer
    from encodec_pytorch_tpu.train.checkpoint import save_checkpoint
    from encodec_pytorch_tpu.train.step import init_train_state
    from encodec_pytorch_tpu.train.trainer import (build_disc_from_config,
                                                   build_model_from_config)

    overrides = [
        'datasets.tensor_cut=2400',
        'model.n_q=2',
        'model.n_filters=4',
        'model.filters=4',
        'model.disc_n_ffts=[256,128]',
        'model.disc_hop_lengths=[64,32]',
        'model.disc_win_lengths=[256,128]',
    ]
    config = load_config('config', overrides)
    model = build_model_from_config(config)
    disc = build_disc_from_config(config)
    balancer = Balancer(config.balancer.weights.to_dict())
    state = init_train_state(model, disc, balancer, jrandom.PRNGKey(0),
                             example_length=2400)
    ckpt = str(tmp_path / 'epoch4.ckpt')
    save_checkpoint(ckpt, state, epoch=4)

    out_path = str(tmp_path / 'exported.pt')
    disc_path = str(tmp_path / 'disc.pt')
    out = export_cli.main([ckpt, out_path, '--config', 'config',
                           '--disc', disc_path] + overrides)

    obj = torch.load(out, map_location='cpu', weights_only=False)
    assert obj['epoch'] == 4
    want = export.model_state_dict(
        {'params': state.params_g, 'quantizer': state.quantizer})
    got = {k.replace('quantizer.model.', 'quantizer.vq.'): v
           for k, v in obj['model_state_dict'].items()}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k].numpy(), want[k], err_msg=k)

    dobj = torch.load(disc_path, map_location='cpu', weights_only=False)
    assert dobj['epoch'] == 4
    assert any(k.endswith('spec_transform.window')
               for k in dobj['model_state_dict'])


def test_lm_export_roundtrip_and_strict_load():
    """lm_state_dict: torch → jax → torch roundtrips exactly, and an
    exported fresh jax LM loads strict into the reference-module LM graph
    (reference model.py:37-65) with forward parity."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_lm import _torch_lm

    from encodec_pytorch_tpu.models.lm import LMModel, lm_params_from_torch

    n_q, card, dim, L, ctx = 3, 32, 32, 2, 8
    tlm = _torch_lm(n_q, card, dim, L, ctx)
    sd = {k: v.detach().numpy() for k, v in tlm.state_dict().items()}
    params = lm_params_from_torch(sd)
    out = export.lm_state_dict(params)
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], np.asarray(sd[k]), err_msg=k)

    # fresh jax LM → strict torch load → forward parity
    lm = LMModel(n_q=n_q, card=card, dim=dim, num_heads=4, num_layers=L,
                 past_context=ctx)
    idx = np.random.RandomState(3).randint(0, card + 1, (1, n_q, 10))
    params2 = lm.init(jax.random.PRNGKey(8), jnp.asarray(idx))['params']
    tlm.load_state_dict({k: torch.from_numpy(v) for k, v in
                         export.lm_state_dict(params2).items()})
    with torch.no_grad():
        ref, _, _ = tlm(torch.from_numpy(idx))
    ours, _, _ = lm.apply({'params': params2}, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                               rtol=1e-4)


def test_export_cli_lm_mode(tmp_path):
    """--lm exports a native LM checkpoint as the flat state dict the
    reference's get_lm_model loads (reference model.py:236-239)."""
    from encodec_pytorch_tpu import export_cli
    from encodec_pytorch_tpu.models.lm import LMModel
    from encodec_pytorch_tpu.train.lm_trainer import save_lm_checkpoint

    lm = LMModel(n_q=2, card=16, dim=16, num_heads=4, num_layers=1,
                 past_context=8)
    idx = np.zeros((1, 2, 4), np.int32)
    params = lm.init(jax.random.PRNGKey(0), jnp.asarray(idx))['params']

    class _S:  # minimal state carrying params
        pass
    s = _S()
    s.params = params
    native = str(tmp_path / 'lm.ckpt')
    save_lm_checkpoint(native, s, lm)

    out = export_cli.main([native, str(tmp_path / 'lm.th'), '--lm'])
    obj = torch.load(out, map_location='cpu', weights_only=False)
    want = export.lm_state_dict(params)
    assert set(obj) == set(want)
    for k in want:
        np.testing.assert_array_equal(obj[k].numpy(), want[k], err_msg=k)


def test_layer_norm_export_refused():
    """layer_norm models are refused with a clear error: the reference's own
    ConvLayerNorm is broken (returns None, reference norm.py:28), so an
    exported layer_norm checkpoint could never run there."""
    import pytest

    model = EncodecModel._get_model(
        [1.5], 24_000, 1, causal=True, model_norm='layer_norm',
        audio_normalize=False, name='test', n_q=1, n_filters=4)
    variables = model.init(jax.random.PRNGKey(0), example_length=2400)
    with pytest.raises(ValueError, match='cannot export'):
        export.model_state_dict(variables)


def test_save_torch_disc_wrapper(tmp_path):
    """save_torch_disc writes the {'epoch','model_state_dict'} layout the
    reference trainer uses for disc checkpoints (train_multi_gpu.py:350)."""
    from encodec_pytorch_tpu.models.msstftd import \
        MultiScaleSTFTDiscriminator

    disc = MultiScaleSTFTDiscriminator(
        filters=8, n_ffts=(512, 256), hop_lengths=(128, 64),
        win_lengths=(512, 256))
    params = disc.init(jax.random.PRNGKey(4),
                       jnp.zeros((1, 1, 2048)))['params']
    path = export.save_torch_disc(params, str(tmp_path / 'disc.pt'),
                                  win_lengths=(512, 256), epoch=3)
    obj = torch.load(path, map_location='cpu', weights_only=False)
    assert obj['epoch'] == 3
    assert any(k.endswith('spec_transform.window')
               for k in obj['model_state_dict'])
