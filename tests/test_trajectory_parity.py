"""Training-dynamics parity: run the REFERENCE torch training step
(train_multi_gpu.py:32-129 semantics: balancer backward + loss_w backward +
Adam(0.5, 0.9), then an always-on disc update) and OUR jitted step from
IDENTICAL initial weights on IDENTICAL data, and compare the loss
trajectories step by step.

This validates the full training dynamics end-to-end — optimizer math,
balancer EMA + gradient rescaling, RVQ EMA updates, STE, disc hinge updates —
against the reference's own code, beyond single-forward parity tests.

Determinism setup: one target bandwidth (no random choice), disc update
probability 1 (no coin flip), pre-inited codebooks with cluster_size=10 (no
kmeans init, no dead-code expiry within the horizon — EMA decay 0.99 keeps
every counter above the expiry threshold 2 for >150 steps).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_compat import cuda_to_cpu, install_audio_stubs, ref_path, to_numpy_sd

N_STEPS = 20
N_FILTERS = 4
N_Q = 2
LR = 3e-4
T = 4800  # 0.2 s at 24 kHz — long enough for the 2^11 mel-loss window
DISC = dict(filters=8, n_ffts=(512, 256, 128), hop_lengths=(128, 64, 32),
            win_lengths=(512, 256, 128))


def _make_batch():
    t = np.arange(T) / 24000
    sig = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.4 * np.sin(2 * np.pi * 880 * t) + 0.1 * np.sin(2 * np.pi * 120 * t),
    ])[:, None, :].astype(np.float32)
    return sig


def _build_reference():
    install_audio_stubs()
    ref_path()
    import model as ref_model_mod
    import msstftd as ref_msstftd
    import modules as ref_m
    import quantization as ref_qt

    torch.manual_seed(1234)
    encoder = ref_m.SEANetEncoder(channels=1, norm='weight_norm', causal=True,
                                  n_filters=N_FILTERS)
    decoder = ref_m.SEANetDecoder(channels=1, norm='weight_norm', causal=True,
                                  n_filters=N_FILTERS)
    quantizer = ref_qt.ResidualVectorQuantizer(
        dimension=encoder.dimension, n_q=N_Q, bins=1024)
    model = ref_model_mod.EncodecModel(
        encoder, decoder, quantizer, target_bandwidths=[1.5],
        sample_rate=24000, channels=1, normalize=False, segment=None,
        name='toy')
    # pre-init codebooks: no kmeans init and no expiry inside the horizon
    for layer in model.quantizer.vq.layers:
        cb = layer._codebook
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed * 10.0)
        cb.cluster_size.fill_(10.0)
        cb.inited.fill_(1)
    disc = ref_msstftd.MultiScaleSTFTDiscriminator(
        filters=DISC['filters'], n_ffts=list(DISC['n_ffts']),
        hop_lengths=list(DISC['hop_lengths']),
        win_lengths=list(DISC['win_lengths']))
    return model, disc


def _run_reference(model, disc, batch_np, n_steps):
    """The reference train_one_step inner loop, stripped of loader/logging."""
    from balancer import Balancer as RefBalancer
    from losses import disc_loss as ref_disc_loss
    from losses import total_loss as ref_total_loss

    balancer = RefBalancer(
        weights={'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    opt_g = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(disc.parameters(), lr=LR, betas=(0.5, 0.9))
    model.train()
    disc.train()
    x = torch.from_numpy(batch_np)
    history = []
    for _ in range(n_steps):
        opt_g.zero_grad()
        output, loss_w, _ = model(x)
        logits_real, fmap_real = disc(x)
        logits_fake, fmap_fake = disc(output)
        losses_g = ref_total_loss(fmap_real, logits_fake, fmap_fake, x,
                                  output, sample_rate=24000)
        balancer.backward(losses_g, output, retain_graph=True)
        loss_w.backward()
        opt_g.step()

        opt_d.zero_grad()
        lr_, _ = disc(x)
        lf_, _ = disc(output.detach())
        loss_d = ref_disc_loss(lr_, lf_)
        loss_d.backward()
        opt_d.step()
        history.append({
            **{k: float(v) for k, v in losses_g.items()},
            'loss_w': float(loss_w), 'loss_disc': float(loss_d)})
    return history


def _run_ours(ref_model, ref_disc, batch_np, n_steps):
    from encodec_pytorch_tpu.convert import msstftd_params_from_torch
    from encodec_pytorch_tpu.models.model import (
        EncodecModel, variables_from_torch_state_dict)
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.train.balancer import Balancer
    from encodec_pytorch_tpu.train.step import (TrainState, build_train_step,
                                                init_train_state)

    model = EncodecModel._get_model(
        [1.5], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=N_Q, n_filters=N_FILTERS)
    disc = MultiScaleSTFTDiscriminator(**DISC)
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    const_lr = lambda step: jnp.float32(LR)
    step_fn = jax.jit(build_train_step(model, disc, balancer, const_lr,
                                       const_lr, disc_prob=1.0,
                                       sample_rate=24000))

    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=T)
    variables = variables_from_torch_state_dict(model, to_numpy_sd(ref_model))
    state = TrainState(
        params_g=variables['params'],
        params_d=msstftd_params_from_torch(to_numpy_sd(ref_disc)),
        quantizer=variables['quantizer'],
        opt_g=state.opt_g, opt_d=state.opt_d,  # fresh Adam moments re-init
        balancer=state.balancer, step=state.step)
    # Adam moments must be re-initialized against the converted params (the
    # random-init tree has the same structure/shapes, but re-init is cheap
    # and keeps this robust)
    from encodec_pytorch_tpu.train.step import make_optimizers
    opt = make_optimizers()
    state = state._replace(opt_g=opt.init(state.params_g),
                           opt_d=opt.init(state.params_d))

    batch = jnp.asarray(batch_np)
    allowed = jnp.asarray(True)
    history = []
    for i in range(n_steps):
        # fresh key per call, but the step folds in state.step; any key works
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(7), allowed)
        history.append({k: float(metrics[k]) for k in
                        ('l_t', 'l_f', 'l_g', 'l_feat', 'loss_w', 'loss_disc')})
    return history


def test_training_trajectory_matches_reference():
    batch_np = _make_batch()
    ref_model, ref_disc = _build_reference()
    with cuda_to_cpu():
        ref_hist = _run_reference(ref_model, ref_disc, batch_np, N_STEPS)
    # rebuild reference weights are mutated in place — rebuild for conversion
    ref_model2, ref_disc2 = _build_reference()
    ours_hist = _run_ours(ref_model2, ref_disc2, batch_np, N_STEPS)

    keys = ('l_t', 'l_f', 'l_g', 'l_feat', 'loss_w', 'loss_disc')
    # step 0 is pure forward parity from identical weights — tight
    for k in keys:
        np.testing.assert_allclose(ours_hist[0][k], ref_hist[0][k],
                                   rtol=2e-3, atol=2e-4, err_msg=f'step0 {k}')
    # trajectories drift with fp reassociation; require close tracking over
    # the horizon (GAN dynamics would diverge fast if the optimizer/balancer
    # math differed)
    for i in range(1, N_STEPS):
        # fp reassociation noise amplifies through the GAN dynamics —
        # allow 5% in the early horizon, 20% late (observed: ≤8% at step 18)
        rtol = 0.05 if i <= 10 else 0.20
        for k in ('l_f', 'l_t', 'loss_w'):
            ref_v, our_v = ref_hist[i][k], ours_hist[i][k]
            assert abs(our_v - ref_v) <= rtol * abs(ref_v) + 1e-3, (
                i, k, ref_v, our_v)
    # both must actually learn: mel loss drops over the horizon
    assert ours_hist[-1]['l_f'] < ref_hist[0]['l_f']
