"""STFT/mel front-end, generator/disc losses, balancer algebra, schedules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from encodec_pytorch_tpu.ops.stft import (
    audio_to_mel, hann_window, mel_filterbank, stft)
from encodec_pytorch_tpu.train.balancer import Balancer
from encodec_pytorch_tpu.train.losses import disc_loss, total_loss
from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule


def test_stft_matches_torch():
    torch.manual_seed(0)
    for n_fft, hop in [(1024, 256), (512, 128), (32, 8)]:
        xt = torch.randn(3, n_fft * 4)
        win = torch.hann_window(n_fft)
        ref = torch.stft(xt, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                         window=win, center=False, return_complex=True).numpy()
        ours = np.asarray(stft(jnp.asarray(xt.numpy()), n_fft, hop, n_fft))
        np.testing.assert_allclose(ours.real, ref.real, atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(ours.imag, ref.imag, atol=1e-3, rtol=1e-4)


def test_stft_normalized_matches_torchaudio_semantics():
    # torchaudio Spectrogram(normalized=True) divides by window L2 norm
    torch.manual_seed(1)
    n_fft, hop = 256, 64
    xt = torch.randn(2, 1024)
    win = torch.hann_window(n_fft)
    ref = torch.stft(xt, n_fft=n_fft, hop_length=hop, window=win,
                     center=False, return_complex=True)
    ref = (ref / win.pow(2).sum().sqrt()).numpy()
    ours = np.asarray(stft(jnp.asarray(xt.numpy()), n_fft, hop, n_fft,
                           normalized=True))
    np.testing.assert_allclose(ours.real, ref.real, atol=1e-4, rtol=1e-4)


def test_stft_matmul_matches_fft():
    """The MXU (DFT-as-strided-conv) lowering equals the FFT path up to f32
    matmul roundoff, including window-L2 normalization and win < n_fft."""
    from encodec_pytorch_tpu.ops.stft import stft_matmul

    rng = np.random.RandomState(0)
    for n_fft, hop, win, norm in [(256, 64, 256, False), (128, 32, 128, True),
                                  (64, 16, 64, False), (256, 64, 128, False),
                                  (128, 32, 64, True)]:
        x = jnp.asarray(rng.randn(2, 3, 2048).astype(np.float32))
        ref = stft(x, n_fft, hop, win, normalized=norm)
        re, im = stft_matmul(x, n_fft, hop, win, normalized=norm)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(re), np.asarray(ref.real),
                                   atol=2e-4 * scale, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(im), np.asarray(ref.imag),
                                   atol=2e-4 * scale, rtol=1e-4)


def test_stft_short_window_matches_torch():
    """win_length < n_fft: torch.stft center-pads the window to n_fft —
    both our fft and matmul paths must match (ADVICE r2: the old kernel
    left-aligned the window and the fft path broadcast-errored)."""
    from encodec_pytorch_tpu.ops.stft import stft_matmul

    torch.manual_seed(3)
    for n_fft, hop, win in [(256, 64, 128), (128, 32, 96), (64, 16, 32)]:
        xt = torch.randn(2, 1024)
        ref = torch.stft(xt, n_fft=n_fft, hop_length=hop, win_length=win,
                         window=torch.hann_window(win), center=False,
                         return_complex=True).numpy()
        x = jnp.asarray(xt.numpy())
        ours = np.asarray(stft(x, n_fft, hop, win))
        np.testing.assert_allclose(ours.real, ref.real, atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(ours.imag, ref.imag, atol=1e-3, rtol=1e-4)
        re, im = stft_matmul(x, n_fft, hop, win)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3,
                                   rtol=1e-4)


def test_stft_method_matmul_matches_fft_in_losses_and_disc():
    """`tpu.stft_method: matmul` must reproduce the fft-path mel loss and
    discriminator outputs (same params) up to matmul roundoff."""
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.train.losses import spectral_reconstruction_loss

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32) * 0.3)
    y = x + jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32) * 0.05)

    lf_fft = float(spectral_reconstruction_loss(x, y, 24000, 'fft'))
    lf_mm = float(spectral_reconstruction_loss(x, y, 24000, 'matmul'))
    assert abs(lf_fft - lf_mm) < 2e-3 * max(abs(lf_fft), 1.0), (lf_fft, lf_mm)

    kw = dict(filters=4, n_ffts=(512, 256), hop_lengths=(128, 64),
              win_lengths=(512, 256))
    d_fft = MultiScaleSTFTDiscriminator(**kw)
    d_mm = MultiScaleSTFTDiscriminator(stft_method='matmul', **kw)
    params = d_fft.init(jax.random.PRNGKey(0), x)
    log_f, fm_f = d_fft.apply(params, x)
    log_m, fm_m = d_mm.apply(params, x)
    for a, b in zip(log_f, log_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_grouped_framing_loss_and_grad_match_gather():
    """The phase-grouped reshape framing gives the exact same mel-loss
    value and gradient as the natural gather framing (the loss is a mean
    over frames; the permutation cancels)."""
    from encodec_pytorch_tpu.ops.stft import (frame_signal,
                                              frame_signal_grouped)
    from encodec_pytorch_tpu.train.losses import spectral_reconstruction_loss

    rng = np.random.RandomState(0)
    # frame multiset identity
    x1 = jnp.asarray(rng.randn(2, 700).astype(np.float32))
    a = np.asarray(frame_signal(x1, 64, 16))
    b = np.asarray(frame_signal_grouped(x1, 64, 16))
    assert a.shape == b.shape
    sa = np.sort(a.reshape(-1, 64), axis=0)
    sb = np.sort(b.reshape(-1, 64), axis=0)
    np.testing.assert_array_equal(sa.sum(axis=1).round(4),
                                  sb.sum(axis=1).round(4))

    x = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32) * 0.3)
    y = x + jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32) * 0.05)

    def loss_natural(out):
        # force the gather path by monkey-free means: frame_order defaults
        # to 'natural' inside audio_to_mel
        from encodec_pytorch_tpu.ops.stft import audio_to_mel
        l = jnp.float32(0.0)
        for i in range(5, 12):
            kw = dict(n_fft=2 ** i, win_length=2 ** i,
                      hop_length=(2 ** i) // 4, sampling_rate=24000,
                      n_mel_channels=64)
            mx, my = audio_to_mel(x, **kw), audio_to_mel(out, **kw)
            l = l + jnp.mean(jnp.abs(mx - my)) + jnp.mean(jnp.square(mx - my))
        return l

    v1, g1 = jax.value_and_grad(loss_natural)(y)
    v2, g2 = jax.value_and_grad(
        lambda out: spectral_reconstruction_loss(x, out, 24000))(y)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-7)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1024, 64)
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    # every filter has support, filters tile the spectrum
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: equal-area triangles → peak decreases with width
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()  # monotonically increasing centers


def test_audio_to_mel_matches_reference_composition():
    """Cross-check against a torch composition that mirrors reference
    audio_to_mel.py:34-55 exactly (reflect pad, center=False stft, power sum,
    matmul, log10-clamp), using our own mel basis on both sides."""
    torch.manual_seed(2)
    n_fft, hop, sr, n_mels = 256, 64, 24000, 64
    xt = torch.randn(2, 1, 2048)
    basis = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels))
    p = (n_fft - hop) // 2
    x2 = xt.reshape(2, -1)
    audio = torch.nn.functional.pad(x2, (p, p), "reflect")
    fft = torch.stft(audio, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                     window=torch.hann_window(n_fft), center=False,
                     return_complex=False)
    mel_ref = torch.matmul(basis, torch.sum(torch.pow(fft, 2), dim=[-1]))
    ref = torch.log10(torch.clamp(mel_ref, min=1e-5)).numpy()

    ours = np.asarray(audio_to_mel(jnp.asarray(xt.numpy()), n_fft, hop, n_fft,
                                   sr, n_mels))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref, atol=1e-3, rtol=1e-3)


def test_total_and_disc_loss_values():
    # hand-checkable fixture: two "discriminators", constant logits/fmaps
    x = jnp.ones((2, 1, 2048)) * 0.1
    y = jnp.zeros((2, 1, 2048))
    logits_fake = [jnp.full((2, 4, 4, 1), -1.0), jnp.full((2, 4, 4, 1), 0.5)]
    logits_real = [jnp.full((2, 4, 4, 1), 2.0), jnp.full((2, 4, 4, 1), -0.5)]
    fmap_real = [[jnp.full((2, 3, 3, 1), 1.0)] * 2 for _ in range(2)]
    fmap_fake = [[jnp.full((2, 3, 3, 1), 0.5)] * 2 for _ in range(2)]

    losses = total_loss(fmap_real, logits_fake, fmap_fake, x, y,
                        sample_rate=24000)
    np.testing.assert_allclose(float(losses['l_t']), 0.1, atol=1e-6)
    # l_g: (relu(1-(-1)) + relu(1-0.5)) / K / K = (2 + 0.5)/2/2
    np.testing.assert_allclose(float(losses['l_g']), 2.5 / 4, atol=1e-6)
    # l_feat: per (k,l): |1-0.5|/|1| = 0.5 → sum 4·0.5 / (K·L=4) = 0.5
    np.testing.assert_allclose(float(losses['l_feat']), 0.5, atol=1e-6)
    assert float(losses['l_f']) > 0

    # disc: (relu(1-2)+relu(1+(-1)) + relu(1+0.5)+relu(1+0.5))/2
    d = disc_loss(logits_real, logits_fake)
    np.testing.assert_allclose(float(d), (0 + 0 + 1.5 + 1.5) / 2, atol=1e-6)


def test_balancer_algebra():
    """Port of the reference's own spec test (balancer.py:121-139)."""
    x = jnp.zeros((1,))

    def loss_1(x):
        return jnp.mean(jnp.abs(x - 1))

    def loss_2(x):
        return 100 * jnp.mean(jnp.abs(x + 1))

    grads = {'1': jax.grad(loss_1)(x), '2': jax.grad(loss_2)(x)}

    balancer = Balancer(weights={'1': 1, '2': 1}, rescale_grads=False)
    out_grad, _, _ = balancer(grads, balancer.init_state())
    np.testing.assert_allclose(np.asarray(out_grad), [99.], atol=1e-5)

    balancer = Balancer(weights={'1': 1, '2': 1}, rescale_grads=True)
    out_grad, state, _ = balancer(grads, balancer.init_state())
    np.testing.assert_allclose(np.asarray(out_grad), [0.], atol=1e-5)

    # EMA state persists: feeding same grads keeps averages stable
    out_grad2, _, _ = balancer(grads, state)
    np.testing.assert_allclose(np.asarray(out_grad2), [0.], atol=1e-5)


def test_balancer_rescale_targets_total_norm():
    # with rescale, each loss grad is scaled to weight-share of total_norm
    g = {'a': jnp.full((4, 10), 3.0), 'b': jnp.full((4, 10), 0.01)}
    balancer = Balancer(weights={'a': 1, 'b': 1}, rescale_grads=True,
                        total_norm=1.)
    out, _, _ = balancer(g, balancer.init_state())
    # each rescaled grad has per-item norm 0.5; directions equal → total 1.0
    norm = float(jnp.sqrt(jnp.sum(jnp.square(out[0]))))
    np.testing.assert_allclose(norm, 1.0, rtol=1e-4)


def test_warmup_cosine_schedule_reference_values():
    import math
    sched = warmup_cosine_schedule(1.0, max_iter=1000, eta_ratio=0.1,
                                   warmup_iter=100, warmup_ratio=1e-4)
    # warmup: exp ramp from warmup_ratio to 1
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50)), 1e-4 ** 0.5, rtol=1e-5)
    # main: reference formula with total step (scheduler.py:131-132)
    step = 500
    expect = 0.1 + 0.9 * (1 + math.cos(math.pi * step / 900)) / 2
    np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-5)
    # jit-traceable
    np.testing.assert_allclose(float(jax.jit(sched)(jnp.int32(500))), expect,
                               rtol=1e-5)


def test_frame_signal_time_major_equals_gather():
    """frame_signal_time_major (reshapes + one transpose, scatter-free VJP)
    must reproduce frame_signal exactly — values AND order — for every
    disc/mel (n_fft, hop) pair, including T where phase groups are ragged."""
    import numpy as np
    from encodec_pytorch_tpu.ops.stft import (frame_signal,
                                              frame_signal_time_major)
    rng = np.random.RandomState(0)
    for n_fft, hop in [(1024, 256), (2048, 512), (512, 128), (256, 64),
                       (64, 16), (32, 8)]:
        for T in [n_fft, n_fft + hop, n_fft + 5 * hop, n_fft + 6 * hop,
                  n_fft + 7 * hop, 4 * n_fft + 3 * hop]:
            x = jnp.asarray(rng.randn(2, 3, T).astype(np.float32))
            a = frame_signal(x, n_fft, hop)
            b = frame_signal_time_major(x, n_fft, hop)
            assert a.shape == b.shape, (n_fft, hop, T, a.shape, b.shape)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
