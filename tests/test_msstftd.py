"""MS-STFT discriminator: shape contract mirroring reference msstftd.py:152-163."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator


def test_discriminator_shapes():
    disc = MultiScaleSTFTDiscriminator(filters=32)
    x = jnp.zeros((1, 1, 24000))
    params = disc.init(jax.random.PRNGKey(0), x)
    logits, fmaps = disc.apply(params, x)
    assert len(logits) == len(fmaps) == disc.num_discriminators == 3
    assert all(len(fm) == 5 for fm in fmaps)
    # first fmap channel count is `filters` (NHWC channel-minor)
    assert all(fm[0].shape[-1] == 32 for fm in fmaps)
    assert all(l.ndim == 4 and l.shape[-1] == 1 for l in logits)
    # frequency axis halves per strided conv (stride (1,2) ×3)
    for i, n_fft in enumerate(disc.n_ffts):
        f_bins = n_fft // 2 + 1
        assert fmaps[i][0].shape[2] == f_bins


def test_discriminator_custom_scales_and_grad():
    # 5-scale configuration from scripts/train.sh
    disc = MultiScaleSTFTDiscriminator(
        filters=32,
        n_ffts=(1024, 2048, 512, 256, 128),
        hop_lengths=(256, 512, 128, 64, 32),
        win_lengths=(1024, 2048, 512, 256, 128))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8192))
    params = disc.init(jax.random.PRNGKey(0), x)
    logits, fmaps = disc.apply(params, x)
    assert len(logits) == 5

    def loss(p, x):
        lg, _ = disc.apply(p, x)
        return sum(jnp.mean(l) for l in lg)

    g = jax.grad(loss, argnums=1)(params, x)
    assert np.isfinite(np.asarray(g)).all()


def test_discriminator_numeric_parity_vs_reference():
    """Full numeric parity vs the reference torch discriminator
    (msstftd.py:28-149) with converted weights; the STFT front-end stub is
    the exact torchaudio composition verified in test_losses.py."""
    from ref_compat import install_audio_stubs, ref_path, to_numpy_sd
    install_audio_stubs()
    ref_path()
    import msstftd as ref_msstftd
    import torch

    torch.manual_seed(0)
    ref = ref_msstftd.MultiScaleSTFTDiscriminator(
        filters=8, n_ffts=[512, 256], hop_lengths=[128, 64],
        win_lengths=[512, 256])
    ref.eval()
    x = torch.randn(2, 1, 4000)
    with torch.no_grad():
        logits_t, fmaps_t = ref(x)

    from encodec_pytorch_tpu.convert import msstftd_params_from_torch
    params = msstftd_params_from_torch(to_numpy_sd(ref))
    disc = MultiScaleSTFTDiscriminator(
        filters=8, n_ffts=(512, 256), hop_lengths=(128, 64),
        win_lengths=(512, 256))
    logits_j, fmaps_j = disc.apply({'params': params}, jnp.asarray(x.numpy()))

    def nchw(a):  # ours is NHWC
        return np.transpose(np.asarray(a), (0, 3, 1, 2))

    for lt, lj in zip(logits_t, logits_j):
        np.testing.assert_allclose(nchw(lj), lt.numpy(), atol=2e-4, rtol=1e-3)
    for fm_t, fm_j in zip(fmaps_t, fmaps_j):
        for a, b in zip(fm_t, fm_j):
            np.testing.assert_allclose(nchw(b), a.numpy(), atol=2e-4,
                                       rtol=1e-3)
