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
