"""Does-it-learn smoke test: a tiny codec + GAN step on pure tones must
reduce the reconstruction losses within a few dozen steps."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from encodec_pytorch_tpu.train.balancer import Balancer
from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule
from encodec_pytorch_tpu.train.step import build_train_step, init_train_state


def test_losses_decrease():
    model = EncodecModel._get_model(
        [1.5], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=4)
    disc = MultiScaleSTFTDiscriminator(filters=4, n_ffts=(256,),
                                       hop_lengths=(64,), win_lengths=(256,))
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=2000, eta_ratio=0.1,
                                   warmup_iter=5, warmup_ratio=1e-2)
    step_fn = jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                       disc_prob=0.0, sample_rate=24000))
    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=1600)

    t = np.arange(1600) / 24000
    batch = jnp.asarray(np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.5 * np.sin(2 * np.pi * 880 * t)])[:, None, :].astype(np.float32))

    history = []
    for i in range(60):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1),
                                 jnp.asarray(False))
        history.append(float(metrics['l_f']))
    first = history[0]
    best_late = min(history[-20:])
    # the mel loss is the dominant learning signal; require a solid drop
    assert best_late < 0.75 * first, (first, best_late)
    assert np.isfinite(history[-1])
