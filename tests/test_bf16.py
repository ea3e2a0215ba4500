"""bfloat16 compute mode: the end-to-end bf16 activation pipeline (the
sanctioned replacement for the reference's broken AMP, README.md:14-15
there). Activations live in bf16 between layers; params, the LSTM
recurrence, the quantizer and the losses stay f32 (boundaries cast)."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.seanet import SEANetEncoder


def test_bf16_encoder_close_to_f32():
    enc32 = SEANetEncoder(causal=True, norm='weight_norm', n_filters=8)
    enc16 = SEANetEncoder(causal=True, norm='weight_norm', n_filters=8,
                          dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4800, 1)) * 0.3
    params = enc32.init(jax.random.PRNGKey(1), x)
    y32 = np.asarray(enc32.apply(params, x))
    y16 = np.asarray(enc16.apply(params, x))
    assert y16.dtype == np.float32  # f32 boundary at the latent
    err = np.abs(y32 - y16).mean()
    scale = np.abs(y32).mean()
    assert err / scale < 0.05, (err, scale)


def test_bf16_disc_vjp_differentiable():
    """Regression: per-loss balancer VJPs through a bf16 discriminator used
    to fail — conv transpose rules reject the f32 cotangent that
    ``preferred_element_type=f32`` promotion produced against bf16 saved
    operands. The uniform-dtype pipeline must differentiate cleanly."""
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator

    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2048)) * 0.3
    params = disc.init(jax.random.PRNGKey(1), x)['params']

    def loss_of(out):
        logits, fmaps = disc.apply({'params': params}, out)
        l_g = sum(jnp.mean(jax.nn.relu(1.0 - lg)) for lg in logits)
        l_feat = sum(jnp.mean(jnp.abs(f)) for fm in fmaps for f in fm)
        return l_g + l_feat

    val, vjp = jax.vjp(loss_of, x)
    (g,) = vjp(jnp.float32(1.0))
    assert g.dtype == jnp.float32 and np.isfinite(np.asarray(g)).all()
    assert np.isfinite(float(val))


def test_bf16_codec_roundtrip_quality():
    """bf16 serving: same codes as f32 for nearly all frames, and the
    decoded waveform stays close — the documented quality bound for
    running inference with compute_dtype=bfloat16."""
    from encodec_pytorch_tpu.models.model import EncodecModel

    def build(dtype):
        return EncodecModel._get_model(
            [1.5, 3.], 24_000, 1, causal=True, model_norm='weight_norm',
            audio_normalize=False, segment=None, n_q=4, n_filters=8,
            dtype=dtype)

    m32, m16 = build(jnp.float32), build(jnp.bfloat16)
    variables = m32.init(jax.random.PRNGKey(0), example_length=4800)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    m32.set_target_bandwidth(3.)
    m16.set_target_bandwidth(3.)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 4800)) * 0.3

    codes32 = np.asarray(m32.encode(variables, x)[0][0])
    codes16 = np.asarray(m16.encode(variables, x)[0][0])
    agreement = (codes32 == codes16).mean()
    assert agreement > 0.95, agreement  # argmin flips only near ties

    y32 = np.asarray(m32(variables, x))
    y16 = np.asarray(m16(variables, x))
    err = np.sqrt(((y32 - y16) ** 2).mean())
    scale = np.sqrt((y32 ** 2).mean())
    assert err / scale < 0.15, (err, scale)


def test_bf16_train_step_runs_and_updates():
    """Full GAN step in bf16 compute mode: finite metrics, params move."""
    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.train.balancer import Balancer
    from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule
    from encodec_pytorch_tpu.train.step import (build_train_step,
                                                init_train_state)

    model = EncodecModel._get_model(
        [1.5, 3.], 24_000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=4,
        dtype=jnp.bfloat16)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128), dtype=jnp.bfloat16)
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=5, warmup_ratio=1e-4)
    step = jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                    disc_prob=1.0, sample_rate=24_000))
    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=1920)
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1920)) * 0.1
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2),
                              jnp.asarray(True))
    assert np.isfinite(float(metrics['loss_g']))
    assert np.isfinite(float(metrics['loss_disc']))
    # master params stay f32 and actually moved
    leaf0 = jax.tree.leaves(state.params_g)[0]
    leaf1 = jax.tree.leaves(new_state.params_g)[0]
    assert leaf0.dtype == jnp.float32 and leaf1.dtype == jnp.float32
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
