"""Jitted GAN train step: runs, updates params, gates the disc update, and
compiles/executes sharded over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from encodec_pytorch_tpu.models.model import EncodecModel
from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from encodec_pytorch_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicated_sharding, shard_batch)
from encodec_pytorch_tpu.train.balancer import Balancer
from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule
from encodec_pytorch_tpu.train.step import (
    TrainState, build_train_step, init_train_state)


def _tiny_setup(n_q=2, length=1200):
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=n_q, n_filters=4)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128))
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=10, warmup_ratio=1e-4)
    step_fn = build_train_step(model, disc, balancer, sched, sched,
                               disc_prob=1.0, sample_rate=24000)
    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=length)
    return model, disc, step_fn, state


def test_train_step_updates_generator_and_disc():
    model, disc, step_fn, state = _tiny_setup()
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200)) * 0.1
    jitted = jax.jit(step_fn)
    new_state, metrics = jitted(state, batch, jax.random.PRNGKey(2),
                                jnp.asarray(True))
    assert int(new_state.step) == 1
    # generator params changed
    leaf_before = jax.tree.leaves(state.params_g)[0]
    leaf_after = jax.tree.leaves(new_state.params_g)[0]
    assert not np.allclose(np.asarray(leaf_before), np.asarray(leaf_after))
    assert float(metrics['disc_updated']) == 1.0
    # disc params changed too (warmup LR is tiny at step 0 → compare exactly)
    d_before = jax.tree.leaves(state.params_d)[0]
    d_after = jax.tree.leaves(new_state.params_d)[0]
    assert (np.asarray(d_before) != np.asarray(d_after)).any()
    assert np.isfinite(float(metrics['loss_g']))
    assert float(metrics['loss_w']) >= 0


def test_disc_gating_blocks_update():
    model, disc, step_fn, state = _tiny_setup()
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200)) * 0.1
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(2),
                                          jnp.asarray(False))
    assert float(metrics['disc_updated']) == 0.0
    d_before = jax.tree.leaves(state.params_d)[0]
    d_after = jax.tree.leaves(new_state.params_d)[0]
    np.testing.assert_array_equal(np.asarray(d_before), np.asarray(d_after))


def test_train_step_data_parallel_8_devices():
    model, disc, step_fn, state = _tiny_setup()
    mesh = create_mesh()
    assert mesh.devices.size == 8
    repl = replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    batch = shard_batch(mesh, np.random.RandomState(0)
                        .randn(8, 1, 1200).astype(np.float32) * 0.1)
    jitted = jax.jit(step_fn,
                     in_shardings=(repl, batch_sharding(mesh), repl, repl),
                     out_shardings=(repl, repl))
    new_state, metrics = jitted(state, batch, jax.device_put(
        jax.random.PRNGKey(2), repl), jax.device_put(jnp.asarray(True), repl))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics['loss_g']))

    # determinism vs single-device: same batch unsharded gives same metrics
    state_1d = jax.device_put(state, jax.devices()[0])
    batch_1d = jnp.asarray(np.asarray(batch))
    new_state_1d, metrics_1d = jax.jit(step_fn)(
        state_1d, batch_1d, jax.random.PRNGKey(2), jnp.asarray(True))
    np.testing.assert_allclose(float(metrics['loss_g']),
                               float(metrics_1d['loss_g']), rtol=1e-4)


def test_balancer_vjp_chunk_and_remat_equivalence():
    """chunk ∈ {2, 4} and remat recompute the same math as the sequential
    baseline — identical metrics and parameter updates (fp tolerance)."""
    model, disc, _, state = _tiny_setup()
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=10, warmup_ratio=1e-4)
    batch = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 1200)) * 0.1
    rng = jax.random.PRNGKey(6)
    allowed = jnp.asarray(True)

    def run(**kw):
        fn = jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                      disc_prob=1.0, sample_rate=24000, **kw))
        new_state, metrics = fn(state, batch, rng, allowed)
        return new_state, metrics

    base_state, base_metrics = run()
    # shared_disc_vjp=False is the monolithic losses-VJP (reference-shaped);
    # the default path splits it across shared disc forwards — same math
    for kw in ({'shared_disc_vjp': False}, {'balancer_vjp_chunk': 2},
               {'balancer_vjp_chunk': 4}, {'remat': True}):
        alt_state, alt_metrics = run(**kw)
        for k in base_metrics:
            np.testing.assert_allclose(alt_metrics[k], base_metrics[k],
                                       rtol=2e-4, atol=1e-5, err_msg=str((kw, k)))
        for a, b in zip(jax.tree.leaves(base_state.params_g),
                        jax.tree.leaves(alt_state.params_g)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6,
                                       err_msg=str(kw))


def test_masked_disc_update_matches_cond():
    """disc_cond_update=False (unconditional compute + jnp.where apply —
    the TPU-fast path, PERF_NOTES 'masked disc update') must produce
    exactly the same new state and metrics as the lax.cond-gated update,
    both when the update fires and when it is gated off."""
    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=4)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128))
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=10, warmup_ratio=1e-4)
    fns = {
        mode: jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                       disc_prob=1.0, sample_rate=24000,
                                       disc_cond_update=mode))
        for mode in (True, False)
    }
    state0 = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                              example_length=1200)
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200)) * 0.1

    for allowed in (True, False):
        out = {}
        for mode, fn in fns.items():
            new_state, metrics = fn(state0, batch, jax.random.PRNGKey(2),
                                    jnp.asarray(allowed))
            out[mode] = (new_state, metrics)
        s_cond, m_cond = out[True]
        s_mask, m_mask = out[False]
        for a, b in zip(jax.tree.leaves(s_cond), jax.tree.leaves(s_mask)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)
        for k in m_cond:
            np.testing.assert_allclose(np.asarray(m_cond[k]),
                                       np.asarray(m_mask[k]),
                                       atol=1e-6, rtol=1e-6,
                                       err_msg=f'metric {k} allowed={allowed}')


def test_skip_nonfinite_guard():
    """skip_nonfinite=True drops a poisoned update (NaN batch) wholesale —
    state reverts except `step` — and reports it; a clean batch updates
    normally with skipped_nonfinite == 0. Guard off: NaNs propagate."""
    from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule

    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=4)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128))
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=10, warmup_ratio=1e-4)
    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=1200)
    guarded = jax.jit(build_train_step(
        model, disc, balancer, sched, sched, disc_prob=1.0,
        sample_rate=24000, skip_nonfinite=True))

    bad = jnp.full((2, 1, 1200), jnp.nan)
    new_state, metrics = guarded(state, bad, jax.random.PRNGKey(2),
                                 jnp.asarray(True))
    assert float(metrics['skipped_nonfinite']) == 1.0
    assert int(new_state.step) == 1  # schedules keep advancing
    for a, b in zip(jax.tree.leaves(state.params_g),
                    jax.tree.leaves(new_state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.params_d),
                    jax.tree.leaves(new_state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.quantizer),
                    jax.tree.leaves(new_state.quantizer)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    good = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200)) * 0.1
    new_state2, metrics2 = guarded(new_state, good, jax.random.PRNGKey(2),
                                   jnp.asarray(True))
    assert float(metrics2['skipped_nonfinite']) == 0.0
    assert np.isfinite(float(metrics2['loss_g']))
    assert not np.allclose(np.asarray(jax.tree.leaves(new_state.params_g)[0]),
                           np.asarray(jax.tree.leaves(new_state2.params_g)[0]))

    # guard off: the poisoned update lands
    plain = jax.jit(build_train_step(
        model, disc, balancer, sched, sched, disc_prob=1.0,
        sample_rate=24000))
    poisoned, _ = plain(state, bad, jax.random.PRNGKey(2), jnp.asarray(True))
    assert not np.isfinite(
        np.asarray(jax.tree.leaves(poisoned.params_g)[0])).all()


def _frozen_quantizer_setup(length=1200):
    """Model + state whose quantizer EMA is a bit-exact fixed point:
    decay=1.0, uniform cluster_size=16 (power of 2, above the expiry
    threshold) and embed_avg = embed * 16 make ``_stage_train_forward``
    return the state unchanged — so every microbatch of an accumulated
    step quantizes with the SAME codebook the full-batch step uses."""
    import dataclasses

    model = EncodecModel._get_model(
        [1.5, 3.], 24000, 1, causal=True, model_norm='weight_norm',
        audio_normalize=False, segment=None, n_q=2, n_filters=4)
    model.quantizer = dataclasses.replace(model.quantizer, decay=1.0)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 128), hop_lengths=(64, 32),
        win_lengths=(256, 128))
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=10, warmup_ratio=1e-4)
    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=length)
    q = state.quantizer
    embed = jax.random.normal(jax.random.PRNGKey(7), q.embed.shape)
    state = state._replace(quantizer=q._replace(
        inited=jnp.ones_like(q.inited),
        cluster_size=jnp.full_like(q.cluster_size, 16.0),
        embed=embed,
        embed_avg=embed * 16.0))
    return model, disc, balancer, sched, state


def test_grad_accum_equals_full_batch_on_duplicated_microbatches():
    """grad_accum_steps=2 on a batch whose two interleaved microbatches are
    IDENTICAL must produce the same update as the plain full-batch step:
    per-loss grads equal the full-batch grads sample-for-sample, the
    balancer's count-weighted EMA yields the same avg norms, and the disc
    grad is a batch mean — so new params (G and D) and all loss metrics
    must match to fp tolerance. The quantizer is frozen at a bit-exact EMA
    fixed point so both paths quantize identically."""
    model, disc, balancer, sched, state = _frozen_quantizer_setup()
    mb = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200)) * 0.1
    # interleaved duplication: batch[0::2] == batch[1::2] == mb
    batch = jnp.repeat(mb, 2, axis=0)
    rng = jax.random.PRNGKey(2)
    allowed = jnp.asarray(True)

    plain = jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                     disc_prob=1.0, sample_rate=24000))
    accum = jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                     disc_prob=1.0, sample_rate=24000,
                                     grad_accum_steps=2))
    s1, m1 = plain(state, batch, rng, allowed)
    s2, m2 = accum(state, batch, rng, allowed)

    assert int(s2.step) == 1 and float(m2['disc_updated']) == 1.0
    for k in ('loss_g', 'loss_w', 'loss_disc', 'l_t', 'l_f', 'l_g',
              'l_feat', 'lr_g', 'lr_d'):
        np.testing.assert_allclose(np.asarray(m2[k]), np.asarray(m1[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.params_g),
                    jax.tree.leaves(s2.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params_d),
                    jax.tree.leaves(s2.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # frozen-quantizer fixed point held bit-exactly in both paths
    for a, b in zip(jax.tree.leaves(state.quantizer),
                    jax.tree.leaves(s2.quantizer)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_step_trains_and_gates():
    """With a LIVE quantizer EMA (decay<1) the accumulated step still runs,
    updates the generator, honors the disc gate, and reports finite,
    averaged metrics; accum=4 over batch 8 exercises a >2-long scan."""
    model, disc, step_fn, state = _tiny_setup()
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100, eta_ratio=0.1,
                                   warmup_iter=10, warmup_ratio=1e-4)
    accum = jax.jit(build_train_step(model, disc, balancer, sched, sched,
                                     disc_prob=1.0, sample_rate=24000,
                                     grad_accum_steps=4))
    batch = jax.random.normal(jax.random.PRNGKey(3), (8, 1, 1200)) * 0.1
    new_state, metrics = accum(state, batch, jax.random.PRNGKey(4),
                               jnp.asarray(True))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics['loss_g']))
    assert float(metrics['disc_updated']) == 1.0
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.params_g)[0]),
        np.asarray(jax.tree.leaves(new_state.params_g)[0]))
    # quantizer EMA advanced (live decay)
    assert not np.allclose(
        np.asarray(state.quantizer.cluster_size),
        np.asarray(new_state.quantizer.cluster_size))

    # disc gate blocks the masked apply
    blocked, mb = accum(state, batch, jax.random.PRNGKey(4),
                        jnp.asarray(False))
    assert float(mb['disc_updated']) == 0.0
    for a, b in zip(jax.tree.leaves(state.params_d),
                    jax.tree.leaves(blocked.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_data_parallel_8_devices():
    """accum=2 jitted over the 8-device mesh: each 8-row microbatch shards
    evenly; losses match the single-device accumulated run."""
    model, disc, balancer, sched, state = _frozen_quantizer_setup()
    step_fn = build_train_step(model, disc, balancer, sched, sched,
                               disc_prob=1.0, sample_rate=24000,
                               grad_accum_steps=2)
    mesh = create_mesh()
    repl = replicated_sharding(mesh)
    state_sh = jax.device_put(state, repl)
    batch_np = np.random.RandomState(0).randn(16, 1, 1200).astype(
        np.float32) * 0.1
    batch = shard_batch(mesh, batch_np)
    jitted = jax.jit(step_fn,
                     in_shardings=(repl, batch_sharding(mesh), repl, repl),
                     out_shardings=(repl, repl))
    new_state, metrics = jitted(
        state_sh, batch, jax.device_put(jax.random.PRNGKey(2), repl),
        jax.device_put(jnp.asarray(True), repl))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics['loss_g']))

    state_1d = jax.device_put(state, jax.devices()[0])
    _, m1 = jax.jit(step_fn)(state_1d, jnp.asarray(batch_np),
                             jax.random.PRNGKey(2), jnp.asarray(True))
    np.testing.assert_allclose(float(metrics['loss_g']),
                               float(m1['loss_g']), rtol=1e-4)


def test_codebook_health_metrics():
    """Both step variants report normalized codebook usage entropy and the
    dead-code fraction from the RVQ EMA state; entropy lands in (0, 1] and
    a fresh kmeans-inited codebook on a small batch leaves most codes under
    the expiry threshold (high dead fraction), while a frozen uniform
    codebook (cluster_size=16 everywhere) reports dead_frac == 0."""
    model, disc, step_fn, state = _tiny_setup()
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200)) * 0.1
    _, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(2),
                                  jnp.asarray(True))
    ent = float(metrics['codebook_entropy'])
    dead = float(metrics['codebook_dead_frac'])
    assert 0.0 < ent <= 1.0
    # 1200 samples / 75 frames over 1024 bins: most codes start dead
    assert 0.5 < dead <= 1.0

    # frozen uniform codebook (accum path): every code's EMA count is 16
    model2, disc2, balancer, sched, state2 = _frozen_quantizer_setup()
    accum = jax.jit(build_train_step(model2, disc2, balancer, sched, sched,
                                     disc_prob=1.0, sample_rate=24000,
                                     grad_accum_steps=2))
    _, m2 = accum(state2, jnp.repeat(batch, 2, axis=0),
                  jax.random.PRNGKey(2), jnp.asarray(True))
    np.testing.assert_allclose(float(m2['codebook_entropy']), 1.0, atol=1e-5)
    assert float(m2['codebook_dead_frac']) == 0.0
