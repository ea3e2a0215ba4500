"""The jitted SPMD GAN training step.

One compiled XLA program per step covering everything the reference does in
train_one_step (train_multi_gpu.py:32-129): generator forward with random
bandwidth, quantizer EMA update, the 4-loss balancer backward (as VJPs), two
Adam updates with warmup-cosine LRs stepped per batch, and the
probability-gated discriminator update under ``lax.cond``.

Collective traffic that the reference does through NCCL (grad all-reduce via
DDP hooks, bandwidth-index broadcast, disc coin-flip broadcast, balancer norm
all-reduce — SURVEY.md §3.1) is either inserted automatically by GSPMD (grad
psums, global norms over the sharded batch) or deleted outright (the
broadcasts: every replica derives the same decision from the same per-step
PRNG key inside the single program).
"""

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.model import EncodecModel
from ..models.msstftd import MultiScaleSTFTDiscriminator
from .balancer import Balancer, BalancerState
from .losses import disc_loss, gan_losses, total_loss, wav_losses


class TrainState(NamedTuple):
    params_g: Any            # generator (encoder+decoder) params
    params_d: Any            # discriminator params
    quantizer: Any           # CodebookState (RVQ EMA buffers)
    opt_g: Any               # optax state, generator
    opt_d: Any               # optax state, discriminator
    balancer: BalancerState
    step: jnp.ndarray        # global step (drives both LR schedules)


def make_optimizers():
    """Adam(betas=(0.5, 0.9)) for both models (train_multi_gpu.py:295-296).
    LR is applied manually from the schedule so the *global* step drives both
    schedules even though the disc only updates when its coin-flip fires
    (reference steps both schedulers every batch, train_multi_gpu.py:128-129).
    """
    return optax.scale_by_adam(b1=0.5, b2=0.9, eps=1e-8)


def init_train_state(model: EncodecModel, disc: MultiScaleSTFTDiscriminator,
                     balancer: Balancer, key: jax.Array,
                     example_length: int) -> TrainState:
    k_model, k_disc = jax.random.split(key)
    variables = model.init(k_model, example_length=example_length)
    x = jnp.zeros((1, model.channels, example_length), jnp.float32)
    params_d = disc.init(k_disc, x)['params']
    opt = make_optimizers()
    state = TrainState(
        params_g=variables['params'],
        params_d=params_d,
        quantizer=variables['quantizer'],
        opt_g=opt.init(variables['params']),
        opt_d=opt.init(params_d),
        balancer=balancer.init_state(),
        step=jnp.zeros((), jnp.int32),
    )
    # de-alias every leaf: donated jitted steps reject duplicate buffers
    return jax.tree.map(jnp.copy, state)


def _codebook_metrics(cb, dead_threshold: float) -> Dict[str, jnp.ndarray]:
    """Codebook-health scalars from the RVQ EMA state (free — no extra
    forward work): mean normalized usage entropy across stages (1.0 =
    uniform code usage, → 0 = collapse) and the fraction of codes whose
    EMA cluster size sits under the expiry threshold. The reference has no
    analogue (its FIXME at core_vq.py:157 never landed stats at all)."""
    cs = cb.cluster_size                                    # [K, bins]
    p = cs / (jnp.sum(cs, axis=-1, keepdims=True) + 1e-12)
    ent = -jnp.sum(p * jnp.log2(p + 1e-12), axis=-1)        # [K]
    bins = cs.shape[-1]
    return {
        'codebook_entropy': jnp.mean(ent) / jnp.log2(jnp.float32(bins)),
        'codebook_dead_frac': jnp.mean(
            (cs < dead_threshold).astype(jnp.float32)),
    }


def build_train_step(model: EncodecModel, disc: MultiScaleSTFTDiscriminator,
                     balancer: Balancer, gen_schedule, disc_schedule,
                     disc_prob: float, sample_rate: int,
                     remat: bool = False, balancer_vjp_chunk: int = 1,
                     stft_method: str = 'fft', shared_disc_vjp: bool = True,
                     disc_cond_update: bool = True,
                     skip_nonfinite: bool = False,
                     grad_accum_steps: int = 1):
    """Returns ``step_fn(state, batch, rng, disc_allowed) -> (state, metrics)``
    (not yet jitted — the trainer jits it with shardings/donation).

    ``balancer_vjp_chunk``: how many of the 4 per-loss VJPs to batch per
    pass via vmap (1 = fully sequential, the reference's 4 autograd.grad
    calls; 4 = one batched VJP, holds 4× the disc-backward activations —
    measured to OOM a 16 GB chip at batch 12×72000; 2 = middle ground).
    ``stft_method``: 'fft' | 'matmul' for the mel-loss front end (the disc's
    own STFT method is configured on the disc module).
    ``shared_disc_vjp``: split the monolithic losses-VJP into per-path VJPs
    that share the two discriminator forwards between the generator losses
    and the gated disc update (the reference runs 4 disc forwards per step:
    real, fake, and a recompute of both inside the disc update,
    train_multi_gpu.py:62-63,111-116). l_t/l_f differentiate through the
    waveform path only, l_g/l_feat through the disc-output path only
    (losses.py:37-54 — each loss has exactly one path), and the disc update
    reuses the same forwards' residuals for its parameter gradients. Same
    math, ~2 fewer disc forwards and no dead weight-gradient work in the
    generator VJPs. Requires ``balancer_vjp_chunk == 1``.
    ``disc_cond_update``: True gates the disc update under ``lax.cond``
    (skipped steps skip the backward FLOPs); False always computes the
    update and masks its application with ``jnp.where``. The cond boundary
    forces XLA to layout-canonicalize every disc-forward residual the
    update's VJP closures capture (~100 ms of relayout copies per step in
    the round-3 profiler trace), so masking is faster whenever
    ``disc_prob`` ≥ ~0.5 despite the wasted FLOPs on skipped steps.
    ``skip_nonfinite``: guard each step — if any loss or any updated
    param/EMA leaf is NaN/Inf, drop the whole update (state reverts except
    ``step``) and report ``metrics['skipped_nonfinite']``. Device-side, no
    host sync; off by default so the compiled program matches the
    reference-parity trajectory tests exactly.
    ``grad_accum_steps``: N > 1 splits the batch into N interleaved
    microbatches (``batch[a::N]`` — device-local under contiguous data
    sharding, no resharding traffic), runs the forward/backward per
    microbatch inside a ``lax.scan`` holding only ONE microbatch's
    residuals live at a time, averages the *balanced* generator gradients
    and the discriminator gradients, and applies one optimizer update.
    This trades wall-clock for HBM — large effective batches at 48 kHz
    stereo scale that would otherwise OOM a 16 GB chip. Semantics: the
    quantizer EMA and balancer-norm EMA advance per microbatch (count-
    weighted, so N microbatches carry the same averager weight as the
    full batch); the disc coin flip and the random bandwidth are drawn
    once per STEP. The disc gradient is exactly the full-batch gradient
    (``disc_loss`` is a batch mean). Requires the shared-VJP path; the
    disc update is always compute+mask (no ``lax.cond``).
    """
    opt = make_optimizers()
    if grad_accum_steps > 1:
        assert shared_disc_vjp and balancer_vjp_chunk == 1, (
            'grad_accum_steps > 1 requires shared_disc_vjp=True and '
            'balancer_vjp_chunk=1 (the shipped default strategy)')
        return _build_accum_step(
            model, disc, balancer, gen_schedule, disc_schedule, opt,
            disc_prob=disc_prob, sample_rate=sample_rate, remat=remat,
            stft_method=stft_method, skip_nonfinite=skip_nonfinite,
            accum=int(grad_accum_steps))

    def step_fn(state: TrainState, batch: jnp.ndarray, rng: jax.Array,
                disc_allowed: jnp.ndarray) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng_bw, rng_coin = jax.random.split(jax.random.fold_in(rng, state.step))

        # ---- generator forward with VJP wrt params
        def gen_fwd(params_g):
            variables = {'params': params_g, 'quantizer': state.quantizer}
            output, loss_w, new_cb = model.forward_train(variables, batch,
                                                         rng_bw, remat=remat)
            return (output, loss_w), new_cb

        (output, loss_w), gen_vjp, new_cb = jax.vjp(gen_fwd, state.params_g,
                                                    has_aux=True)

        # ---- per-loss gradients wrt the generator output (balancer VJPs)
        logits_real, fmap_real = disc.apply({'params': state.params_d}, batch)

        def losses_of(out):
            logits_fake, fmap_fake = disc.apply({'params': state.params_d}, out)
            return total_loss(fmap_real, logits_fake, fmap_fake, batch, out,
                              sample_rate=sample_rate,
                              stft_method=stft_method)

        if shared_disc_vjp and balancer_vjp_chunk == 1:
            # Path-split VJPs: ONE disc-fake forward whose residuals serve
            # both generator-loss VJPs, and per-path loss graphs so each
            # VJP only traverses the work its loss actually uses (the
            # monolithic losses_of VJP drags the full graph — mel included —
            # through every call and leans on XLA to DCE the zero-cotangent
            # branches).
            def disc_fake_fn(out):
                return disc.apply({'params': state.params_d}, out)

            (logits_fake, fmap_fake), disc_fake_vjp = jax.vjp(disc_fake_fn,
                                                              output)
            wav_vals, wav_vjp = jax.vjp(
                lambda out: wav_losses(batch, out, sample_rate, stft_method),
                output)
            gan_vals, gan_vjp = jax.vjp(
                lambda lf, ff: gan_losses(fmap_real, lf, ff),
                logits_fake, fmap_fake)
            loss_vals = {**wav_vals, **gan_vals}
            names = sorted(loss_vals.keys())
            grads_per_loss = {}
            for name in wav_vals:
                cot = {k: jnp.float32(1.0 if k == name else 0.0)
                       for k in wav_vals}
                grads_per_loss[name], = wav_vjp(cot)
            for name in gan_vals:
                cot = {k: jnp.float32(1.0 if k == name else 0.0)
                       for k in gan_vals}
                cot_lf, cot_ff = gan_vjp(cot)
                grads_per_loss[name], = disc_fake_vjp((cot_lf, cot_ff))
        elif balancer_vjp_chunk > 1:
            # chunked batched VJPs: vmap over `chunk` one-hot cotangents at a
            # time, lax.map over the chunks (memory = chunk × one backward)
            loss_vals, loss_vjp = jax.vjp(losses_of, output)
            names = sorted(loss_vals.keys())
            n = len(names)
            assert n % balancer_vjp_chunk == 0, (n, balancer_vjp_chunk)
            eye = jnp.eye(n, dtype=jnp.float32).reshape(
                n // balancer_vjp_chunk, balancer_vjp_chunk, n)

            def one(cvec):
                cot = {k: cvec[i] for i, k in enumerate(names)}
                return loss_vjp(cot)[0]

            stacked = jax.lax.map(jax.vmap(one), eye)
            stacked = stacked.reshape(n, *stacked.shape[2:])
            grads_per_loss = {name: stacked[i] for i, name in enumerate(names)}
        else:
            # Sequential per-loss VJPs (the reference's 4 autograd.grad calls,
            # balancer.py:87). A fully vmapped VJP was measured: it cuts
            # compile time 2.5x but holds 4x the disc-backward activations
            # live and OOMs a 16 GB chip at batch 12 x 72000 — rejected.
            loss_vals, loss_vjp = jax.vjp(losses_of, output)
            names = sorted(loss_vals.keys())
            grads_per_loss = {}
            for name in names:
                cot = {k: (jnp.float32(1.0) if k == name else jnp.float32(0.0))
                       for k in names}
                grads_per_loss[name], = loss_vjp(cot)

        out_grad, new_balancer, bal_metrics = balancer(grads_per_loss,
                                                       state.balancer)

        # ---- combined backward: balancer cotangent + loss_w (weight 1)
        grads_g, = gen_vjp((out_grad, jnp.float32(1.0)))

        lr_g = gen_schedule(state.step)
        updates, new_opt_g = opt.update(grads_g, state.opt_g, state.params_g)
        updates = jax.tree.map(lambda u: -lr_g * u, updates)
        new_params_g = optax.apply_updates(state.params_g, updates)

        # ---- discriminator update, probability-gated (train_multi_gpu.py:104-127)
        coin = jax.random.uniform(rng_coin) < disc_prob
        train_disc = jnp.logical_and(jnp.asarray(disc_allowed, bool), coin)
        output_sg = jax.lax.stop_gradient(output)

        if shared_disc_vjp and balancer_vjp_chunk == 1:
            # logits-only parameter VJPs whose forward traces are identical
            # subgraphs of the generator-side disc forwards (same inputs,
            # same params — the fmaps are intermediates either way), so the
            # compiler shares one forward per signal instead of the
            # reference's recompute inside the update (train_multi_gpu.py:
            # 111-116). Backward runs only inside the gated branch.
            lr_v, disc_real_pd_vjp = jax.vjp(
                lambda pd: disc.apply({'params': pd}, batch)[0],
                state.params_d)
            lf_v, disc_fake_pd_vjp = jax.vjp(
                lambda pd: disc.apply({'params': pd}, output_sg)[0],
                state.params_d)

            def disc_grads():
                ld, ld_vjp = jax.vjp(disc_loss, lr_v, lf_v)
                cot_r, cot_f = ld_vjp(jnp.float32(1.0))
                g_real, = disc_real_pd_vjp(cot_r)
                g_fake, = disc_fake_pd_vjp(cot_f)
                return ld, jax.tree.map(jnp.add, g_real, g_fake)
        else:
            def disc_grads():
                def d_loss_fn(params_d):
                    lr_, _ = disc.apply({'params': params_d}, batch)
                    lf_, _ = disc.apply({'params': params_d}, output_sg)
                    return disc_loss(lr_, lf_)

                return jax.value_and_grad(d_loss_fn)(state.params_d)

        def disc_update(_):
            ld, grads_d = disc_grads()
            lr_d = disc_schedule(state.step)
            upd, new_opt_d = opt.update(grads_d, state.opt_d, state.params_d)
            upd = jax.tree.map(lambda u: -lr_d * u, upd)
            return optax.apply_updates(state.params_d, upd), new_opt_d, ld

        def disc_noop(_):
            return state.params_d, state.opt_d, jnp.float32(0.0)

        if disc_cond_update:
            new_params_d, new_opt_d, ld = jax.lax.cond(
                train_disc, disc_update, disc_noop, operand=None)
        else:
            # unconditional compute + masked apply: same update math, but no
            # cond boundary -> no layout canonicalization of the captured
            # disc-forward residuals (see docstring)
            cand_params_d, cand_opt_d, ld_full = disc_update(None)
            sel = lambda a, b: jnp.where(train_disc, a, b)
            new_params_d = jax.tree.map(sel, cand_params_d, state.params_d)
            new_opt_d = jax.tree.map(sel, cand_opt_d, state.opt_d)
            ld = jnp.where(train_disc, ld_full, jnp.float32(0.0))

        # naive weighted sum for logging (train_multi_gpu.py:88)
        loss_g = sum(balancer.weights[k] * loss_vals[k] for k in names)
        metrics = {
            'loss_g': loss_g,
            'loss_w': loss_w,
            'loss_disc': ld,
            'disc_updated': train_disc.astype(jnp.float32),
            'lr_g': lr_g,
            'lr_d': disc_schedule(state.step),
            **{k: v for k, v in loss_vals.items()},
            **bal_metrics,
            **_codebook_metrics(
                new_cb, float(model.quantizer.threshold_ema_dead_code)),
        }
        new_state = TrainState(
            params_g=new_params_g, params_d=new_params_d, quantizer=new_cb,
            opt_g=new_opt_g, opt_d=new_opt_d, balancer=new_balancer,
            step=state.step + 1)
        if skip_nonfinite:
            # failure detection (SURVEY §5): a NaN/Inf anywhere in the
            # losses or the updated params/EMA buffers (bad batch, overflow)
            # reverts every field except `step` — schedules keep advancing,
            # the poisoned update is dropped. Entirely device-side (one
            # fused reduction + scalar selects); no host sync, replicated
            # under GSPMD so all processes take the same branch.
            checks = [jnp.isfinite(loss_g), jnp.isfinite(loss_w),
                      jnp.isfinite(ld)]
            checks += [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(
                (new_params_g, new_params_d, new_cb))]
            ok = functools.reduce(jnp.logical_and, checks)
            sel = lambda n, o: jnp.where(ok, n, o)
            new_state = TrainState(
                params_g=jax.tree.map(sel, new_params_g, state.params_g),
                params_d=jax.tree.map(sel, new_params_d, state.params_d),
                quantizer=jax.tree.map(sel, new_cb, state.quantizer),
                opt_g=jax.tree.map(sel, new_opt_g, state.opt_g),
                opt_d=jax.tree.map(sel, new_opt_d, state.opt_d),
                balancer=jax.tree.map(sel, new_balancer, state.balancer),
                step=state.step + 1)
            metrics['skipped_nonfinite'] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    return step_fn


def _build_accum_step(model: EncodecModel, disc: MultiScaleSTFTDiscriminator,
                      balancer: Balancer, gen_schedule, disc_schedule, opt,
                      disc_prob: float, sample_rate: int, remat: bool,
                      stft_method: str, skip_nonfinite: bool, accum: int):
    """Gradient-accumulation variant of the train step (see
    ``build_train_step`` docstring, ``grad_accum_steps``). One scan
    iteration = the shared-VJP forward/backward of ``build_train_step`` on
    a ``B/accum`` microbatch; the scan carry accumulates generator and
    discriminator gradient sums plus the quantizer/balancer EMA states."""

    def micro_grads(params_g, params_d, cb, bal, mb, rng_bw):
        """One microbatch's balanced generator grads + disc grads.
        Mirrors the shared-VJP blocks of the plain step exactly."""
        def gen_fwd(pg):
            variables = {'params': pg, 'quantizer': cb}
            output, loss_w, new_cb = model.forward_train(variables, mb,
                                                         rng_bw, remat=remat)
            return (output, loss_w), new_cb

        (output, loss_w), gen_vjp, new_cb = jax.vjp(gen_fwd, params_g,
                                                    has_aux=True)
        logits_real, fmap_real = disc.apply({'params': params_d}, mb)

        (logits_fake, fmap_fake), disc_fake_vjp = jax.vjp(
            lambda out: disc.apply({'params': params_d}, out), output)
        wav_vals, wav_vjp = jax.vjp(
            lambda out: wav_losses(mb, out, sample_rate, stft_method), output)
        gan_vals, gan_vjp = jax.vjp(
            lambda lf, ff: gan_losses(fmap_real, lf, ff),
            logits_fake, fmap_fake)
        loss_vals = {**wav_vals, **gan_vals}
        grads_per_loss = {}
        for name in wav_vals:
            cot = {k: jnp.float32(1.0 if k == name else 0.0)
                   for k in wav_vals}
            grads_per_loss[name], = wav_vjp(cot)
        for name in gan_vals:
            cot = {k: jnp.float32(1.0 if k == name else 0.0)
                   for k in gan_vals}
            cot_lf, cot_ff = gan_vjp(cot)
            grads_per_loss[name], = disc_fake_vjp((cot_lf, cot_ff))

        out_grad, new_bal, bal_metrics = balancer(grads_per_loss, bal)
        grads_g, = gen_vjp((out_grad, jnp.float32(1.0)))

        # disc parameter grads (hinge loss is a batch mean, so the average
        # over microbatches IS the full-batch gradient)
        output_sg = jax.lax.stop_gradient(output)
        lr_v, disc_real_pd_vjp = jax.vjp(
            lambda pd: disc.apply({'params': pd}, mb)[0], params_d)
        lf_v, disc_fake_pd_vjp = jax.vjp(
            lambda pd: disc.apply({'params': pd}, output_sg)[0], params_d)
        ld, ld_vjp = jax.vjp(disc_loss, lr_v, lf_v)
        cot_r, cot_f = ld_vjp(jnp.float32(1.0))
        g_real, = disc_real_pd_vjp(cot_r)
        g_fake, = disc_fake_pd_vjp(cot_f)
        grads_d = jax.tree.map(jnp.add, g_real, g_fake)

        mets = {**loss_vals, 'loss_w': loss_w, 'loss_disc': ld,
                **bal_metrics}
        return new_cb, new_bal, grads_g, grads_d, mets

    def step_fn(state: TrainState, batch: jnp.ndarray, rng: jax.Array,
                disc_allowed: jnp.ndarray
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng_bw, rng_coin = jax.random.split(jax.random.fold_in(rng, state.step))
        B = batch.shape[0]
        assert B % accum == 0, (
            f'batch size {B} must divide grad_accum_steps={accum}')
        # interleaved microbatches: micro[a] = batch[a::accum]. Under
        # contiguous data sharding each device keeps (B/n)/accum of its own
        # rows per microbatch — balanced, no resharding collective.
        micro = jnp.moveaxis(
            batch.reshape(B // accum, accum, *batch.shape[1:]), 1, 0)

        # zero accumulators shaped via eval_shape (no unrolled first
        # microbatch — the scan body is the only copy of the graph); the
        # scan holds one microbatch's residuals live at a time
        _, _, g_shape, d_shape, m_shape = jax.eval_shape(
            micro_grads, state.params_g, state.params_d, state.quantizer,
            state.balancer, micro[0], rng_bw)
        zeros = lambda s: jax.tree.map(
            lambda x: jnp.zeros(x.shape, x.dtype), s)

        def body(carry, mb):
            cb, bal, acc_g, acc_d, acc_m = carry
            new_cb, new_bal, g_g, g_d, mets = micro_grads(
                state.params_g, state.params_d, cb, bal, mb, rng_bw)
            return (new_cb, new_bal,
                    jax.tree.map(jnp.add, acc_g, g_g),
                    jax.tree.map(jnp.add, acc_d, g_d),
                    jax.tree.map(jnp.add, acc_m, mets)), None

        (new_cb, new_balancer, acc_g, acc_d, acc_m), _ = jax.lax.scan(
            body, (state.quantizer, state.balancer, zeros(g_shape),
                   zeros(d_shape), zeros(m_shape)), micro)

        inv = jnp.float32(1.0 / accum)
        grads_g = jax.tree.map(lambda g: g * inv, acc_g)
        grads_d = jax.tree.map(lambda g: g * inv, acc_d)
        avg_m = jax.tree.map(lambda v: v * inv, acc_m)

        lr_g = gen_schedule(state.step)
        updates, new_opt_g = opt.update(grads_g, state.opt_g, state.params_g)
        updates = jax.tree.map(lambda u: -lr_g * u, updates)
        new_params_g = optax.apply_updates(state.params_g, updates)

        # disc update: one coin flip per STEP, masked apply (no lax.cond —
        # see build_train_step's disc_cond_update note)
        coin = jax.random.uniform(rng_coin) < disc_prob
        train_disc = jnp.logical_and(jnp.asarray(disc_allowed, bool), coin)
        lr_d = disc_schedule(state.step)
        upd, cand_opt_d = opt.update(grads_d, state.opt_d, state.params_d)
        upd = jax.tree.map(lambda u: -lr_d * u, upd)
        cand_params_d = optax.apply_updates(state.params_d, upd)
        sel = lambda a, b: jnp.where(train_disc, a, b)
        new_params_d = jax.tree.map(sel, cand_params_d, state.params_d)
        new_opt_d = jax.tree.map(sel, cand_opt_d, state.opt_d)
        ld = jnp.where(train_disc, avg_m['loss_disc'], jnp.float32(0.0))

        loss_names = [k for k in avg_m
                      if k in balancer.weights]
        loss_g = sum(balancer.weights[k] * avg_m[k] for k in loss_names)
        metrics = {
            **{k: v for k, v in avg_m.items() if k != 'loss_disc'},
            'loss_g': loss_g,
            'loss_disc': ld,
            'disc_updated': train_disc.astype(jnp.float32),
            'lr_g': lr_g,
            'lr_d': lr_d,
            **_codebook_metrics(
                new_cb, float(model.quantizer.threshold_ema_dead_code)),
        }
        new_state = TrainState(
            params_g=new_params_g, params_d=new_params_d, quantizer=new_cb,
            opt_g=new_opt_g, opt_d=new_opt_d, balancer=new_balancer,
            step=state.step + 1)
        if skip_nonfinite:
            checks = [jnp.isfinite(loss_g), jnp.isfinite(avg_m['loss_w']),
                      jnp.isfinite(ld)]
            checks += [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(
                (new_params_g, new_params_d, new_cb))]
            ok = functools.reduce(jnp.logical_and, checks)
            sel_ok = lambda n, o: jnp.where(ok, n, o)
            new_state = TrainState(
                params_g=jax.tree.map(sel_ok, new_params_g, state.params_g),
                params_d=jax.tree.map(sel_ok, new_params_d, state.params_d),
                quantizer=jax.tree.map(sel_ok, new_cb, state.quantizer),
                opt_g=jax.tree.map(sel_ok, new_opt_g, state.opt_g),
                opt_d=jax.tree.map(sel_ok, new_opt_d, state.opt_d),
                balancer=jax.tree.map(sel_ok, new_balancer, state.balancer),
                step=state.step + 1)
            metrics['skipped_nonfinite'] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    return step_fn


def build_eval_step(model: EncodecModel, disc: MultiScaleSTFTDiscriminator,
                    balancer: Balancer, sample_rate: int,
                    stft_method: str = 'fft'):
    """Eval step mirroring the reference test() (train_multi_gpu.py:144-161):
    eval forward (encode→decode), generator losses + disc loss, no updates."""

    def eval_fn(state: TrainState, batch: jnp.ndarray):
        variables = {'params': state.params_g, 'quantizer': state.quantizer}
        frames = model.encode(variables, batch)
        output = model.decode(variables, frames)[:, :, :batch.shape[-1]]
        logits_real, fmap_real = disc.apply({'params': state.params_d}, batch)
        logits_fake, fmap_fake = disc.apply({'params': state.params_d}, output)
        losses_g = total_loss(fmap_real, logits_fake, fmap_fake, batch, output,
                              sample_rate=sample_rate,
                              stft_method=stft_method)
        ld = disc_loss(logits_real, logits_fake)
        return {**losses_g, 'loss_disc': ld}

    return eval_fn
