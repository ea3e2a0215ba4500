"""Benchmark the production GAN train step on the current jax device.

Mirrors the trainer's jit/donation setup exactly (train/trainer.py:174-188)
at the shipped production config (configs/config.yaml: batch 12, tensor_cut
72000, full SEANet widths, n_q=32 masked scan, 3-scale disc). Knobs expose
the balancer-VJP strategy and rematerialisation so their cost can be
measured head-to-head (VERDICT round-1 weak #4 / ROADMAP item 3).

Usage:
    python scripts/bench_train_step.py --steps 8 --chunk 1
    python scripts/bench_train_step.py --chunk 4 --remat
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=12)
    p.add_argument('--cut', type=int, default=72000)
    p.add_argument('--steps', type=int, default=8, help='timed steps')
    p.add_argument('--warmup', type=int, default=3)
    p.add_argument('--chunk', type=int, default=1,
                   help='balancer_vjp_chunk (1=sequential, 4=one batched VJP)')
    p.add_argument('--remat', action='store_true')
    p.add_argument('--dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--disc_prob', type=float, default=1.0,
                   help='1.0 keeps the disc branch always taken (worst case)')
    p.add_argument('--no_shared_vjp', action='store_true',
                   help='use the monolithic losses VJP instead of the '
                        'path-split shared-disc-forward VJPs')
    p.add_argument('--fpack', type=int, default=4,
                   help='disc F-phase output packing (0 disables)')
    p.add_argument('--disc_mask', action='store_true',
                   help='masked (unconditional-compute) disc update instead '
                        'of the lax.cond-gated one')
    p.add_argument('--no_fpack_dx', action='store_true',
                   help='disable the custom phase-packed disc input-gradient '
                        '(falls back to XLA autodiff of the packed conv)')
    p.add_argument('--accum', type=int, default=1,
                   help='tpu.grad_accum_steps: >1 scans microbatches and '
                        'applies one update (forces --disc_mask semantics)')
    p.add_argument('--profile_dir', default='')
    args = p.parse_args()

    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding, shard_batch)
    from encodec_pytorch_tpu.train.balancer import Balancer
    from encodec_pytorch_tpu.train.schedule import warmup_cosine_schedule
    from encodec_pytorch_tpu.train.step import (build_train_step,
                                                init_train_state)

    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=True, segment=None,
        name='my_encodec', dtype=dtype)
    disc = MultiScaleSTFTDiscriminator(
        filters=32, n_ffts=(1024, 2048, 512), hop_lengths=(256, 512, 128),
        win_lengths=(1024, 2048, 512), dtype=dtype, fpack=args.fpack,
        fpack_dx=not args.no_fpack_dx)
    balancer = Balancer({'l_t': 0.1, 'l_f': 1, 'l_g': 3, 'l_feat': 3})
    sched = warmup_cosine_schedule(3e-4, max_iter=100_000, eta_ratio=0.1,
                                   warmup_iter=5000, warmup_ratio=1e-4)
    step_fn = build_train_step(model, disc, balancer, sched, sched,
                               disc_prob=args.disc_prob, sample_rate=24_000,
                               remat=args.remat,
                               balancer_vjp_chunk=args.chunk,
                               shared_disc_vjp=not args.no_shared_vjp,
                               disc_cond_update=not args.disc_mask,
                               grad_accum_steps=args.accum)

    mesh = create_mesh(0)
    repl = replicated_sharding(mesh)
    jitted = jax.jit(step_fn,
                     in_shardings=(repl, batch_sharding(mesh), repl, repl),
                     out_shardings=(repl, repl),
                     donate_argnums=(0,))

    state = init_train_state(model, disc, balancer, jax.random.PRNGKey(0),
                             example_length=args.cut)
    state = jax.device_put(state, repl)
    batch = shard_batch(mesh, np.random.RandomState(0).randn(
        args.batch, 1, args.cut).astype(np.float32) * 0.1)
    rng = jax.device_put(jax.random.PRNGKey(1), repl)
    allowed = jax.device_put(jnp.asarray(True), repl)

    # NB: on the axon relay backend block_until_ready can return before the
    # device work drains — a concrete value fetch is the only reliable sync
    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, metrics = jitted(state, batch, rng, allowed)
    _ = float(metrics['loss_g'])
    print(f'compile+warmup ({args.warmup} steps): '
          f'{time.perf_counter() - t0:.1f}s', flush=True)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = jitted(state, batch, rng, allowed)
    _ = float(metrics['loss_g'])
    dt = (time.perf_counter() - t0) / args.steps
    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f'trace written to {args.profile_dir}')

    audio_s = args.batch * args.cut / 24_000
    print(f'config: batch={args.batch} cut={args.cut} chunk={args.chunk} '
          f'remat={args.remat} dtype={args.dtype} fpack={args.fpack} '
          f'fpack_dx={not args.no_fpack_dx} disc_mask={args.disc_mask} '
          f'accum={args.accum}')
    print(f'step time: {dt * 1e3:.1f} ms  '
          f'({audio_s / dt:.1f} audio-seconds/s per chip)')
    print(f'loss_g={float(metrics["loss_g"]):.4f} '
          f'loss_w={float(metrics["loss_w"]):.5f}')
    try:
        cost = jitted.lower(state, batch, rng, allowed).compile().cost_analysis()
        flops = float(cost.get('flops', 0.0))
        if flops:
            # v5e bf16 peak ≈ 197 TFLOP/s; XLA counts f32 matmul flops the same
            mfu = flops / dt / 197e12
            print(f'XLA-counted {flops / 1e12:.2f} TFLOP/step — '
                  f'{flops / dt / 1e12:.1f} TFLOP/s ≈ {mfu * 100:.1f}% MFU')
    except Exception as exc:  # cost analysis is best-effort on some backends
        print(f'cost_analysis unavailable: {exc}')


if __name__ == '__main__':
    main()
