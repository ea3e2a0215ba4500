#!/usr/bin/env python
"""LM entropy-coding benchmark (VERDICT r2 item 3): compress/decompress
real-time factors with and without the entropy LM, and the teacher-forced
pipelined encoder path vs the old per-step blocking path.

Reference context: compress.py:42-43 calls its LM path "5x slower" than
packed coding; its loop blocks on a Python-level LM step per timestep
(compress.py:75-92).

    python scripts/bench_lm_coding.py [--seconds 10] [--runs 3]
"""

import argparse
import io
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--seconds', type=float, default=10.0)
    p.add_argument('--runs', type=int, default=3)
    p.add_argument('--bandwidth', type=float, default=6.0)
    p.add_argument('--skip-slow-baseline', action='store_true',
                   help='skip the old per-step blocking encoder measurement')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from encodec_pytorch_tpu import compress as C
    from encodec_pytorch_tpu.models.lm import LMModel
    from encodec_pytorch_tpu.models.model import EncodecModel

    print(f'# devices: {jax.devices()}', flush=True)

    # flagship 24 kHz codec + released-architecture LM (model.py:221-240:
    # 5 layers, dim 200, past_context 3.5 s * 75 Hz)
    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=False, name='encodec_24khz')
    variables = model.init(jax.random.PRNGKey(0), example_length=24_000)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(args.bandwidth)
    lm_def = LMModel(n_q=model.quantizer.n_q, card=model.quantizer.bins,
                     num_layers=5, dim=200,
                     past_context=int(3.5 * model.frame_rate))
    lm = C.LM(lm_def, lm_def.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8, 1), jnp.int32))['params'])

    T = int(args.seconds * model.sample_rate)
    rng = np.random.RandomState(3)
    t = np.arange(T) / model.sample_rate
    wav = (0.5 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.05 * rng.randn(T)).astype(np.float32)[None]

    def timed(fn, warmup=1, tag=''):
        # stage-progress prints: compiles through the remote service can
        # take many minutes, so make each stage's completion visible
        if tag:
            print(f'# [{time.strftime("%H:%M:%S")}] warming: {tag}',
                  flush=True)
        for _ in range(warmup):
            out = fn()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            out = fn()
            times.append(time.perf_counter() - t0)
        if tag:
            print(f'# [{time.strftime("%H:%M:%S")}] {tag}: '
                  f'{min(times):.3f} s', flush=True)
        return min(times), out

    results = {}
    t_packed, data_packed = timed(lambda: C.compress(model, variables, wav),
                                  tag='compress packed')
    results['compress packed'] = (t_packed, len(data_packed))
    t_lm, data_lm = timed(
        lambda: C.compress(model, variables, wav, use_lm=True, lm=lm),
        tag='compress LM pipelined')
    results['compress LM (pipelined)'] = (t_lm, len(data_lm))
    t_lmf, data_lmf = timed(lambda: C.compress(
        model, variables, wav, use_lm=True, lm=lm, lm_fused=True),
        tag='compress LM fused')
    results['compress LM (fused on-device)'] = (t_lmf, len(data_lmf))
    if not args.skip_slow_baseline:
        t_lm_old, data_old = timed(lambda: C.compress(
            model, variables, wav, use_lm=True, lm=lm, lm_device_scan=False),
            warmup=0)
        assert data_old == data_lm, 'paths diverged!'
        results['compress LM (per-step, old)'] = (t_lm_old, len(data_old))

    t_dp, out_p = timed(lambda: C.decompress(model, variables, data_packed),
                        tag='decompress packed')
    results['decompress packed'] = (t_dp, None)
    t_dl, out_l = timed(lambda: C.decompress(model, variables, data_lm, lm=lm),
                        tag='decompress LM per-step')
    results['decompress LM'] = (t_dl, None)
    np.testing.assert_allclose(out_p[0], out_l[0], atol=1e-6)
    t_dlf, out_lf = timed(
        lambda: C.decompress(model, variables, data_lmf, lm=lm),
        tag='decompress LM fused')
    results['decompress LM (fused on-device)'] = (t_dlf, None)
    np.testing.assert_array_equal(np.asarray(out_p[0]), np.asarray(out_lf[0]))

    # reference-interop scenario (VERDICT r3 item 3): a stream carrying
    # torch-evaluated LM probabilities, decoded host-side with the bit-exact
    # TorchReplayLM (models/lm_replay.py) — no per-symbol device round-trip
    from encodec_pytorch_tpu.export import lm_state_dict
    from encodec_pytorch_tpu.models.lm_replay import TorchReplayLM
    replay_sd = lm_state_dict(jax.device_get(lm.params))
    # flax only materializes the emb/linear heads the init input exercised
    # (K at bw 6 here, not lm_def.n_q) — size the replay to what exists
    n_heads = sum(1 for k in replay_sd if k.startswith('emb.'))
    replay = TorchReplayLM(replay_sd, n_q=n_heads, card=lm_def.card,
                           dim=lm_def.dim, num_layers=lm_def.num_layers,
                           past_context=lm_def.past_context)
    t_cr, data_replay = timed(lambda: C.compress(
        model, variables, wav, use_lm=True, lm=replay), warmup=0,
        tag='compress LM torch-replay')
    results['compress LM (torch replay, ref-interop)'] = (t_cr,
                                                          len(data_replay))
    t_dr, out_r = timed(lambda: C.decompress(
        model, variables, data_replay, lm=replay), warmup=0,
        tag='decompress LM torch-replay')
    results['decompress LM (torch replay, ref-interop)'] = (t_dr, None)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_r[0]),
                               atol=1e-6)

    dur = args.seconds
    K = model.quantizer.num_quantizers_for_bandwidth(model.frame_rate,
                                                     args.bandwidth)
    from encodec_pytorch_tpu.bitstream import native
    print(f'\n# {dur:.0f} s of 24 kHz audio, bw {args.bandwidth} (K={K}), '
          f'native coder: {native.available()}')
    print(f'| path | time | RTF | kbps |')
    print(f'|---|---|---|---|')
    for name, (tt, nbytes) in results.items():
        kbps = f'{8 * nbytes / 1000 / dur:.2f}' if nbytes else '—'
        print(f'| {name} | {tt:.3f} s | {dur / tt:.1f}x | {kbps} |')
    if not args.skip_slow_baseline:
        speed = results['compress LM (per-step, old)'][0] / results['compress LM (pipelined)'][0]
        print(f'\npipelined vs per-step encoder speedup: {speed:.1f}x')
    gain = 1 - results['compress LM (pipelined)'][1] / results['compress packed'][1]
    print(f'LM size reduction vs packed: {100 * gain:.1f}% '
          f'(reference claims 20-30%, compress.py:42-43)')


if __name__ == '__main__':
    main()
