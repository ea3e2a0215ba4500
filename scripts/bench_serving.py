"""Batched serving throughput: codec round-trip RTF vs batch size.

Same chained-`lax.scan` harness as bench.py (the host↔device relay
round-trip would otherwise swamp the numbers); reports aggregate RTF per
chip at each batch size.

Usage: python scripts/bench_serving.py [--batches 1 4 16] [--seconds 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

ITERS = 8


def measure_dispatch_overhead() -> float:
    f = jax.jit(lambda x: jnp.sum(x) * 2)
    x = jnp.ones((8, 128))
    float(f(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batches', type=int, nargs='+', default=[1, 4, 16])
    p.add_argument('--seconds', type=int, default=30)
    p.add_argument('--dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--model', default='24k', choices=['24k', '48k'],
                   help='flagship causal 24 kHz mono, or the segmented '
                        'normalized stereo 48 kHz flavor (model.py:311-329)')
    p.add_argument('--weights', default='raw',
                   choices=['raw', 'fold', 'int8'],
                   help='serving prep (prepare.py): fold weight norm, or '
                        'fold + int8 weight-only quantization')
    p.add_argument('--segmajor', default='auto',
                   choices=['auto', 'on', 'off'],
                   help='segment-major batching for segmented models '
                        '(deploy._roundtrip_fn; auto = on for segmented '
                        'models, the serving default). off = the per-frame '
                        'reference-shaped loop, for A/B measurement')
    args = p.parse_args()

    from encodec_pytorch_tpu.models.model import EncodecModel

    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    if args.model == '24k':
        model = EncodecModel._get_model(
            [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
            model_norm='weight_norm', audio_normalize=False, segment=None,
            name='encodec_24khz', dtype=dtype)
    else:
        # released 48 kHz flavor: stereo, non-causal time_group_norm,
        # per-segment normalization scales, 1 s segments (model.py:311-329);
        # the segment loop unrolls under jit, so each clip second adds one
        # encode+decode segment to the program
        model = EncodecModel._get_model(
            [3., 6., 12., 24.], 48_000, 2, causal=False,
            model_norm='time_group_norm', audio_normalize=True, segment=1.,
            name='encodec_48khz', dtype=dtype)
    model.set_target_bandwidth(6.)
    T = model.sample_rate * args.seconds
    variables = model.init(jax.random.PRNGKey(0),
                           example_length=model.sample_rate)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))

    if args.weights != 'raw':
        from encodec_pytorch_tpu.prepare import (dequantize_weights,
                                                 prepare_for_inference)
        model, variables = prepare_for_inference(model, variables,
                                                 weights=args.weights)

    from encodec_pytorch_tpu.deploy import _roundtrip_fn
    segmajor = {'auto': None, 'on': True, 'off': False}[args.segmajor]

    overhead = measure_dispatch_overhead()
    print(f'dispatch overhead: {overhead * 1e3:.1f} ms')
    for b in args.batches:
        if args.weights == 'int8':
            dt_w = (jnp.bfloat16 if args.dtype == 'bfloat16'
                    else jnp.float32)

            def body(x, _, _m=model, _v=variables):
                vars_ = dict(_v, params=dequantize_weights(_v['params'],
                                                           dt_w))
                return _roundtrip_fn(_m, vars_, segmajor=segmajor)(x), None
        else:
            def body(x, _, _m=model, _v=variables):
                return _roundtrip_fn(_m, _v, segmajor=segmajor)(x), None

        @jax.jit
        def chained(x):
            y, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(y)

        x = jax.random.normal(jax.random.PRNGKey(2),
                              (b, model.channels, T)) * 0.1
        float(chained(x))  # compile
        t0 = time.perf_counter()
        float(chained(x))
        dt = max(time.perf_counter() - t0 - overhead, 1e-9) / ITERS
        agg = b * args.seconds / dt
        print(f'batch {b:3d}: {dt * 1e3:7.1f} ms per round-trip '
              f'({args.seconds}s clips) — aggregate {agg:8.1f}x realtime/chip',
              flush=True)


if __name__ == '__main__':
    main()
