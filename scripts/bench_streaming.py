#!/usr/bin/env python
"""Streaming chunk-latency benchmark: 2-call (encode_chunk + decode_chunk)
vs the fused single-program roundtrip_chunk (VERDICT r2 item 7).

Two measurements per configuration:
- blocking: host blocks on every chunk (true serving latency); the dev
  environment's host<->TPU relay adds a fixed round-trip floor which is
  measured separately and reported alongside.
- pipelined: N chunks dispatched back-to-back with one final fetch —
  amortizes the relay, isolating per-chunk device+dispatch cost.

Usage: python scripts/bench_streaming.py [--dtype bfloat16] [--hops 1 2 4 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def measure_rtt(n=20):
    x = jnp.zeros((), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    float(f(x))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--hops', type=int, nargs='+', default=[1, 2, 4, 8])
    p.add_argument('--chunks', type=int, default=64, help='measured chunks')
    p.add_argument('--bandwidth', type=float, default=6.0)
    p.add_argument('--weights', default='raw',
                   choices=['raw', 'fold', 'int8'],
                   help='serving prep (prepare.py); int8 keeps the weights '
                        'int8 in HBM and dequantizes in-program per chunk')
    args = p.parse_args()

    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.streaming import StreamingCodec

    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=False, name='encodec_24khz',
        dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), example_length=24_000)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(args.bandwidth)
    if args.weights != 'raw':
        from encodec_pytorch_tpu.prepare import prepare_for_inference
        model, variables = prepare_for_inference(model, variables,
                                                 weights=args.weights)

    rtt = measure_rtt()
    print(f'# relay round-trip floor: {rtt * 1e3:.2f} ms', flush=True)
    print(f'# {args.dtype}, bw {args.bandwidth}, B=1; '
          f'{args.chunks} steady-state chunks per measurement')
    print('| chunk | audio/chunk | 2-call block | fused block | '
          '2-call pipe | fused pipe |')
    print('|---|---|---|---|---|---|')

    rng = np.random.RandomState(2)
    for hops in args.hops:
        codec = StreamingCodec(model)
        n = codec.hop * hops
        first_len = max(codec.min_first_chunk_samples, n)
        first_chunk = jnp.asarray(rng.randn(1, 1, first_len).astype(np.float32) * 0.1)
        chunk = jnp.asarray(rng.randn(1, 1, n).astype(np.float32) * 0.1)

        def prime_two_call():
            enc, dec = codec.init_state(1)
            codes, enc = codec.encode_chunk(variables, enc, first_chunk,
                                            first=True)
            out, dec = codec.decode_chunk(variables, dec, codes, first=True)
            # compile the steady-state programs too
            codes, enc = codec.encode_chunk(variables, enc, chunk)
            out, dec = codec.decode_chunk(variables, dec, codes)
            np.asarray(out)
            return enc, dec

        def prime_fused():
            enc, dec = codec.init_state(1)
            out, codes, enc, dec = codec.roundtrip_chunk(
                variables, enc, dec, first_chunk, first=True)
            out, codes, enc, dec = codec.roundtrip_chunk(
                variables, enc, dec, chunk)
            np.asarray(out)
            return enc, dec

        # --- blocking latency
        enc, dec = prime_two_call()
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            codes, enc = codec.encode_chunk(variables, enc, chunk)
            out, dec = codec.decode_chunk(variables, dec, codes)
            np.asarray(out)
        t2_block = (time.perf_counter() - t0) / args.chunks

        enc, dec = prime_fused()
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            out, codes, enc, dec = codec.roundtrip_chunk(variables, enc, dec,
                                                         chunk)
            np.asarray(out)
        tf_block = (time.perf_counter() - t0) / args.chunks

        # --- pipelined (no per-chunk fetch)
        enc, dec = prime_two_call()
        t0 = time.perf_counter()
        outs = []
        for _ in range(args.chunks):
            codes, enc = codec.encode_chunk(variables, enc, chunk)
            out, dec = codec.decode_chunk(variables, dec, codes)
            outs.append(out)
        np.asarray(jnp.concatenate(outs, axis=-1))
        t2_pipe = (time.perf_counter() - t0) / args.chunks

        enc, dec = prime_fused()
        t0 = time.perf_counter()
        outs = []
        for _ in range(args.chunks):
            out, codes, enc, dec = codec.roundtrip_chunk(variables, enc, dec,
                                                         chunk)
            outs.append(out)
        np.asarray(jnp.concatenate(outs, axis=-1))
        tf_pipe = (time.perf_counter() - t0) / args.chunks

        # --- pure device time: scan-chain the fused body (each chunk's input
        # is the previous chunk's output, so nothing can be elided), two-point
        # calibrated to remove the fixed relay fetch
        from encodec_pytorch_tpu.prepare import dequantize_weights
        from encodec_pytorch_tpu.quantization.core_vq import rvq_decode
        n_q = model.quantizer.num_quantizers_for_bandwidth(
            model.frame_rate, model.bandwidth)
        qparams = variables['params']
        qstate = variables['quantizer']

        def body(carry, _):
            enc_s, dec_s, x = carry
            # in-program dequant per chunk, mirroring the fused chunk
            # programs (streaming.py) — a no-op walk on plain params
            params = dequantize_weights(qparams)
            emb, enc_s = codec.encoder.apply(params['encoder'], enc_s, x,
                                             first=False)
            codes = model._rvq_encode_impl(qstate, emb, n_q)
            deq = rvq_decode(qstate, codes)
            y, dec_s = codec.decoder.apply(params['decoder'], dec_s, deq,
                                           first=False)
            return (enc_s, dec_s, y * 0.1), None

        def chained(iters):
            @jax.jit
            def run(enc_s, dec_s, x):
                (enc_s, dec_s, x), _ = jax.lax.scan(
                    body, (enc_s, dec_s, x), None, length=iters)
                return jnp.sum(x.astype(jnp.float32))

            enc, dec = prime_two_call()
            x = jnp.swapaxes(chunk, 1, 2)
            float(run(enc, dec, x))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(run(enc, dec, x))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[2]

        # wide two-point spread: per-chunk device time is ~0.1-0.3 ms, so the
        # iteration delta must dwarf the relay's ~5 ms run-to-run jitter
        t_lo, t_hi = chained(16), chained(1024)
        t_dev = (t_hi - t_lo) / (1024 - 16)

        ms = 1e3
        print(f'| {hops} hop ({n}) | {n / 24000 * ms:.1f} ms | '
              f'{t2_block * ms:.3f} ms | {tf_block * ms:.3f} ms | '
              f'{t2_pipe * ms:.3f} ms | {tf_pipe * ms:.3f} ms | '
              f'{t_dev * ms:.3f} ms dev |', flush=True)


if __name__ == '__main__':
    main()
