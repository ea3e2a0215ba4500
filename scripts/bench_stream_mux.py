#!/usr/bin/env python
"""StreamingServer multiplexer throughput: per-tick cost of the masked
batched chunk step at S slots vs S independent single-stream fused steps.

Batch-1 streaming is weight-read-bound, so the mux step's cost should
grow far slower than linearly in S — the aggregate audio throughput
(S × chunk / tick) is the serving capacity of one chip.

Usage: python scripts/bench_stream_mux.py [--streams 2 4 8 16] [--hops 1 4]
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
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--streams', type=int, nargs='+', default=[2, 4, 8, 16])
    p.add_argument('--hops', type=int, nargs='+', default=[1, 4])
    p.add_argument('--chunks', type=int, default=64)
    p.add_argument('--bandwidth', type=float, default=6.0)
    args = p.parse_args()

    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.serve import StreamingServer

    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    model = EncodecModel._get_model(
        [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=False,
        name='encodec_24khz', dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), example_length=24_000)
    variables['quantizer'] = variables['quantizer']._replace(
        inited=jnp.ones_like(variables['quantizer'].inited),
        embed=jax.random.normal(jax.random.PRNGKey(1),
                                variables['quantizer'].embed.shape))
    model.set_target_bandwidth(args.bandwidth)

    print(f'# {args.dtype}, bw {args.bandwidth}; {args.chunks} ticks per '
          f'measurement; all slots active', flush=True)
    print('# block = host blocks per tick (includes the dev relay RTT); '
          'dev = scan-chained pure device tick', flush=True)
    print('| streams | chunk | tick (block) | tick (dev) | '
          'dev per-stream RTF | dev aggregate audio-s/s |')
    print('|---|---|---|---|---|---|')

    rng = np.random.RandomState(3)
    for hops in args.hops:
        for s in args.streams:
            server = StreamingServer(model, variables, max_streams=s,
                                     chunk_hops=hops)
            n = server.chunk_samples
            xs = jnp.asarray(
                rng.randn(s, n, 1).astype(np.float32) * 0.1)  # time-major
            mask = jnp.ones((s,), bool)
            enc, dec = server._enc_state, server._dec_state
            # prime (compile) once, then measure blocking ticks
            wav, enc, dec = server._mux(variables['params'],
                                        variables['quantizer'], enc, dec,
                                        xs, mask, server.n_q)
            np.asarray(wav)
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                wav, enc, dec = server._mux(variables['params'],
                                            variables['quantizer'], enc, dec,
                                            xs, mask, server.n_q)
                np.asarray(wav)
            tick = (time.perf_counter() - t0) / args.chunks

            # pure device tick: scan-chain the raw mux step — each tick's
            # input is the previous tick's (masked) output so nothing can
            # be elided; two-point calibration removes the fixed relay
            # fetch (same method as bench_streaming.py)
            params, qstate = variables['params'], variables['quantizer']
            n_q, mux_fn = server.n_q, server._mux_fn

            def body(carry, _, _mux=mux_fn, _m=mask, _nq=n_q):
                enc_s, dec_s, x = carry
                wav, enc_s, dec_s = _mux(params, qstate, enc_s, dec_s, x,
                                         _m, _nq)
                # mux returns [S, C, T]; the step consumes time-major
                return (enc_s, dec_s, jnp.swapaxes(wav, 1, 2) * 0.1), None

            def chained(iters, _body=body):
                @jax.jit
                def run(enc_s, dec_s, x):
                    (enc_s, dec_s, x), _ = jax.lax.scan(
                        _body, (enc_s, dec_s, x), None, length=iters)
                    return jnp.sum(x.astype(jnp.float32))

                e, d = server.codec.init_state(server.max_streams)
                float(run(e, d, xs))
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(run(e, d, xs))
                    ts.append(time.perf_counter() - t0)
                return sorted(ts)[2]

            t_lo, t_hi = chained(16), chained(1024)
            t_dev = (t_hi - t_lo) / (1024 - 16)

            rtf_dev = (n / 24_000) / t_dev
            agg_dev = s * n / 24_000 / t_dev
            ms = 1e3
            print(f'| {s} | {hops} hop ({n}) | {tick * ms:.3f} ms | '
                  f'{t_dev * ms:.3f} ms | {rtf_dev:.0f}x | {agg_dev:.0f} |',
                  flush=True)


if __name__ == '__main__':
    main()
