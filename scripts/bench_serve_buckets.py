#!/usr/bin/env python
"""Mixed-length serving throughput: CodecServer with vs without length
bucketing (VERDICT r3 item 4's measured table).

Realistic traffic has mixed clip lengths; the exact-shape batch key never
coalesces it, so the micro-batcher degenerates to serial dispatch. With
``length_buckets`` the same traffic pads to a bounded set of lengths and
batches. This bench fires N concurrent roundtrip requests with lengths
drawn uniformly from a range and reports wall time, aggregate audio-s/s,
and the realized mean batch size for both configurations.

    python scripts/bench_serve_buckets.py [--requests 64] [--threads 16]
"""

import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def drive(server, clips, threads):
    results = [None] * len(clips)
    errors = []
    idx = iter(range(len(clips)))
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                i = next(idx, None)
            if i is None:
                return
            try:
                results[i] = server.roundtrip(clips[i], timeout=600)
            except Exception as e:  # noqa: BLE001
                errors.append((i, e))

    ts = [threading.Thread(target=worker) for _ in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    assert not errors, errors[:2]
    return dt, results


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--requests', type=int, default=64)
    p.add_argument('--threads', type=int, default=16)
    p.add_argument('--min-seconds', type=float, default=5.0)
    p.add_argument('--max-seconds', type=float, default=30.0)
    p.add_argument('--max-batch', type=int, default=16)
    p.add_argument('--max-wait-ms', type=float, default=20.0)
    p.add_argument('--n-buckets', type=int, default=6,
                   help='number of evenly spaced length buckets')
    p.add_argument('--distinct-lengths', type=int, default=6,
                   help='draw request lengths from this many distinct '
                        'values (bounds the exact-shape leg compile set)')
    args = p.parse_args()

    from encodec_pytorch_tpu.models.model import EncodecModel
    from encodec_pytorch_tpu.serve import CodecServer, LiveCodec

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
    model.set_target_bandwidth(6.0)
    codec = LiveCodec(model, variables)

    rng = np.random.RandomState(0)
    pool = np.unique(rng.randint(int(args.min_seconds * 24_000),
                                 int(args.max_seconds * 24_000) + 1,
                                 size=args.distinct_lengths))
    lengths = pool[rng.randint(len(pool), size=args.requests)]
    clips = [np.asarray(
        jax.random.normal(jax.random.PRNGKey(100 + i), (1, int(t)))) * 0.1
        for i, t in enumerate(lengths)]
    total_audio_s = float(lengths.sum()) / 24_000
    # evenly spaced buckets spanning the traffic range
    edges = np.linspace(args.min_seconds, args.max_seconds, args.n_buckets)
    buckets = [int(s * 24_000) for s in edges]

    print(f'# {args.requests} requests, {args.threads} threads, lengths '
          f'{args.min_seconds:g}-{args.max_seconds:g}s '
          f'({total_audio_s:.0f} audio-s total), {args.dtype}', flush=True)
    print('| config | wall | audio-s/s | mean batch | batches |')
    print('|---|---|---|---|---|')
    for label, lb in (('exact-shape key (old)', None),
                      (f'length buckets {args.min_seconds:g}..'
                       f'{args.max_seconds:g} s', buckets)):
        # deterministically pre-warm EVERY (length, batch-bucket) program
        # the measure phase could possibly dispatch — concurrent warmup
        # traffic covers only the batch compositions it happens to form,
        # and a single cold compile (~1-2 min via the remote service)
        # would swamp the measurement
        warm_lengths = sorted(set(lb)) if lb else sorted(set(pool.tolist()))
        bbuckets = [b for b in (1, 2, 4, 8, 16, 32) if b <= args.max_batch]
        for L in warm_lengths:
            for bb in bbuckets:
                codec.roundtrip(np.zeros((bb, 1, int(L)), np.float32))
        server = CodecServer(codec, max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms,
                             length_buckets=lb).start()
        try:
            dt, _ = drive(server, clips, args.threads)
            s = server.stats()
        finally:
            server.stop()
        batches = s['batches']
        mean_b = s['mean_batch']
        print(f'| {label} | {dt:.2f} s | {total_audio_s / dt:.0f} | '
              f'{mean_b:.2f} | {batches} |', flush=True)


if __name__ == '__main__':
    main()
