#!/usr/bin/env python
"""Measure the per-hop layout-copy cost of chained disc convs — the number
the fused-multi-layer-kernel decision (VERDICT r3 item 2) turns on.

The round-3 trace attributes ~85-100 ms of the production train step to
layout-conversion copies at conv→conv boundaries (XLA:TPU's conv emitter
consumes C-minor, produces H-minor — docs/PERF_NOTES.md "The remaining
~85 ms of copies"). A fused multi-layer Pallas kernel would remove those
hops but, per the round-3 v2 kernel measurement, pays ~+1.8 ms/layer over
XLA's conv under the kernel's own best-case cost model. This script
measures the other side of that ledger directly: chains of L production
mid-convs (LeakyReLU between, like the real stack) vs L× the isolated
layer — the marginal cost of a layer INSIDE a chain minus the layer alone
is the per-hop boundary overhead the fused kernel could reclaim.

    python scripts/bench_conv_hop_cost.py [--dtype bfloat16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, T, F0, C = 12, 281, 513, 32
KT, KF = 3, 9
DILS = (1, 2, 4, 1)      # chain mirrors the disc's dilated mid-stack


def timed_slope(label, fn, *args, iters=(4, 16)):
    totals = []
    for n in iters:
        @jax.jit
        def chained(*a, _n=n):
            def body(c, _):
                acc, rest = c[0], c[1:]
                y = fn(*rest, acc)
                return (y, *rest), None
            (acc, *_), _ = jax.lax.scan(body, (jnp.float32(0.0), *a), None,
                                        length=_n)
            return acc
        float(chained(*args))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    dt = (totals[1] - totals[0]) / (iters[1] - iters[0]) * 1e3
    print(f'{label:<40s} {dt:8.3f} ms', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--phases', type=int, default=4)
    args = p.parse_args()
    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]

    from encodec_pytorch_tpu.ops.conv2d_pack import conv2d_fpack

    print(f'# devices: {jax.devices()}')
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, T, F0, C) * 0.1, dtype)
    kernels = [jnp.asarray(rng.randn(KT, KF, C, C) * 0.05, dtype)
               for _ in DILS]

    def layer(x, k, dil):
        y = conv2d_fpack(x, k, (1, 2), (dil, 1), (dil, KF // 2),
                         phases=args.phases, preferred_element_type=None)
        return jax.nn.leaky_relu(y, 0.2)

    def chain(depth):
        def f(x, acc):
            h = x + acc.astype(x.dtype)
            for i in range(depth):
                h = layer(h, kernels[i], DILS[i])
            return jnp.sum(h.astype(jnp.float32))
        return f

    def chain_grad(depth):
        def f(x, acc):
            h0 = x + acc.astype(x.dtype)

            def loss(z):
                return jnp.sum(_stack(z, depth).astype(jnp.float32))

            val, vjp = jax.vjp(loss, h0)
            (dx,) = vjp(1.0)
            return val + jnp.sum(dx.astype(jnp.float32))
        return f

    def _stack(z, depth):
        h = z
        for i in range(depth):
            h = layer(h, kernels[i], DILS[i])
        return h

    print('\n## forward chains (conv+leaky_relu per layer)')
    fwd = {}
    for L in (1, 2, 3, 4):
        fwd[L] = timed_slope(f'fwd chain L={L}', chain(L), x0)
    print('\n## forward+input-gradient chains')
    bwd = {}
    for L in (1, 2, 3, 4):
        bwd[L] = timed_slope(f'fwd+dx chain L={L}', chain_grad(L), x0)

    # isolated per-layer costs at each depth's input shape, for marginals
    print('\n## isolated layers (at the chain-internal input shapes)')
    iso = {}
    shape = x0.shape
    for i in range(4):
        xi = jnp.asarray(rng.randn(*shape) * 0.1, dtype)
        iso[i] = timed_slope(
            f'isolated layer {i} (dil {DILS[i]}, F={shape[2]})',
            lambda x, acc, _i=i: jnp.sum(
                layer(x + acc.astype(x.dtype), kernels[_i],
                      DILS[_i]).astype(jnp.float32)), xi)
        shape = jax.eval_shape(
            lambda z, _i=i: layer(z, kernels[_i], DILS[_i]),
            jax.ShapeDtypeStruct(shape, dtype)).shape

    print('\n## summary')
    for L in (2, 3, 4):
        marginal = fwd[L] - fwd[L - 1]
        print(f'fwd marginal layer {L}: {marginal:.3f} ms vs isolated '
              f'{iso[L - 1]:.3f} ms → per-hop overhead '
              f'{marginal - iso[L - 1]:+.3f} ms')
    sum_iso = sum(iso[i] for i in range(4))
    print(f'fwd chain L=4 {fwd[4]:.3f} ms vs Σ isolated {sum_iso:.3f} ms '
          f'→ total boundary overhead {fwd[4] - sum_iso:+.3f} ms '
          f'({(fwd[4] - sum_iso) / 3:.3f} ms/hop over 3 hops)')
    print(f'bwd: fwd+dx L=4 {bwd[4]:.3f} ms vs fwd {fwd[4]:.3f} ms')


if __name__ == '__main__':
    main()
