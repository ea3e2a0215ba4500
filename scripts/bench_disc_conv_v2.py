#!/usr/bin/env python
"""Bench the pipelined fpack-im2col disc conv kernel (v2) vs the shipped
lowerings, at the production mid-conv shape.

Rows:
  nhwc        plain XLA conv (round-2 baseline)
  fpack4      F-phase output packing, pure XLA (shipped default)
  v2 kernel   pallas_conv2d_v2, kernel only (phase-split input + packed
              weights prepared OUTSIDE the loop — the chained-stack cost
              model, where the layout lives across layers)
  v2 e2e      conv2d_v2 end to end (entry split + kernel + exit unscramble
              — the drop-in single-layer cost)

Timing uses the scan-chained harness from docs/PERF_NOTES.md (two-point
calibration removes the relay constant).

    python scripts/bench_disc_conv_v2.py [--dtype bfloat16] [--dil 1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, T, F, C = 12, 281, 513, 32
KT, KF = 3, 9
ST, SF = 1, 2


def timed_slope(label, fn, *args, iters=(4, 16)):
    """Scan-chain fn iters times; report the per-iter slope between the two
    iteration counts (cancels dispatch/fetch constants)."""
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

        float(chained(*args))  # compile+warm
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    dt = (totals[1] - totals[0]) / (iters[1] - iters[0]) * 1e3
    print(f'{label:<46s} {dt:8.3f} ms', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--dil', type=int, default=1, choices=[1, 2, 4])
    p.add_argument('--phases', type=int, default=4)
    args = p.parse_args()
    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    dt_dil = args.dil
    PT, PF = dt_dil, 4

    from encodec_pytorch_tpu.ops.conv2d_pack import conv2d_fpack
    from encodec_pytorch_tpu.ops.pallas_conv2d_v2 import (
        _conv_v2, conv2d_v2, pack_weights, phase_split_input)

    print(f'# devices: {jax.devices()}')
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F, C).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.randn(KT, KF, C, C).astype(np.float32) * 0.05
                    ).astype(dtype)
    fo = (F + 2 * PF - KF) // SF + 1
    to = T + 2 * PT - (KT - 1) * dt_dil
    print(f'shapes: [B={B}, T={T}, F={F}, C={C}] k({KT},{KF}) s({ST},{SF}) '
          f'd({dt_dil},1) -> [*, {to}, {fo}, {C}]  dtype={args.dtype} '
          f'P={args.phases}')

    # numerics sanity on-device
    ref = jax.lax.conv_general_dilated(
        x, w, (ST, SF), ((PT, PT), (PF, PF)), rhs_dilation=(dt_dil, 1),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = conv2d_v2(x, w, (ST, SF), (dt_dil, 1), (PT, PF),
                    phases=args.phases)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f'v2 max abs err vs lax conv: {err:.3e}')

    def nhwc(x_, eps):
        return jnp.sum(jax.lax.conv_general_dilated(
            x_ + eps.astype(dtype), w, (ST, SF), ((PT, PT), (PF, PF)),
            rhs_dilation=(dt_dil, 1),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            .astype(jnp.float32))

    def fpack(x_, eps):
        return jnp.sum(conv2d_fpack(
            x_ + eps.astype(dtype), w, (ST, SF), (dt_dil, 1), (PT, PF),
            phases=4, preferred_element_type=None, custom_dx=False)
            .astype(jnp.float32))

    # kernel-only: pre-split input, packed weights
    G = -(-fo // args.phases)
    g_need = G + (((args.phases - 1) * SF + KF - 1)
                  // (args.phases * SF)) + 1
    xph = phase_split_input(x, PT, PF, args.phases * SF, g_need, KT, dt_dil)
    wk = pack_weights(w, SF, args.phases).astype(dtype)

    def v2_kernel(xph_, eps):
        y = _conv_v2(xph_ + eps.astype(dtype), wk, KT, KF, SF, dt_dil,
                     args.phases, G, g_need, False)
        return jnp.sum(y.astype(jnp.float32))

    def v2_e2e(x_, eps):
        y = conv2d_v2(x_ + eps.astype(dtype), w, (ST, SF), (dt_dil, 1),
                      (PT, PF), phases=args.phases)
        return jnp.sum(y.astype(jnp.float32))

    timed_slope('nhwc XLA conv', nhwc, x)
    timed_slope('fpack P=4 (shipped)', fpack, x)
    timed_slope('v2 kernel (pre-split, chained-stack model)', v2_kernel, xph)
    timed_slope('v2 end-to-end (drop-in)', v2_e2e, x)


if __name__ == '__main__':
    main()
