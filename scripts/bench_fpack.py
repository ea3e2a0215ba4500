#!/usr/bin/env python
"""F-phase packed disc conv benchmark (round 3): one mid conv and the full
3-scale discriminator forward / forward+backward, plain vs packed.

Usage: python scripts/bench_fpack.py [--dtype bfloat16] [--phases 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8

# representative scale (n_fft=1024): B=12, T'=281, F=513, C=32
B, T, F, C = 12, 281, 513, 32


def timed(label, fn, *args):
    @jax.jit
    def chained(*a):
        def body(c, _):
            return (fn(*c[1:], c[0]), *c[1:]), None

        (acc, *_), _ = jax.lax.scan(body, (jnp.float32(0.0), *a), None,
                                    length=ITERS)
        return acc

    float(chained(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1] / ITERS * 1e3
    print(f'{label:<44s} {dt:8.2f} ms', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--phases', type=int, default=8)
    args = p.parse_args()
    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]
    P = args.phases

    from encodec_pytorch_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from encodec_pytorch_tpu.ops.conv2d_pack import conv2d_fpack

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F, C).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.randn(3, 9, C, C).astype(np.float32) * 0.05).astype(dtype)

    def plain(x, k, acc):
        y = jax.lax.conv_general_dilated(
            x + acc.astype(x.dtype) * 0, k, window_strides=(1, 2),
            padding=((1, 1), (4, 4)), rhs_dilation=(1, 1),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        return jnp.sum(y).astype(jnp.float32)

    def packed(x, k, acc):
        y = conv2d_fpack(x + acc.astype(x.dtype) * 0, k, (1, 2), (1, 1),
                         (1, 4), phases=P)
        return jnp.sum(y).astype(jnp.float32)

    print(f'# mid conv 32->32 k(3,9) s(1,2) at [{B},{T},{F},{C}], '
          f'{args.dtype}, P={P}')
    t_plain = timed('plain NHWC conv', plain, x, k)
    t_pack = timed(f'fpack P={P}', packed, x, k)
    print(f'  -> {t_plain / t_pack:.2f}x')

    # full 3-scale disc forward and forward+backward
    wav = jnp.asarray(rng.randn(B, 1, 72000).astype(np.float32) * 0.1)
    for fp in (0, P):
        disc = MultiScaleSTFTDiscriminator(
            filters=32, n_ffts=(1024, 2048, 512), hop_lengths=(256, 512, 128),
            win_lengths=(1024, 2048, 512), dtype=dtype, fpack=fp)
        variables = disc.init(jax.random.PRNGKey(0), wav[:1])
        params = variables['params']

        def fwd(params, wav, acc):
            logits, fmaps = disc.apply({'params': params},
                                       wav + acc.astype(wav.dtype) * 0)
            return sum(jnp.sum(l) for l in logits).astype(jnp.float32)

        def fwd_bwd(params, wav, acc):
            def loss(w):
                logits, fmaps = disc.apply({'params': params}, w)
                return (sum(jnp.mean(jax.nn.relu(1 - l)) for l in logits)
                        + sum(jnp.mean(jnp.abs(f)) for fm in fmaps
                              for f in fm))
            val, g = jax.value_and_grad(loss)(wav + acc.astype(wav.dtype) * 0)
            return (val + jnp.sum(g)).astype(jnp.float32)

        tag = f'fpack={fp}'
        timed(f'disc forward ({tag})', fwd, params, wav)
        timed(f'disc fwd+bwd wrt input ({tag})', fwd_bwd, params, wav)


if __name__ == '__main__':
    main()
