"""Layout experiments for the MS-STFT discriminator's 32-channel 2D convs.

The disc forward measured 46 ms (f32) — ~12 % MXU utilization — because
NHWC with C=32 fills a quarter of the (8,128) lane tiling and the
(1,2)-strided dilated convs tile poorly. This bench times one
representative mid-stack conv (32→32, k(3,9), stride (1,2), dilation
(1,1)) at production shapes under candidate lowerings:

  nhwc      current: conv_general_dilated NHWC/HWIO
  nchw      same op, NCHW/OIHW dimension numbers (F minor → dense lanes)
  einsum    27 tap einsums in [B, C, T, F] layout, F strided per tap
  phases    space-to-depth on F (stride-2 → 2 phase channels, dense lanes)

Usage: python scripts/bench_disc_conv.py [--dtype bfloat16]
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
KT, KF = 3, 9
ST, SF = 1, 2
PT, PF = 1, 4  # get_2d_padding((3,9))


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
    print(f'{label:<40s} {dt:8.2f} ms', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    args = p.parse_args()
    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]

    rng = np.random.RandomState(0)
    x_nhwc = jnp.asarray(rng.randn(B, T, F, C).astype(np.float32))
    w_hwio = jnp.asarray(rng.randn(KT, KF, C, C).astype(np.float32) * 0.05)
    pref = jnp.float32 if dtype == jnp.float32 else None

    fo = (F + 2 * PF - KF) // SF + 1
    to = T + 2 * PT - KT + 1
    print(f'shapes: x [B={B}, T={T}, F={F}, C={C}] -> [*, {to}, {fo}, {C}]  '
          f'dtype={args.dtype}', flush=True)

    # ---- nhwc (current production lowering)
    def nhwc(x, eps):
        y = jax.lax.conv_general_dilated(
            (x + eps).astype(dtype), w_hwio.astype(dtype),
            window_strides=(ST, SF), padding=((PT, PT), (PF, PF)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=pref)
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    timed('nhwc conv_general_dilated', nhwc, x_nhwc)

    # ---- nchw dimension numbers (x stored [B, C, T, F])
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))

    def nchw(x, eps):
        y = jax.lax.conv_general_dilated(
            (x + eps).astype(dtype), w_oihw.astype(dtype),
            window_strides=(ST, SF), padding=((PT, PT), (PF, PF)),
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            preferred_element_type=pref)
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    timed('nchw conv_general_dilated', nchw, x_nchw)

    # ---- tap einsums in [B, C, T, F] (F on lanes, strided slice per tap)
    w_oikk = jnp.transpose(w_hwio, (3, 2, 0, 1))  # [O, I, kt, kf]

    def einsum_taps(x, eps):
        xp = jnp.pad(x + eps, ((0, 0), (0, 0), (PT, PT), (PF, PF)))
        xp = xp.astype(dtype)
        y = None
        for mt in range(KT):
            for mf in range(KF):
                sl = jax.lax.slice(
                    xp, (0, 0, mt, mf),
                    (B, C, mt + to, mf + (fo - 1) * SF + 1),
                    (1, 1, 1, SF))
                term = jnp.einsum('oi,bitf->botf',
                                  w_oikk[:, :, mt, mf].astype(dtype), sl,
                                  preferred_element_type=pref)
                y = term if y is None else y + term
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    timed('tap einsums [B,C,T,F]', einsum_taps, x_nchw)

    # ---- space-to-depth phases: F stride 2 -> 2 phase channels, dense lanes
    # y[b,o,t,q] = sum_{mt,mf} w[o,i,mt,mf] x[b,i,t+mt,2q+mf]
    #            = sum_{mt,p,j} w[o,i,mt,2j+p] xph[b,i,p,t+mt,q+j]
    def phases(x, eps):
        xp = jnp.pad(x + eps, ((0, 0), (0, 0), (PT, PT), (PF, PF)))
        # pad F to even, split phases: [B, C, T+2PT, Fp/2, 2] -> [B,C,2,T,Q]
        Fp = xp.shape[-1]
        if Fp % 2:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 1)))
            Fp += 1
        xph = xp.reshape(B, C, xp.shape[2], Fp // 2, 2)
        xph = jnp.moveaxis(xph, -1, 2).astype(dtype)  # [B, C, 2, T+2PT, Q]
        y = None
        for mt in range(KT):
            for mf in range(KF):
                ph, j = mf % 2, mf // 2
                sl = jax.lax.slice(
                    xph, (0, 0, ph, mt, j),
                    (B, C, ph + 1, mt + to, j + fo), (1, 1, 1, 1, 1))
                term = jnp.einsum('oi,bistq->botq',
                                  w_oikk[:, :, mt, mf].astype(dtype), sl,
                                  preferred_element_type=pref)
                y = term if y is None else y + term
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    timed('phase-split einsums (dense lanes)', phases, x_nchw)

    # ---- space-to-depth conv: fold the F-stride-2 phases into channels,
    # then ONE stride-1 XLA conv with C_in=2C, k=(KT, ceil(KF/2)+?):
    # y[t,q] = Σ_{mt,p,j} w[mt,2j+p] x2[t+mt, q+j, (i,p)]
    JF = (KF + 1) // 2  # j range for p=0; p=1 uses JF-1 taps (zero-padded)
    w_s2d = np.zeros((KT, JF, 2 * C, C), np.float32)
    w_np = np.asarray(w_hwio)  # [KT, KF, I, O]
    for mf in range(KF):
        p, j = mf % 2, mf // 2
        w_s2d[:, j, p * C:(p + 1) * C, :] = w_np[:, mf]
    w_s2d = jnp.asarray(w_s2d)

    def s2d_conv(x, eps):
        xp = jnp.pad(x + eps, ((0, 0), (PT, PT), (PF, PF), (0, 0)))
        Fp = xp.shape[2]
        if Fp % 2:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 1), (0, 0)))
            Fp += 1
        x2 = xp.reshape(B, xp.shape[1], Fp // 2, 2 * C)  # (q, p·C) channels
        y = jax.lax.conv_general_dilated(
            x2.astype(dtype), w_s2d.astype(dtype),
            window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=pref)
        return jnp.sum(y[:, :, :fo].astype(jnp.float32)) * 1e-6

    timed('space-to-depth stride-1 conv (2C ch)', s2d_conv, x_nhwc)

    # ---- dilated variants of the production lowering (d = 2, 4 on T)
    for d in (2, 4):
        def nhwc_d(x, eps, _d=d):
            y = jax.lax.conv_general_dilated(
                (x + eps).astype(dtype), w_hwio.astype(dtype),
                window_strides=(ST, SF), padding=((_d, _d), (PF, PF)),
                rhs_dilation=(_d, 1),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=pref)
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        timed(f'nhwc dilated d=({d},1)', nhwc_d, x_nhwc)

    # ---- fused im2col Pallas kernel (K-packed taps)
    from encodec_pytorch_tpu.ops.pallas_conv2d import conv2d_im2col

    def pallas_im2col(x, eps):
        y = conv2d_im2col((x + eps).astype(dtype), w_hwio.astype(dtype),
                          (PT, PF), (1, 1))
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    try:
        timed('pallas im2col K-packed', pallas_im2col, x_nhwc)
        ref = jax.lax.conv_general_dilated(
            x_nhwc[:1, :32], w_hwio, (ST, SF), ((PT, PT), (PF, PF)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        got = conv2d_im2col(x_nhwc[:1, :32], w_hwio, (PT, PF), (1, 1))
        print(f'pallas max abs err vs nhwc: '
              f'{float(jnp.max(jnp.abs(got - ref))):.2e}', flush=True)
    except Exception as exc:
        print(f'pallas im2col failed: {type(exc).__name__}: '
              f'{str(exc)[:500]}', flush=True)

    # correctness cross-check (f32 small slice)
    ref = jax.lax.conv_general_dilated(
        x_nhwc, w_hwio, window_strides=(ST, SF),
        padding=((PT, PT), (PF, PF)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    alt = jax.lax.conv_general_dilated(
        x_nchw, w_oihw, window_strides=(ST, SF),
        padding=((PT, PT), (PF, PF)),
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    err = float(jnp.max(jnp.abs(jnp.transpose(alt, (0, 2, 3, 1)) - ref)))
    print(f'nchw max abs err vs nhwc: {err:.2e}')


if __name__ == '__main__':
    main()
