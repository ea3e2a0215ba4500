"""Fused im2col conv2d Pallas kernel for the MS-STFT discriminator stack.

The disc's convs (C_in=C_out=32, k=(3,9), stride (1,2), dilation (d,1))
run at ~6 % MXU utilization under XLA on v5e: a 32×32 channel contraction
fills 1/16th of the 128×128 systolic array and no relayout fixes it
(docs/PERF_NOTES.md "Disc-conv lowering experiments"). This kernel packs
the 27 kernel taps into the contraction — an im2col matrix
``X[(mt,mf,i), n]`` built in VMEM — so the matmul is
``W[32, 864] @ X[864, N]`` with K dense and N (output positions) on lanes.

Mosaic-shaped design notes (each avoids a relayout that killed simpler
formulations):
- the input window is **t-major** ``[Tp, 2, C, Q]`` so every tap slice
  ``xwin[t, p, :, j:j+q_out]`` indexes outer dims only (slicing a single
  sublane of a (sublane, lane)-tiled pair is a relayout);
- the phase split on the strided F axis (``q = (f - p) / 2``) makes every
  tap a *contiguous* lane slice;
- T blocks overlap by the conv halo, so the kernel DMAs its own window
  from HBM (blocked BlockSpecs cannot express overlapping windows);
- the output is written **flat** ``[B, C_out, t_out·qpo]`` — R output
  rows ride the matmul's N dimension at 128-aligned lane offsets
  (``qpo = roundup(q_out, 128)``); splitting N into (row, lane) inside
  the kernel would be a shape cast Mosaic rejects. Host reshapes + crops.

Only the disc's tap geometry is supported (F stride 2, F dilation 1);
T stride 1, T dilation compile-time. Exactness vs
``lax.conv_general_dilated`` asserted in tests (interpret mode).
"""

import functools

import jax
import jax.numpy as jnp

R_BLK = 8  # output rows packed into one matmul's N dimension


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(xph_hbm, wk_ref, out_ref, xwin, xcol, sem, *,
            kt, kf, dil, c_in, q_out, qpo):
    """One (b, t-block): DMA the t-major window, build X, one matmul.

    xph_hbm: [B, Tp, 2, c_in, qpad] (ANY/HBM).
    wk_ref: [c_out, kt*kf*c_in] VMEM.
    out_ref block: [1, c_out, R_BLK*qpo].
    xwin: [R_BLK + (kt-1)*dil, 2, c_in, qpad]; xcol: [kt*kf*c_in, R_BLK*qpo].
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    win = R_BLK + (kt - 1) * dil
    dma = pltpu.make_async_copy(
        xph_hbm.at[b, pl.ds(t * R_BLK, win)], xwin, sem)
    dma.start()
    dma.wait()
    for mt in range(kt):
        for mf in range(kf):
            p, j = mf % 2, mf // 2
            k0 = (mt * kf + mf) * c_in
            for r in range(R_BLK):
                xcol[k0:k0 + c_in, r * qpo:r * qpo + q_out] = \
                    xwin[mt * dil + r, p, :, j:j + q_out]
    out_ref[0] = jax.lax.dot_general(
        wk_ref[...], xcol[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _conv_im2col(xph: jnp.ndarray, wk: jnp.ndarray, kt: int, kf: int,
                 dil: int, q_out: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, tp, _, c_in, qpad = xph.shape
    c_out = wk.shape[0]
    t_out = tp - (kt - 1) * dil
    qpo = _roundup(q_out, 128)
    assert t_out % R_BLK == 0, (t_out, R_BLK)
    grid = (B, t_out // R_BLK)
    dtype = xph.dtype
    y = pl.pallas_call(
        functools.partial(_kernel, kt=kt, kf=kf, dil=dil, c_in=c_in,
                          q_out=q_out, qpo=qpo),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((c_out, kt * kf * c_in), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, R_BLK * qpo),
                               lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_out, t_out * qpo), dtype),
        scratch_shapes=[
            pltpu.VMEM((R_BLK + (kt - 1) * dil, 2, c_in, qpad), dtype),
            pltpu.VMEM((kt * kf * c_in, R_BLK * qpo), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xph, wk)
    return y.reshape(B, c_out, t_out, qpo)


def available() -> bool:
    return jax.default_backend() == 'tpu'


def _phase_split(x: jnp.ndarray, pt: int, pf: int, kt: int, kf: int,
                 dil: int, r_blk: int) -> jnp.ndarray:
    """NHWC ``x [B, T, F, C]`` → t-major ``xph [B, Tp, 2, C, Qpad]``
    (``xph[b, t, p, i, q] = xpad[b, t, 2q+p, i]``). Pads T so the output
    row count is a multiple of ``r_blk``."""
    B, T, F, C = x.shape
    t_out = T + 2 * pt - (kt - 1) * dil
    t_extra = (-t_out) % r_blk
    xp = jnp.pad(x, ((0, 0), (pt, pt + t_extra), (pf, pf), (0, 0)))
    Fp = xp.shape[2]
    # Q must be lane-aligned: HBM DMA slices require the minor dim to be
    # a multiple of the (·,128) tiling
    Fp_target = 2 * _roundup(-(-Fp // 2), 128)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Fp_target - Fp), (0, 0)))
    Fp = Fp_target
    # [B, Tp, Fp, C] -> [B, Tp, Q, 2, C] -> [B, Tp, 2, C, Q]
    xph = xp.reshape(B, xp.shape[1], Fp // 2, 2, C)
    return jnp.transpose(xph, (0, 1, 3, 4, 2))


def conv2d_im2col(x: jnp.ndarray, w: jnp.ndarray, padding, dilation=(1, 1),
                  interpret=None) -> jnp.ndarray:
    """Drop-in for the disc conv:
    ``lax.conv_general_dilated(x, w, (1, 2), ((pt,pt),(pf,pf)),
    rhs_dilation=(dt, 1), NHWC/HWIO/NHWC)``.

    x: [B, T, F, C_in]; w: [KT, KF, C_in, C_out] → y [B, To, Fo, C_out].
    """
    if interpret is None:
        interpret = not available()
    kt, kf, c_in, c_out = w.shape
    pt, pf = padding
    dt = dilation[0]
    B, T, F, _ = x.shape
    f_out = (F + 2 * pf - kf) // 2 + 1
    xph = _phase_split(x, pt, pf, kt, kf, dt, R_BLK)
    # wk [c_out, (mt, mf, i)]
    wk = jnp.transpose(w, (3, 0, 1, 2)).reshape(c_out, kt * kf * c_in)
    y = _conv_im2col(xph, wk.astype(x.dtype), kt, kf, dt, f_out, interpret)
    t_out_real = T + 2 * pt - (kt - 1) * dt
    y = y[:, :, :t_out_real, :f_out]
    return jnp.transpose(y, (0, 2, 3, 1))
