"""Pipelined fpack-im2col Pallas kernel for the disc's 32-channel convs (v2).

Round 2's per-layer im2col kernel (``pallas_conv2d.py``) was measured and
rejected: building the im2col matrix in VMEM costs as much VPU time as the
matmul saves on the MXU — 216 small tap copies per grid step fed a
32-row matmul no faster than XLA's conv (PERF_NOTES "Fused im2col Pallas
disc conv"). v2 changes both sides of that balance:

- **K-AND-M-dense matmul**: im2col of the *F-phase-packed* conv
  (ops/conv2d_pack.py) rather than the plain conv — the weight matrix is
  ``[P*Cout = 128, K' = kt*16*Cin = 1536]``, so the MXU runs with all 128
  output rows and a dense 1536-deep contraction instead of M=32 (plain
  im2col) or K=32 (XLA's tap loop). FLOP overhead is the fpack factor plus
  the G→128 lane padding; both are priced in the bench.
- **One 3-D copy per tap**: the input is phase-split by the *total* output
  stride P*sf with phase-major lanes ``[B, Tp, Cin, L]`` (lane
  ``l = phi*Q + g``), so tap (mt, mf') is a single
  ``[R, Cin, G]``-shaped copy — outer-dim t offsets, 32-aligned sublane
  K-offsets, contiguous lane slices. 45 wide copies per grid step instead
  of 216 narrow ones.
- **VPU/MXU software pipelining**: ``xcol`` is double-buffered; grid step i
  builds slot ``i%2`` while the MXU consumes slot ``(i-1)%2`` built the
  step before (one trailing flush step). The build (VPU) and the matmul
  (MXU) have no data dependency within a step, so Mosaic can overlap them —
  the whole point, since build traffic alone is ~70 % of a matmul.

Geometry: the disc's conv_1..conv_4 class — ``kt=3``, F-kernel ``kf<=9``,
F-stride ``sf in {1,2}``, T-stride 1, T-dilation ``dt`` compile-time,
``Cin = Cout = 32`` (reference msstftd.py:66-105). conv_0 (Cin=2) and
conv_post (Cout=1) stay on the XLA fpack path. Numerics: exact vs
``lax.conv_general_dilated`` to fp reduction order
(tests/test_pallas_conv2d_v2.py, interpret mode).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

R_BLK = 8          # output T rows per grid step
P_DEFAULT = 4      # fpack output positions packed into channels
N_MF = 16          # padded tap count along the packed-F axis (K' alignment)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def available() -> bool:
    return jax.default_backend() == 'tpu'


# ---------------------------------------------------------------------------
# host-side packing


def taps_fit(phases: int, stride_f: int, kf: int) -> bool:
    """Eligibility bound callers must gate on: the packed taps
    ``(phases-1)*stride_f + kf`` must fit the padded tap axis ``N_MF``
    (pack_weights asserts this; an ineligible config should fall back to
    the XLA fpack path instead of tripping the assert)."""
    return (phases - 1) * stride_f + kf <= N_MF


def pack_weights(w: jnp.ndarray, sf: int, phases: int) -> jnp.ndarray:
    """``[kt, kf, Cin, Cout]`` → ``[phases*Cout, kt*N_MF*Cin]`` with
    ``wk[p*Cout+co, (mt*N_MF + p*sf + kfi)*Cin + ci] = w[mt, kfi, ci, co]``.
    Unused tap slots stay zero (they pair with zeroed xcol rows)."""
    kt, kf, cin, cout = w.shape
    assert (phases - 1) * sf + kf <= N_MF, (phases, sf, kf)
    wk = jnp.zeros((phases * cout, kt * N_MF * cin), w.dtype)
    for p in range(phases):
        for kfi in range(kf):
            mf = p * sf + kfi
            for mt in range(kt):
                k0 = (mt * N_MF + mf) * cin
                wk = wk.at[p * cout:(p + 1) * cout, k0:k0 + cin].set(
                    w[mt, kfi].T)
    return wk


def phase_split_input(x: jnp.ndarray, pt: int, pf: int, sfp: int,
                      g_need: int, kt: int, dt: int) -> jnp.ndarray:
    """NHWC ``[B, T, F, Cin]`` → ``[B, Tp, Cin, L]`` with lane
    ``l = phi*Q + g`` holding ``xpad[b, t, sfp*g + phi, ci]`` (``xpad`` is x
    padded by ``pt`` rows and ``pf`` leading F columns).

    ``sfp = P*sf`` is the packed output stride; ``g_need`` = lane extent the
    kernel reads per phase (G + max tap j). Tp is padded so the row count is
    a multiple of R_BLK plus the t halo.
    """
    B, T, F, C = x.shape
    t_out = T + 2 * pt - (kt - 1) * dt
    t_pad_extra = (-t_out) % R_BLK
    halo = (kt - 1) * dt
    Q = g_need
    f_need = sfp * (Q - 1) + sfp  # ceil coverage of all (g, phi)
    pr = max(0, f_need - pf - F)
    xp = jnp.pad(x, ((0, 0), (pt, pt + t_pad_extra), (pf, pr), (0, 0)))
    Tp = xp.shape[1]
    assert (Tp - halo) % R_BLK == 0
    # [B, Tp, Q, sfp, C] -> [B, Tp, C, sfp, Q] -> merge (sfp, Q) phase-major
    xq = xp[:, :, :sfp * Q, :].reshape(B, Tp, Q, sfp, C)
    xq = jnp.transpose(xq, (0, 1, 4, 3, 2)).reshape(B, Tp, C, sfp * Q)
    L = _roundup(sfp * Q, 128)
    return jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, L - sfp * Q)))


# ---------------------------------------------------------------------------
# kernel


def _kernel(xph_hbm, wk_ref, out_ref, xwin, xcol, sem, *,
            kt, dt, cin, g_out, n_tb, taps):
    """Grid (flat): ``B*n_tb + 1`` steps. Step i builds xcol[i%2] for block i
    and matmuls xcol[(i-1)%2] into out block i-1 (flush on the last step).

    xph_hbm: [B, Tp, cin, L] (ANY). wk_ref: [M, K'] VMEM.
    out block: [1, 1, R_BLK, M, gp]. xwin: [2][win_t, cin, L].
    xcol: [2][R_BLK, K', gp].
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    n_total = pl.num_programs(0)
    win_t = R_BLK + (kt - 1) * dt
    cur = jax.lax.rem(i, 2)
    prev = jax.lax.rem(i + 1, 2)

    b = i // n_tb
    tb = jax.lax.rem(i, n_tb)

    @pl.when(i == 0)
    def _():
        xcol[0] = jnp.zeros_like(xcol[0])
        xcol[1] = jnp.zeros_like(xcol[1])

    # ---- stage A: DMA + build xcol[cur] for block i (skip on flush step)
    @pl.when(i < n_total - 1)
    def _():
        dma = pltpu.make_async_copy(
            xph_hbm.at[b, pl.ds(tb * R_BLK, win_t)], xwin.at[cur],
            sem)
        dma.start()
        dma.wait()
        for (mt, mf, k0, l0) in taps:
            xcol[cur, :, k0:k0 + cin, :g_out] = \
                xwin[cur][mt * dt:mt * dt + R_BLK, :, l0:l0 + g_out]

    # ---- stage B: matmul xcol[prev] (the block built last step)
    @pl.when(i > 0)
    def _():
        for r in range(R_BLK):
            out_ref[0, 0, r] = jax.lax.dot_general(
                wk_ref[...], xcol[prev, r],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _conv_v2(xph: jnp.ndarray, wk: jnp.ndarray, kt: int, kf: int, sf: int,
             dt: int, phases: int, g_out: int, q_true: int,
             interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp, cin, L = xph.shape
    M = wk.shape[0]
    halo = (kt - 1) * dt
    n_tb = (Tp - halo) // R_BLK
    win_t = R_BLK + halo
    gp = _roundup(g_out, 128)
    sfp = phases * sf

    # lane offset of tap (mt, mf): phi = mf % sfp, j = mf // sfp, with the
    # phase-major lane map l = phi*q_true + g set up by phase_split_input
    taps = []
    n_mf = (phases - 1) * sf + kf
    for mt in range(kt):
        for mf in range(n_mf):
            phi, j = mf % sfp, mf // sfp
            k0 = (mt * N_MF + mf) * cin
            l0 = phi * q_true + j
            taps.append((mt, mf, k0, l0))

    grid = (B * n_tb + 1,)
    dtype = xph.dtype

    def out_index(i):
        ip = jnp.maximum(i - 1, 0)
        return (ip // n_tb, jax.lax.rem(ip, n_tb), 0, 0, 0)

    y = pl.pallas_call(
        functools.partial(_kernel, kt=kt, dt=dt, cin=cin, g_out=g_out,
                          n_tb=n_tb, taps=taps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((M, wk.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R_BLK, M, gp), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tb, R_BLK, M, gp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win_t, cin, L), dtype),
            pltpu.VMEM((2, R_BLK, kt * N_MF * cin, gp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xph, wk)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv2d_v2_op(x, kernel, stride, dilation, padding, phases):
    """Trainable v2 conv: Pallas forward, Pallas phase-packed dx, XLA dW
    (autodiff of the fpack formulation — the contraction over B*H*W is
    already MXU-shaped there). Same math as the plain conv, re-associated;
    gradient parity in tests/test_pallas_conv2d_v2.py."""
    return conv2d_v2(x, kernel, stride, dilation, padding, phases=phases)


def _v2_op_fwd(x, kernel, stride, dilation, padding, phases):
    y = conv2d_v2(x, kernel, stride, dilation, padding, phases=phases)
    return y, (x, kernel)


def _v2_op_bwd(stride, dilation, padding, phases, res, g):
    from .conv2d_pack import _conv2d_fpack_raw

    x, kernel = res
    _, kvjp = jax.vjp(
        lambda kk: _conv2d_fpack_raw(x, kk, stride, dilation, padding,
                                     phases, None), kernel)
    (dk,) = kvjp(g)
    dx = conv2d_v2_dx(g, kernel, stride, dilation, padding, x.shape,
                      phases=phases)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv2d_v2_op.defvjp(_v2_op_fwd, _v2_op_bwd)


def conv2d_v2_dx(g: jnp.ndarray, kernel: jnp.ndarray,
                 stride: Tuple[int, int], dilation: Tuple[int, int],
                 padding: Tuple[int, int], x_shape: Tuple[int, ...],
                 phases: int = P_DEFAULT, interpret=None) -> jnp.ndarray:
    """Input gradient of the conv, through the v2 kernel.

    The phase-packed dx formulation (ops/conv2d_pack.py: dx as ONE stride-1
    conv over the cotangent with the combined ``[kh, ceil(kw/sf), Cout,
    sf*Cin]`` kernel) is itself a member of the conv class this kernel
    accelerates — so the v2 dx is that exact math with the fpack conv
    swapped for ``conv2d_v2``. Same eligibility: T-stride 1, no F dilation,
    ``(kh-1)*dt >= ph``.
    """
    from .conv2d_pack import dx_geometry
    return dx_geometry(conv2d_v2, g, kernel, stride, dilation, padding,
                       x_shape, phases, interpret=interpret)


def conv2d_v2(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int],
              dilation: Tuple[int, int], padding: Tuple[int, int],
              phases: int = P_DEFAULT, interpret=None) -> jnp.ndarray:
    """Drop-in forward for
    ``lax.conv_general_dilated(x, w, (1, sf), ((pt,pt),(pf,pf)),
    rhs_dilation=(dt,1), NHWC/HWIO/NHWC)`` on the disc conv class.

    x: [B, T, F, Cin]; w: [kt, kf, Cin, Cout] → y [B, To, Fo, Cout].
    """
    if interpret is None:
        interpret = not available()
    st, sf = stride
    dt, df = dilation
    assert st == 1 and df == 1, (stride, dilation)
    kt, kf, cin, cout = w.shape
    pt, pf = padding
    B, T, F, _ = x.shape
    f_out = (F + 2 * pf - kf) // sf + 1
    t_out = T + 2 * pt - (kt - 1) * dt
    G = -(-f_out // phases)          # packed output blocks
    g_need = G + (((phases - 1) * sf + kf - 1) // (phases * sf)) + 1
    xph = phase_split_input(x, pt, pf, phases * sf, g_need, kt, dt)
    wk = pack_weights(w, sf, phases).astype(x.dtype)
    y = _conv_v2(xph, wk, kt, kf, sf, dt, phases, G, g_need, interpret)
    # y: [B, n_tb, R, P*Cout, Gp] → NHWC [B, To, Fo, Cout]
    Bn, n_tb, R, M, gp = y.shape
    y = y.reshape(Bn, n_tb * R, phases, cout, gp)[:, :t_out]
    y = jnp.transpose(y, (0, 1, 4, 2, 3)).reshape(Bn, t_out, gp * phases,
                                                  cout)
    return y[:, :, :f_out]
