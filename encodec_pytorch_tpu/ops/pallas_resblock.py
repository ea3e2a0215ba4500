"""Fused SEANet residual block as a Pallas TPU kernel — EXPERIMENTAL.

The narrow-channel resblocks dominate single-stream codec time: at C=32,
T=720k one resblock costs ~9 ms under XLA because every tensor is
(8,128)-tile padded 4× in the lane dimension (C=32 of 128 lanes) and
round-trips HBM ~8 times (2 ELUs, 3 convs, pads, adds). This kernel does the
whole block — ELU → k3 dilated conv → ELU → k1 conv, plus the 1×1-conv
shortcut — in ONE pass per time tile, computing in ``[C, T]`` orientation so
the time axis fills the lanes.

STATUS (round 1): numerically exact vs SEANetResnetBlock in interpret mode
(all causal/dilation variants, tests/test_pallas_resblock.py), but NOT wired
into the model: Mosaic cannot yet DMA-slice the halo window from a (1,128)-tiled
HBM operand with a dynamic batch index, and working around it with shifted
input copies forfeits the memory win because the copies are still 4×
lane-padded in HBM. The full fix is an NCT-layout compute path for the
narrow-channel stages (time on lanes end-to-end) — see ROADMAP.md item 1.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

TIME_BLOCK = 2048


def _elu(x):
    # expm1 has no Mosaic lowering; exp(x)-1 differs by <1 ulp for x<=0 at f32
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _resblock_kernel(x_hbm, k1_ref, b1_ref, k2_ref, b2_ref, ks_ref, bs_ref,
                     out_ref, scratch, sem, *, d: int, block: int,
                     sc_offset: int):
    """One (batch, time-tile) grid step.

    x_hbm:  [B, Tpad + 2d, C] full array in HBM/ANY (reflect-padded input)
    k1_ref: [3, C, H] dilated-conv kernel; b1_ref: [H]
    k2_ref: [H, C] 1×1 conv;               b2_ref: [C]
    ks_ref: [C, C] shortcut 1×1 conv;      bs_ref: [C]
    out_ref: [block, C] output tile
    scratch: [block + 2d, C] VMEM staging for the input tile + halo
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * block, block + 2 * d)], scratch, sem)
    copy.start()
    copy.wait()

    xt = scratch[...].T                       # [C, block + 2d] — time on lanes
    a = _elu(xt)
    H = k1_ref.shape[2]
    C = xt.shape[0]
    # k3 dilated conv: y1[:, t] = Σ_j K1[j]ᵀ · a[:, t + j·d]
    y1 = jnp.zeros((H, block), jnp.float32)
    for j in range(3):
        y1 += jax.lax.dot_general(
            k1_ref[j], a[:, j * d: j * d + block],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y1 = _elu(y1 + b1_ref[...][:, None])
    # k1 conv back to C
    y2 = jax.lax.dot_general(
        k2_ref[...], y1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...][:, None]
    # shortcut 1×1 conv on the unpadded input (x[t] sits at xpad[t + sc_offset])
    sc = jax.lax.dot_general(
        ks_ref[...], xt[:, sc_offset: sc_offset + block],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bs_ref[...][:, None]
    out_ref[0] = (y2 + sc).T


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _resblock_call(xpad, k1, b1, k2, b2, ks, bs, d: int, sc_offset: int,
                   interpret: bool):
    """xpad: [B, Tpad + 2d, C] (Tpad multiple of TIME_BLOCK) → [B, Tpad, C]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp2, C = xpad.shape
    Tpad = Tp2 - 2 * d
    H = k1.shape[2]
    grid = (B, Tpad // TIME_BLOCK)
    kernel = functools.partial(_resblock_kernel, d=d, block=TIME_BLOCK,
                               sc_offset=sc_offset)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # manual halo DMA
            pl.BlockSpec((3, C, H), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TIME_BLOCK, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TIME_BLOCK + 2 * d, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, k1, b1, k2, b2, ks, bs)


def available() -> bool:
    return jax.default_backend() == 'tpu'


def resblock_pallas(x: jnp.ndarray, k1, b1, k2, b2, ks, bs, *, dilation: int,
                    causal: bool, pad_mode: str = 'reflect',
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused resblock forward. x: [B, T, C] → [B, T, C].

    k1: [3, C, H] (WIO), k2: [H, C] (1×1 squeezed), ks: [C, C]; weight-norm
    already materialized. Padding mirrors SConv1d (causal: 2d left;
    non-causal: d each side) with the requested mode — applied to x, which
    commutes with the leading ELU (both gathers/elementwise).
    """
    if interpret is None:
        interpret = not available()
    from .pad import pad1d

    B, T, C = x.shape
    d = dilation
    if causal:
        xpad = pad1d(x, (2 * d, 0), mode=pad_mode)
        sc_offset = 2 * d
    else:
        xpad = pad1d(x, (d, d), mode=pad_mode)
        sc_offset = d
    Tpad = -(-T // TIME_BLOCK) * TIME_BLOCK
    if Tpad != T:
        xpad = jnp.pad(xpad, ((0, 0), (0, Tpad - T), (0, 0)))
    out = _resblock_call(xpad, k1, b1, k2, b2, ks, bs, d, sc_offset, interpret)
    return out[:, :T]
