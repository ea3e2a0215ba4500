"""LSTM recurrence as a Pallas TPU kernel.

The XLA `lax.scan` LSTM costs ~0.8 µs/step of loop overhead on v5e. This
kernel keeps ``W_hh`` (4 MB at H=512) and the carry VMEM-resident, streams
the precomputed input projection in time blocks through the grid (TPU grid
steps run sequentially, so scratch carries state between blocks), and runs
the recurrence as an unrolled inner loop per block.

Semantics identical to ops/lstm.py `_lstm_layer` (torch gate order i,f,g,o);
asserted in tests (interpret mode) and used only when shapes fit VMEM.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

TIME_BLOCK = 128


def _lstm_kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref, *, block: int):
    """One time block. xp_ref: [block, B, 4H]; whh_ref: [H, 4H];
    out_ref: [block, B, H]; h_ref/c_ref: [B, H] persistent scratch."""
    import jax.experimental.pallas as pl  # noqa: F401

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    def step(t, carry):
        h, c = carry
        gates = xp_ref[t] + jnp.dot(h, whh_ref[...],
                                    preferred_element_type=jnp.float32)
        H = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out_ref[t] = h
        return h, c

    h, c = jax.lax.fori_loop(0, block, step, (h_ref[...], c_ref[...]))
    h_ref[...] = h
    c_ref[...] = c


@functools.partial(jax.jit, static_argnums=(2,))
def _lstm_recurrence(xp: jnp.ndarray, w_hh: jnp.ndarray,
                     interpret: bool) -> jnp.ndarray:
    """xp: [T, B, 4H] (input projection + bias, T multiple of TIME_BLOCK),
    w_hh: [H, 4H] → hidden states [T, B, H]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, H4 = xp.shape
    H = H4 // 4
    grid = (T // TIME_BLOCK,)
    return pl.pallas_call(
        functools.partial(_lstm_kernel, block=TIME_BLOCK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, B, H4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TIME_BLOCK, B, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w_hh)


def available() -> bool:
    return jax.default_backend() == 'tpu'


# The kernel streams xp [T_pad, B, 4H] through VMEM in time blocks; the
# compiler's scoped-VMEM budget is 16 MB and the block working set scales
# with B (measured: B=12/T=256 and B=1/T=2304 compile, B=16/T=2304 dies
# with a 36 MB scoped allocation). Gate on the dominant xp footprint with
# headroom; past it the lax.scan recurrence is used instead — at such
# batch/length products the scan's loop overhead is amortized anyway.
_VMEM_XP_LIMIT_BYTES = 32 * 2 ** 20


def fits(x_shape, H: int) -> bool:
    """True if [B, T, C] input is within the kernel's VMEM budget."""
    try:
        B, T = int(x_shape[0]), int(x_shape[1])
    except Exception:  # TypeError or InconclusiveDimensionOperation
        # symbolic dims (jax.export shape polymorphism): the fit cannot be
        # decided at trace time, so take the lax.scan path — Pallas calls
        # do not serialize with symbolic shapes anyway
        return False
    t_pad = -(-T // TIME_BLOCK) * TIME_BLOCK
    return t_pad * B * 4 * H * 4 <= _VMEM_XP_LIMIT_BYTES


def lstm_layer_pallas(x: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                      b: jnp.ndarray, interpret: Optional[bool] = None
                      ) -> jnp.ndarray:
    """Drop-in for ops.lstm._lstm_layer. x: [B, T, C] → [B, T, H]."""
    if interpret is None:
        interpret = not available()
    B, T, C = x.shape
    H = w_hh.shape[0]
    xp = jnp.dot(x, w_ih, preferred_element_type=jnp.float32) + b
    xp = jnp.swapaxes(xp, 0, 1)                      # [T, B, 4H]
    T_pad = -(-T // TIME_BLOCK) * TIME_BLOCK
    if T_pad != T:
        xp = jnp.pad(xp, ((0, T_pad - T), (0, 0), (0, 0)))
    ys = _lstm_recurrence(xp, w_hh, interpret)
    return jnp.swapaxes(ys[:T], 0, 1)
