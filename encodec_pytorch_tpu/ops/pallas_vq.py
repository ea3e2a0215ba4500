"""Fused RVQ nearest-code search as a Pallas TPU kernel.

The XLA path (quantization/core_vq.py `rvq_encode`) scans stages, each
round-tripping the [M, bins] score matrix and the residual through HBM. This
kernel keeps the residual and all stage codebooks resident in VMEM and runs
the whole cascade per tile of rows:

    per stage k:  scores = 2·r @ E_kᵀ − ‖E_k‖²   (MXU)
                  idx_k  = argmax(scores)          (VPU)
                  r     -= onehot(idx_k) @ E_k     (MXU — gather-free)

VMEM budget: codebooks ``K·N·D·4`` bytes (K=8, N=1024, D=128 → 4 MB) + one
[TILE_M, N] score tile; stages are processed in groups of ≤8 so n_q=32 still
fits, with the residual carried between group launches.

Falls back to the XLA scan on non-TPU backends (pallas interpret mode is used
by the CPU tests).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TILE_M = 256
MAX_GROUP = 8


def _rvq_group_kernel(x_ref, embed_ref, esq_ref, idx_ref, res_ref, *, n_stages):
    """One grid step: all ``n_stages`` codebooks over a TILE_M row tile.

    x_ref:    [TILE_M, D]      input residual tile
    embed_ref:[K, N, D]        stage codebooks (VMEM-resident)
    esq_ref:  [K, N]           per-code squared norms
    idx_ref:  [K, TILE_M]      output indices
    res_ref:  [TILE_M, D]      output residual (input to the next group)
    """
    residual = x_ref[:]
    n = embed_ref.shape[1]
    for k in range(n_stages):
        embed_k = embed_ref[k]
        scores = 2.0 * jax.lax.dot_general(
            residual, embed_k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores - esq_ref[k][None, :]
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                  == idx[:, None]).astype(jnp.float32)
        q = jnp.dot(onehot, embed_k, preferred_element_type=jnp.float32)
        residual = residual - q
        idx_ref[k, :] = idx
    res_ref[:] = residual


@functools.partial(jax.jit, static_argnums=(2, 3))
def _rvq_encode_group(embed: jnp.ndarray, x: jnp.ndarray, n_stages: int,
                      interpret: bool):
    """x: [M, D] (M multiple of TILE_M), embed: [K, N, D] → (idx [K, M],
    residual [M, D])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, D = x.shape
    K, N, _ = embed.shape
    esq = jnp.sum(jnp.square(embed), axis=-1)
    grid = (M // TILE_M,)
    kernel = functools.partial(_rvq_group_kernel, n_stages=n_stages)
    idx, res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, TILE_M), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, M), jnp.int32),
            jax.ShapeDtypeStruct((M, D), jnp.float32),
        ],
        interpret=interpret,
    )(x, embed, esq)
    return idx, res


def available() -> bool:
    return jax.default_backend() == 'tpu'


def rvq_encode_pallas(state, x: jnp.ndarray, n_q: int,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in for quantization.core_vq.rvq_encode on TPU.

    state: CodebookState; x: [B, T, D]; static n_q → codes [K, B, T] int32.
    """
    if interpret is None:
        interpret = not available()
    B, T, D = x.shape
    M = B * T
    M_pad = -(-M // TILE_M) * TILE_M
    flat = x.reshape(M, D)
    if M_pad != M:
        flat = jnp.pad(flat, ((0, M_pad - M), (0, 0)))

    codes = []
    residual = flat
    for k0 in range(0, n_q, MAX_GROUP):
        k1 = min(n_q, k0 + MAX_GROUP)
        idx, residual = _rvq_encode_group(
            state.embed[k0:k1], residual, k1 - k0, interpret)
        codes.append(idx)
    out = jnp.concatenate(codes, axis=0)[:, :M]
    return out.reshape(n_q, B, T)
