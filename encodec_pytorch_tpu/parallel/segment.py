"""Segment-parallel codec inference.

The reference handles long inputs by windowing into 1 s segments processed
*sequentially* (model.py:122-145) and overlap-adding (utils.py:22-61). The
segments are embarrassingly parallel (SURVEY.md §5): here they are stacked on
a leading axis and run through ONE jitted, vmapped encode/decode — optionally
sharded over the mesh's ``data`` axis so segments fan out across chips over
ICI. Host-side only the tail segment (shorter than a full window) falls back
to the sequential path, keeping the emitted frames byte-identical to the
sequential encoder.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quantization.core_vq import rvq_decode, rvq_encode
from ..utils import linear_overlap_add
from .mesh import batch_sharding, replicated_sharding


def _get_jitted(model, n_q: int):
    cache = model.__dict__.setdefault('_segment_parallel_cache', {})
    if n_q in cache:
        return cache[n_q]

    def enc_segments(variables, segs):
        """segs: [S, B, C, L] → (codes [S, B, K, Tc], scales [S, B, 1]|None)."""
        def enc_one(seg):
            seg, scale = model._normalize_frame(seg)
            emb = model.encoder.apply(
                {'params': variables['params']['encoder']},
                jnp.swapaxes(seg, 1, 2))
            codes = rvq_encode(variables['quantizer'], emb, n_q)
            codes = jnp.transpose(codes, (1, 0, 2))
            return codes, scale
        return jax.vmap(enc_one)(segs)

    def dec_segments(variables, codes, scales):
        """codes [S, B, K, Tc] (+scales [S, B, 1]|None) → wav [S, B, C, L]."""
        def dec_one(codes_k, scale):
            emb = rvq_decode(variables['quantizer'],
                             jnp.transpose(codes_k, (1, 0, 2)))
            out = model.decoder.apply(
                {'params': variables['params']['decoder']}, emb)
            out = jnp.swapaxes(out, 1, 2)
            if scale is not None:
                out = out * scale.reshape(-1, 1, 1)
            return out
        if scales is None:
            return jax.vmap(lambda c: dec_one(c, None))(codes)
        return jax.vmap(dec_one)(codes, scales)

    jitted = (jax.jit(enc_segments), jax.jit(dec_segments))
    cache[n_q] = jitted
    return jitted


def encode_parallel(model, variables, x: jnp.ndarray,
                    mesh=None) -> List[Tuple[jnp.ndarray, Optional[jnp.ndarray]]]:
    """Drop-in for ``model.encode`` computing all full segments in one call.

    With ``mesh``, the segment axis is sharded over the ``data`` axis (chips
    each encode their share of the windows; ICI carries the gather).
    """
    assert x.ndim == 3
    length = x.shape[-1]
    segment_length = model.segment_length
    if segment_length is None:
        return model.encode(variables, x)
    stride = model.segment_stride
    n_q = model.quantizer.num_quantizers_for_bandwidth(model.frame_rate,
                                                       model.bandwidth)
    offsets = list(range(0, length, stride))
    full = [o for o in offsets if o + segment_length <= length]
    tail = [o for o in offsets if o + segment_length > length]

    frames: List = []
    if full:
        segs = jnp.stack([x[:, :, o:o + segment_length] for o in full], 0)
        # gate on the DATA axis size: batch_sharding shards dim 0 over
        # 'data' only, so extra mesh axes (tp) must not disqualify a
        # shardable segment count
        data_sz = mesh.shape.get('data') if mesh is not None else None
        if data_sz and segs.shape[0] % data_sz == 0:
            segs = jax.device_put(segs, batch_sharding(mesh))
            variables = jax.device_put(variables, replicated_sharding(mesh))
        enc_fn, _ = _get_jitted(model, n_q)
        codes, scales = enc_fn(variables, segs)
        for i in range(len(full)):
            frames.append((codes[i], None if scales is None else scales[i]))
    for o in tail:
        frames.append(model._encode_frame(variables, x[:, :, o:o + segment_length]))
    return frames


def decode_parallel(model, variables, frames, mesh=None) -> jnp.ndarray:
    """Drop-in for ``model.decode``: all equal-shape frames decode in one
    vmapped call, then triangular overlap-add."""
    segment_length = model.segment_length
    if segment_length is None:
        return model.decode(variables, frames)
    n_q = frames[0][0].shape[1]
    _, dec_fn = _get_jitted(model, n_q)

    shapes = [f[0].shape for f in frames]
    n_full = len([s for s in shapes if s == shapes[0]])
    stacked = jnp.stack([f[0] for f in frames[:n_full]], 0)
    scales = None
    if frames[0][1] is not None:
        scales = jnp.stack([f[1] for f in frames[:n_full]], 0)
    data_sz = mesh.shape.get('data') if mesh is not None else None
    if data_sz and stacked.shape[0] % data_sz == 0:
        stacked = jax.device_put(stacked, batch_sharding(mesh))
        variables = jax.device_put(variables, replicated_sharding(mesh))
    wavs = dec_fn(variables, stacked, scales)
    decoded = [wavs[i] for i in range(n_full)]
    for f in frames[n_full:]:
        decoded.append(model._decode_frame(variables, f))
    return linear_overlap_add(decoded, model.segment_stride or 1)


def roundtrip_parallel(model, variables, x: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """Segment-parallel eval forward == ``model(variables, x)``."""
    frames = encode_parallel(model, variables, x, mesh=mesh)
    return decode_parallel(model, variables, frames, mesh=mesh)[:, :, :x.shape[-1]]
