"""Inference preparation: weight-norm folding + int8 weight-only quantization.

Serving-side transforms with no reference analogue (the reference serves
the raw training graph, model.py:211-240):

- **Fold weight norm.** Training parametrizes conv kernels as ``(v, g)``
  with ``kernel = g·v/‖v‖`` recomputed every call (ops/conv.py:76-84, the
  torch ``nn.utils.weight_norm`` semantics). At serving time the kernel is
  a constant — fold it once into a ``norm='none'`` twin of the model. The
  folded variables also feed the streaming interpreter directly
  (streaming.py ``_conv_kernel`` consumes either parametrization).

- **Int8 weight-only quantization.** Symmetric per-output-channel int8
  for the folded conv kernels and the LSTM gate matrices; biases and the
  RVQ codebooks stay f32. On TPU the win is HBM bandwidth: weights are
  read as int8 and dequantized in-register ahead of the MXU (XLA fuses
  the convert+scale into the conv's operand load), halving weight traffic
  vs bf16 — the relevant term for batch-1/streaming serving, where weight
  reads dominate per-chunk HBM traffic. Activations keep the model's
  compute dtype; this is weight-only (no activation quantization), so no
  calibration data is needed and the error is bounded per channel by
  ``max|w|/254``.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.model import EncodecModel
from .ops.conv import _weight_norm_kernel

_Q_KEYS = ('kernel',)          # folded conv kernels
_Q_LSTM_KEYS = ('w_ih', 'w_hh')  # LSTM gate matrices (prefix-matched)


# ------------------------------------------------------------- fold


def fold_weight_norm_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Collapse every ``(v, g)`` weight-norm pair into a plain ``kernel``.

    Works on any params subtree (encoder, decoder, or the full
    ``{'encoder': ..., 'decoder': ...}`` dict). The norm axis is always
    the trailing axis of ``v`` in this codebase: conv ``[k, in, out]``
    (axis 2), conv2d ``[kh, kw, in, out]`` (axis 3), conv-transpose
    ``[k, out, in]`` (axis 2 — torch normalizes ConvTranspose per *input*
    channel, ops/conv.py:309-317).
    """
    if not isinstance(params, dict):
        return params
    if 'v' in params and 'g' in params:
        v, g = params['v'], params['g']
        kernel = _weight_norm_kernel(v, g, axis=v.ndim - 1)
        rest = {k: fold_weight_norm_params(val) for k, val in params.items()
                if k not in ('v', 'g')}
        return {'kernel': kernel, **rest}
    return {k: fold_weight_norm_params(v) for k, v in params.items()}


def fold_weight_norm(model: EncodecModel, variables: Dict[str, Any],
                     ) -> Tuple[EncodecModel, Dict[str, Any]]:
    """(model, variables) → equivalent ``norm='none'`` model + folded vars.

    Only valid for ``weight_norm`` models (the 24 kHz family); the 48 kHz
    ``time_group_norm`` family has data-dependent normalization that
    cannot fold.
    """
    if model.encoder.norm != 'weight_norm':
        raise ValueError(
            f"fold_weight_norm requires a weight_norm model, got "
            f"'{model.encoder.norm}'")
    folded = EncodecModel(
        encoder=model.encoder.clone(norm='none'),
        decoder=model.decoder.clone(norm='none'),
        quantizer=model.quantizer,
        target_bandwidths=model.target_bandwidths,
        sample_rate=model.sample_rate,
        channels=model.channels,
        normalize=model.normalize,
        segment=model.segment,
        overlap=model.overlap,
        # keep the name: it rides in the ECDC wire header (binary.py), and
        # the folded model is the same codec — streams must interchange
        name=model.name)
    if model.bandwidth is not None:
        folded.set_target_bandwidth(model.bandwidth)
    out = {'params': fold_weight_norm_params(variables['params'])}
    if 'quantizer' in variables:
        out['quantizer'] = variables['quantizer']
    return folded, out


# ------------------------------------------------------------- int8


def _is_quantizable(key: str, leaf) -> bool:
    if getattr(leaf, 'ndim', 0) < 2:
        return False
    return key in _Q_KEYS or any(key.startswith(p) for p in _Q_LSTM_KEYS)


def quantize_weights(params: Dict[str, Any]) -> Dict[str, Any]:
    """Folded params → same tree with weight matrices as
    ``{'q8': int8, 'scale': f32[out]}`` (symmetric per-trailing-channel).
    """
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif _is_quantizable(k, v):
                w = jnp.asarray(v, jnp.float32)
                amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
                scale = jnp.where(amax > 0, amax, 1.0) / 127.0
                q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
                out[k] = {'q8': q, 'scale': scale}
            else:
                out[k] = v
        return out
    return walk(params)


def dequantize_weights(qparams: Dict[str, Any],
                       dtype=jnp.float32) -> Dict[str, Any]:
    """Inverse of :func:`quantize_weights` (jit-traceable — runs on device
    inside the serving program so HBM holds int8)."""
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if set(tree.keys()) == {'q8', 'scale'}:
            return (tree['q8'].astype(dtype) * tree['scale'].astype(dtype))
        return {k: walk(v) for k, v in tree.items()}
    return walk(qparams)


def param_bytes(tree) -> int:
    """Total bytes of all array leaves (serving-memory accounting)."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(tree)
               if hasattr(leaf, 'dtype'))


# ------------------------------------------------------------- serving API


def prepare_for_inference(model: EncodecModel, variables: Dict[str, Any],
                          weights: str = 'fold',
                          ) -> Tuple[EncodecModel, Dict[str, Any]]:
    """One-call serving prep. ``weights``:

    - ``'fold'`` — fold weight norm, keep f32 weights (bit-equal math).
    - ``'int8'`` — fold + int8 weight-only quantization; the returned
      variables hold int8 tensors and must go through
      :func:`quantized_call` (or a manual ``dequantize_weights``).
    """
    folded, fvars = fold_weight_norm(model, variables)
    if weights == 'fold':
        return folded, fvars
    if weights == 'int8':
        fvars = dict(fvars, params=quantize_weights(fvars['params']))
        return folded, fvars
    raise ValueError(f"unknown weights mode '{weights}'")


def quantized_call(model: EncodecModel, qvariables: Dict[str, Any],
                   x: jnp.ndarray,
                   dtype: Optional[Any] = None) -> jnp.ndarray:
    """Eval forward with int8 weights living in HBM: one jitted program
    doing dequantize → encode → quantize → decode. ``dtype`` sets the
    dequantized weight dtype (defaults to the model's compute dtype)."""
    dtype = dtype or getattr(model.encoder, 'dtype', jnp.float32)
    cache = model.__dict__.setdefault('_q8_cache', {})
    # the forward reads model.bandwidth at TRACE time (it selects n_q), so
    # the compiled program must be keyed on it — a dtype-only cache would
    # silently serve the first bandwidth forever after set_target_bandwidth
    fn = cache.get((dtype, model.bandwidth))
    if fn is None:
        def _fn(qvars, x):
            vars_ = dict(qvars,
                         params=dequantize_weights(qvars['params'], dtype))
            return model(vars_, x)
        fn = jax.jit(_fn)
        cache[(dtype, model.bandwidth)] = fn
    return fn(qvariables, x)
