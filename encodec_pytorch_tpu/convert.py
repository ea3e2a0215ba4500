"""Torch checkpoint → JAX parameter conversion.

This is the numeric-parity keystone (SURVEY.md §7 hard part #1): weight-norm
parametrization (``weight_v``/``weight_g``), LSTM gate ordering (torch i,f,g,o
— preserved by our layout), conv kernel layout flips, and the
``quantizer.model → quantizer.vq`` key remap used by local training
checkpoints (reference model.py:347,366).

Low-level tensor converters below take numpy arrays (call ``.numpy()`` on
torch tensors first — torch is only imported lazily by the state-dict loader
so the core package has no torch dependency).
"""

from typing import Any, Dict

import numpy as np


# ---------------------------------------------------------------- low level

def conv1d_weight(w: np.ndarray) -> np.ndarray:
    """torch Conv1d ``[out, in, k]`` → JAX WIO ``[k, in, out]``."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def conv1d_wn(weight_v: np.ndarray, weight_g: np.ndarray):
    """torch weight-normed Conv1d → ``(v [k, in, out], g [1, 1, out])``."""
    return conv1d_weight(weight_v), np.ascontiguousarray(weight_g.reshape(1, 1, -1))


def convtr1d_weight(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d ``[in, out, k]`` → ``[k, out, in]``."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def convtr1d_wn(weight_v: np.ndarray, weight_g: np.ndarray):
    """torch weight-normed ConvTranspose1d → ``(v [k, out, in], g [1, 1, in])``.

    torch weight_norm(dim=0) on a ``[in, out, k]`` weight keeps the norm per
    *input* channel — mirrored by our SConvTranspose1d.
    """
    return convtr1d_weight(weight_v), np.ascontiguousarray(weight_g.reshape(1, 1, -1))


def conv2d_weight(w: np.ndarray) -> np.ndarray:
    """torch Conv2d ``[out, in, kh, kw]`` → JAX HWIO ``[kh, kw, in, out]``."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv2d_wn(weight_v: np.ndarray, weight_g: np.ndarray):
    return conv2d_weight(weight_v), np.ascontiguousarray(weight_g.reshape(1, 1, 1, -1))


def linear_weight(w: np.ndarray) -> np.ndarray:
    """torch Linear ``[out, in]`` → ``[in, out]``."""
    return np.ascontiguousarray(np.transpose(w))


def lstm_layer(weight_ih: np.ndarray, weight_hh: np.ndarray,
               bias_ih: np.ndarray, bias_hh: np.ndarray):
    """torch LSTM layer → ``(w_ih [in, 4H], w_hh [H, 4H], b [4H])``.

    Gate order (i, f, g, o) is preserved — both layouts concatenate gates on
    the 4H axis in torch order.
    """
    return (np.ascontiguousarray(weight_ih.T),
            np.ascontiguousarray(weight_hh.T),
            bias_ih + bias_hh)


def remap_local_checkpoint_keys(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Local training checkpoints use ``quantizer.model``; released ones use
    ``quantizer.vq`` (reference model.py:347)."""
    return {k.replace('quantizer.model', 'quantizer.vq'): v
            for k, v in state_dict.items()}
