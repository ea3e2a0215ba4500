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


# ------------------------------------------------------------- module trees

def _set_path(tree: Dict[str, Any], path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def seanet_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a torch SEANetEncoder/Decoder ``state_dict`` (keys starting at
    ``model.{i}...``) into the flax param tree of our SEANetEncoder/Decoder.

    Handles SConv1d (``conv.conv.*``), SConvTranspose1d (``convtr.convtr.*``),
    GroupNorm wrappers (``conv.norm.*`` / ``convtr.norm.*``), resnet blocks
    (``block.{k}.*`` / ``shortcut.*``) and SLSTM (``lstm.weight_*_l{j}``).
    """
    params: Dict[str, Any] = {}
    lstm_parts: Dict[tuple, Dict[str, np.ndarray]] = {}

    for key, val in sd.items():
        v = np.asarray(val)
        toks = key.split('.')
        assert toks[0] == 'model', key
        path = [f'layer_{toks[1]}']
        toks = toks[2:]
        # resnet block internals
        while toks and toks[0] in ('block', 'shortcut'):
            if toks[0] == 'block':
                path.append(f'block_{toks[1]}')
                toks = toks[2:]
            else:
                path.append('shortcut')
                toks = toks[1:]
        if not toks:
            raise ValueError(f'unparsed key {key}')
        head = toks[0]
        if head == 'conv':
            # SConv1d -> NormConv1d child named 'conv'
            assert toks[1] in ('conv', 'norm'), key
            if toks[1] == 'conv':
                leaf = toks[2]
                if leaf == 'weight_v':
                    _set_path(params, path + ['conv', 'v'], conv1d_weight(v))
                elif leaf == 'weight_g':
                    _set_path(params, path + ['conv', 'g'], v.reshape(1, 1, -1))
                elif leaf == 'weight':
                    _set_path(params, path + ['conv', 'kernel'], conv1d_weight(v))
                elif leaf == 'bias':
                    _set_path(params, path + ['conv', 'bias'], v)
                else:
                    raise ValueError(f'unparsed key {key}')
            else:  # norm (GroupNorm)
                leaf = {'weight': 'scale', 'bias': 'bias'}[toks[2]]
                _set_path(params, path + ['conv', 'GroupNorm_0', leaf], v)
        elif head == 'convtr':
            assert toks[1] in ('convtr', 'norm'), key
            if toks[1] == 'convtr':
                leaf = toks[2]
                if leaf == 'weight_v':
                    _set_path(params, path + ['v'], convtr1d_weight(v))
                elif leaf == 'weight_g':
                    _set_path(params, path + ['g'], v.reshape(1, 1, -1))
                elif leaf == 'weight':
                    _set_path(params, path + ['kernel'], convtr1d_weight(v))
                elif leaf == 'bias':
                    _set_path(params, path + ['bias'], v)
                else:
                    raise ValueError(f'unparsed key {key}')
            else:
                leaf = {'weight': 'scale', 'bias': 'bias'}[toks[2]]
                _set_path(params, path + ['GroupNorm_0', leaf], v)
        elif head == 'lstm':
            # collect, combine biases at the end
            name = toks[1]  # e.g. weight_ih_l0
            lstm_parts.setdefault(tuple(path), {})[name] = v
        else:
            raise ValueError(f'unparsed key {key}')

    for path, parts in lstm_parts.items():
        layer = 0
        while f'weight_ih_l{layer}' in parts:
            w_ih, w_hh, b = lstm_layer(parts[f'weight_ih_l{layer}'],
                                       parts[f'weight_hh_l{layer}'],
                                       parts[f'bias_ih_l{layer}'],
                                       parts[f'bias_hh_l{layer}'])
            _set_path(params, list(path) + [f'w_ih_l{layer}'], w_ih)
            _set_path(params, list(path) + [f'w_hh_l{layer}'], w_hh)
            _set_path(params, list(path) + [f'b_l{layer}'], b)
            layer += 1
    return params


def msstftd_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a torch MultiScaleSTFTDiscriminator ``state_dict``
    (reference msstftd.py:108-149; keys ``discriminators.{i}.convs.{j}.conv.*``
    and ``discriminators.{i}.conv_post.conv.*``) into our flax param tree
    (``disc_{i}/conv_{j}`` and ``disc_{i}/conv_post``).

    The entry conv (j=0) is un-normed (plain ``weight``) matching the
    reference default; the rest are weight-normed (``weight_v``/``weight_g``).
    """
    params: Dict[str, Any] = {}
    for key, val in sd.items():
        v = np.asarray(val)
        toks = key.split('.')
        assert toks[0] == 'discriminators', key
        scale = f'disc_{toks[1]}'
        if toks[2] == 'spec_transform':
            continue  # STFT window buffer — not a parameter
        if toks[2] == 'convs':
            name = f'conv_{toks[3]}'
            assert toks[4] == 'conv', key
            leaf = toks[5]
        else:
            assert toks[2] == 'conv_post', key
            name = 'conv_post'
            assert toks[3] == 'conv', key
            leaf = toks[4]
        if leaf == 'weight_v':
            _set_path(params, [scale, name, 'v'], conv2d_weight(v))
        elif leaf == 'weight_g':
            _set_path(params, [scale, name, 'g'], v.reshape(1, 1, 1, -1))
        elif leaf == 'weight':
            _set_path(params, [scale, name, 'kernel'], conv2d_weight(v))
        elif leaf == 'bias':
            _set_path(params, [scale, name, 'bias'], v)
        else:
            raise ValueError(f'unparsed key {key}')
    return params


def rvq_state_from_torch(sd: Dict[str, np.ndarray], n_q: int):
    """Convert torch RVQ buffers (``layers.{k}._codebook.{inited,cluster_size,
    embed,embed_avg}``) into stacked CodebookState arrays.

    Returns a dict with keys inited/cluster_size/embed/embed_avg (stacked over
    stages); wrap with ``CodebookState(**out)``.
    """
    def get(k, name):
        return np.asarray(sd[f'layers.{k}._codebook.{name}'])

    return dict(
        inited=np.stack([get(k, 'inited').reshape(()) for k in range(n_q)]).astype(np.float32),
        cluster_size=np.stack([get(k, 'cluster_size') for k in range(n_q)]),
        embed=np.stack([get(k, 'embed') for k in range(n_q)]),
        embed_avg=np.stack([get(k, 'embed_avg') for k in range(n_q)]),
    )


def remap_local_checkpoint_keys(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Local training checkpoints use ``quantizer.model``; released ones use
    ``quantizer.vq`` (reference model.py:347)."""
    return {k.replace('quantizer.model', 'quantizer.vq'): v
            for k, v in state_dict.items()}
