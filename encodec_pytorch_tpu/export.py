"""JAX → torch checkpoint export — the exact inverse of ``convert.py``.

``convert.py`` lets this framework consume the reference's torch
checkpoints; this module closes the loop the other way: a model trained
here can be handed back to the reference torch runtime for CPU/GPU
deployment. The exported state dict loads **strict** into the reference's
``EncodecModel`` (reference model.py:270-368) and
``MultiScaleSTFTDiscriminator`` (reference msstftd.py:108-149), and the
trainer-style wrapper reproduces the checkpoint layout the reference
trainer writes (reference utils.py:142-148, ``{'model_state_dict': ...}``
with the quantizer under ``quantizer.model``) so the reference's
``my_encodec_model`` / ``encodec_model_bw`` factories (model.py:332-368)
consume it unchanged.

Inverse-mapping notes:

- Weight norm: our explicit ``v``/``g`` decomposition maps back to torch's
  ``weight_v`` [out, ...] / ``weight_g`` [out, 1, ...] (``dim=0``).
- LSTM: torch keeps two bias vectors per layer whose *sum* enters the cell
  math; our fused bias ``b = bias_ih + bias_hh`` is exported as
  ``bias_ih_l{j} = b``, ``bias_hh_l{j} = 0`` — numerically identical,
  byte-different from an original torch checkpoint (the split is not
  recoverable, and torch itself never distinguishes the halves).
- Discriminator: torchaudio's ``Spectrogram`` registers a ``window``
  buffer per scale (``discriminators.{i}.spec_transform.window``); strict
  loading needs those keys, so they are synthesized from the same periodic
  hann the reference uses (msstftd.py:62-64).

All leaves are materialized on host as float32 (bf16 training keeps f32
master weights; any bf16 leaf is upcast).
"""

from typing import Any, Dict

import numpy as np

__all__ = [
    'seanet_state_dict', 'rvq_state_dict', 'model_state_dict',
    'msstftd_state_dict', 'lm_state_dict', 'save_torch_checkpoint',
    'save_torch_disc',
]


def _np(v) -> np.ndarray:
    """Leaf → contiguous, writable float32 numpy on host (device_get can
    hand back read-only views, which torch.from_numpy warns about)."""
    import jax
    return np.array(jax.device_get(v), np.float32, copy=True, order='C')


# ----------------------------------------------------------- tensor inverses

def conv1d_weight_to_torch(w) -> np.ndarray:
    """JAX WIO ``[k, in, out]`` → torch Conv1d ``[out, in, k]``."""
    return np.ascontiguousarray(np.transpose(_np(w), (2, 1, 0)))


def convtr1d_weight_to_torch(w) -> np.ndarray:
    """JAX ``[k, out, in]`` → torch ConvTranspose1d ``[in, out, k]``."""
    return np.ascontiguousarray(np.transpose(_np(w), (2, 1, 0)))


def conv2d_weight_to_torch(w) -> np.ndarray:
    """JAX HWIO ``[kh, kw, in, out]`` → torch Conv2d ``[out, in, kh, kw]``."""
    return np.ascontiguousarray(np.transpose(_np(w), (3, 2, 0, 1)))


# ------------------------------------------------------------ SEANet modules

def _emit_wn_conv(sd: Dict[str, np.ndarray], prefix: str, tree: Dict,
                  sub: str, to_torch):
    """Shared emitter for both conv flavors: our Norm(Conv/ConvTranspose)1d
    subtree → torch keys under ``{prefix}.{sub}`` (+ ``{prefix}.norm.*``).

    ``sub``/``to_torch``: ('conv', conv1d_weight_to_torch) for SConv1d,
    ('convtr', convtr1d_weight_to_torch) for SConvTranspose1d. The
    ``g.reshape(-1, 1, 1)`` covers both: torch ``weight_norm(dim=0)``
    norms Conv1d per output channel and the ``[in, out, k]``
    transposed-conv weight per *input* channel — in each case the leading
    axis of the torch weight, and our ``g`` holds exactly those values.
    """
    known = {'v', 'g', 'kernel', 'bias', 'GroupNorm_0'}
    unknown = set(tree) - known
    if unknown:
        raise ValueError(f'cannot export {sub} leaves {sorted(unknown)} at '
                         f'{prefix} (only weight_norm / plain / '
                         f'time_group_norm flavors map to reference keys)')
    if 'v' in tree:
        sd[f'{prefix}.{sub}.weight_g'] = _np(tree['g']).reshape(-1, 1, 1)
        sd[f'{prefix}.{sub}.weight_v'] = to_torch(tree['v'])
    if 'kernel' in tree:
        sd[f'{prefix}.{sub}.weight'] = to_torch(tree['kernel'])
    if 'bias' in tree:
        sd[f'{prefix}.{sub}.bias'] = _np(tree['bias'])
    if 'GroupNorm_0' in tree:
        sd[f'{prefix}.norm.weight'] = _np(tree['GroupNorm_0']['scale'])
        sd[f'{prefix}.norm.bias'] = _np(tree['GroupNorm_0']['bias'])


def _emit_norm_conv1d(sd: Dict[str, np.ndarray], prefix: str, tree: Dict):
    _emit_wn_conv(sd, prefix, tree, 'conv', conv1d_weight_to_torch)


def _emit_convtr(sd: Dict[str, np.ndarray], prefix: str, tree: Dict):
    _emit_wn_conv(sd, prefix, tree, 'convtr', convtr1d_weight_to_torch)


def _emit_lstm(sd: Dict[str, np.ndarray], prefix: str, tree: Dict):
    layer = 0
    while f'w_ih_l{layer}' in tree:
        b = _np(tree[f'b_l{layer}'])
        sd[f'{prefix}.weight_ih_l{layer}'] = np.ascontiguousarray(
            _np(tree[f'w_ih_l{layer}']).T)
        sd[f'{prefix}.weight_hh_l{layer}'] = np.ascontiguousarray(
            _np(tree[f'w_hh_l{layer}']).T)
        sd[f'{prefix}.bias_ih_l{layer}'] = b
        sd[f'{prefix}.bias_hh_l{layer}'] = np.zeros_like(b)
        layer += 1
    if layer == 0:
        raise ValueError(f'no LSTM layers found at {prefix}')


def _emit_seanet_layer(sd: Dict[str, np.ndarray], prefix: str, tree: Dict):
    keys = set(tree)
    if 'conv' in keys:                       # SConv1d wrapper
        assert keys == {'conv'}, (prefix, keys)
        _emit_norm_conv1d(sd, f'{prefix}.conv', tree['conv'])
    elif any(k.startswith('w_ih_l') for k in keys):   # SLSTM
        _emit_lstm(sd, f'{prefix}.lstm', tree)
    elif 'v' in keys or 'kernel' in keys:    # SConvTranspose1d
        _emit_convtr(sd, f'{prefix}.convtr', tree)
    elif keys and all(k.startswith('block_') or k == 'shortcut'
                      for k in keys):        # SEANetResnetBlock
        for k in keys:
            sub = (f'{prefix}.shortcut' if k == 'shortcut'
                   else f"{prefix}.block.{k.split('_')[1]}")
            _emit_seanet_layer(sd, sub, tree[k])
    else:
        raise ValueError(f'unrecognized SEANet subtree at {prefix}: '
                         f'{sorted(keys)}')


def seanet_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our SEANetEncoder/Decoder flax param tree → torch ``state_dict``
    with keys rooted at ``model.{i}...`` — the inverse of
    ``convert.seanet_params_from_torch``."""
    sd: Dict[str, np.ndarray] = {}
    for lname in sorted(params, key=lambda s: int(s.split('_')[1])):
        _emit_seanet_layer(sd, f"model.{lname.split('_')[1]}", params[lname])
    return sd


# -------------------------------------------------------------------- RVQ

def rvq_state_dict(state) -> Dict[str, np.ndarray]:
    """CodebookState (stage-stacked arrays) → torch RVQ buffer keys
    ``layers.{k}._codebook.{inited,cluster_size,embed,embed_avg}`` —
    the inverse of ``convert.rvq_state_from_torch``. ``inited`` is the
    shape-``[1]`` float buffer the reference registers
    (reference quantization/core_vq.py:141-144)."""
    sd: Dict[str, np.ndarray] = {}
    n_q = int(np.asarray(state.embed).shape[0])
    for k in range(n_q):
        p = f'layers.{k}._codebook'
        sd[f'{p}.inited'] = _np(state.inited[k]).reshape(1)
        sd[f'{p}.cluster_size'] = _np(state.cluster_size[k])
        sd[f'{p}.embed'] = _np(state.embed[k])
        sd[f'{p}.embed_avg'] = _np(state.embed_avg[k])
    return sd


# ------------------------------------------------------------- full model

def model_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our EncodecModel variables tree → the reference's flat torch
    ``state_dict`` (released-checkpoint key layout: ``encoder.model...``,
    ``decoder.model...``, ``quantizer.vq.layers...``)."""
    sd: Dict[str, np.ndarray] = {}
    for k, v in seanet_state_dict(variables['params']['encoder']).items():
        sd[f'encoder.{k}'] = v
    for k, v in seanet_state_dict(variables['params']['decoder']).items():
        sd[f'decoder.{k}'] = v
    for k, v in rvq_state_dict(variables['quantizer']).items():
        sd[f'quantizer.vq.{k}'] = v
    return sd


# ------------------------------------------------------------- entropy LM

def lm_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our LMModel flax param tree → the reference torch LMModel
    ``state_dict`` (reference model.py:27-65 key naming) — the inverse of
    ``models.lm.lm_params_from_torch``. Lets an entropy LM trained here
    (train/lm_trainer.py — a capability the reference lacks) be deployed
    by the reference's ``get_lm_model`` runtime."""
    sd: Dict[str, np.ndarray] = {}
    for name, tree in params.items():
        if name.startswith('emb_'):
            sd[f"emb.{name.split('_')[1]}.weight"] = _np(tree['embedding'])
        elif name.startswith('linear_'):
            k = name.split('_')[1]
            sd[f'linears.{k}.weight'] = np.ascontiguousarray(
                _np(tree['kernel']).T)
            sd[f'linears.{k}.bias'] = _np(tree['bias'])
        elif name == 'transformer':
            for lname, ltree in tree.items():
                if lname == 'norm_in':
                    sd['transformer.norm_in.weight'] = _np(ltree['scale'])
                    sd['transformer.norm_in.bias'] = _np(ltree['bias'])
                    continue
                i = lname.split('_')[1]
                p = f'transformer.layers.{i}'
                attn = ltree['self_attn']
                sd[f'{p}.self_attn.in_proj_weight'] = (
                    _np(attn['in_proj_weight']))
                sd[f'{p}.self_attn.in_proj_bias'] = _np(attn['in_proj_bias'])
                sd[f'{p}.self_attn.out_proj.weight'] = (
                    _np(attn['out_proj_weight']))
                sd[f'{p}.self_attn.out_proj.bias'] = (
                    _np(attn['out_proj_bias']))
                for ff in ('linear1', 'linear2'):
                    sd[f'{p}.{ff}.weight'] = np.ascontiguousarray(
                        _np(ltree[ff]['kernel']).T)
                    sd[f'{p}.{ff}.bias'] = _np(ltree[ff]['bias'])
                for nn_ in ('norm1', 'norm2'):
                    sd[f'{p}.{nn_}.weight'] = _np(ltree[nn_]['scale'])
                    sd[f'{p}.{nn_}.bias'] = _np(ltree[nn_]['bias'])
        else:
            raise ValueError(f'unrecognized LM subtree {name}')
    return sd


# ----------------------------------------------------------- discriminator

def msstftd_state_dict(params: Dict[str, Any],
                       win_lengths=(1024, 2048, 512)) -> Dict[str, np.ndarray]:
    """Our MultiScaleSTFTDiscriminator param tree → the reference torch
    ``state_dict`` (keys ``discriminators.{i}.convs.{j}.conv.*`` /
    ``conv_post.conv.*``), inverse of ``convert.msstftd_params_from_torch``.

    ``win_lengths`` (one per scale, reference msstftd.py:116) synthesizes
    the ``spec_transform.window`` hann buffers torchaudio registers —
    required for strict loading."""
    from .ops.stft import hann_window

    sd: Dict[str, np.ndarray] = {}
    scales = sorted(params, key=lambda s: int(s.split('_')[1]))
    assert len(scales) == len(win_lengths), (scales, win_lengths)
    for sname in scales:
        i = sname.split('_')[1]
        sd[f'discriminators.{i}.spec_transform.window'] = (
            hann_window(int(win_lengths[int(i)])).astype(np.float32))
        for cname, ctree in params[sname].items():
            prefix = (f'discriminators.{i}.conv_post' if cname == 'conv_post'
                      else f"discriminators.{i}.convs.{cname.split('_')[1]}")
            known = {'v', 'g', 'kernel', 'bias'}
            unknown = set(ctree) - known
            if unknown:
                raise ValueError(f'cannot export disc conv leaves '
                                 f'{sorted(unknown)} at {prefix}')
            if 'v' in ctree:
                sd[f'{prefix}.conv.weight_g'] = (
                    _np(ctree['g']).reshape(-1, 1, 1, 1))
                sd[f'{prefix}.conv.weight_v'] = (
                    conv2d_weight_to_torch(ctree['v']))
            if 'kernel' in ctree:
                sd[f'{prefix}.conv.weight'] = (
                    conv2d_weight_to_torch(ctree['kernel']))
            if 'bias' in ctree:
                sd[f'{prefix}.conv.bias'] = _np(ctree['bias'])
    return sd


# ------------------------------------------------------------------ writers

def _to_torch(sd: Dict[str, np.ndarray]):
    import torch
    return {k: torch.from_numpy(v) for k, v in sd.items()}


def _checksum_rename(path: str) -> str:
    """Rename ``name.th`` → ``name-{sha256[:8]}.th`` so the reference's
    filename-embedded checksum check (model.py:281-284) passes."""
    import hashlib
    import os

    sha = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            sha.update(chunk)
    stem, ext = os.path.splitext(path)
    new = f'{stem}-{sha.hexdigest()[:8]}{ext}'
    os.replace(path, new)
    return new


def save_torch_checkpoint(variables: Dict[str, Any], path: str,
                          style: str = 'released', epoch: int = 0,
                          add_checksum: bool = False) -> str:
    """Write a reference-loadable torch checkpoint; returns the final path.

    ``style='released'``: the flat state dict ``torch.load`` of a released
    ``encodec_{24,48}khz*.th`` yields (reference model.py:286,306-307);
    with ``add_checksum=True`` the file is renamed to embed the sha256
    prefix the reference verifies when loading from a local repository
    (model.py:281-284).

    ``style='trainer'``: the nested ``{'epoch', 'model_state_dict'}`` layout
    the reference trainer writes (utils.py:142-148), with the quantizer
    keyed ``quantizer.model`` so ``my_encodec_model`` / ``encodec_model_bw``
    apply their usual remap (model.py:346-347,366-367).
    """
    import torch

    tens = _to_torch(model_state_dict(variables))
    if style == 'released':
        obj: Any = tens
    elif style == 'trainer':
        obj = {'epoch': int(epoch),
               'model_state_dict': {
                   k.replace('quantizer.vq.', 'quantizer.model.'): v
                   for k, v in tens.items()}}
    else:
        raise ValueError(f"style must be 'released' or 'trainer', got {style!r}")
    torch.save(obj, path)
    return _checksum_rename(path) if add_checksum else path


def save_torch_disc(params: Dict[str, Any], path: str,
                    win_lengths=(1024, 2048, 512), epoch: int = 0) -> str:
    """Write the discriminator as ``{'epoch', 'model_state_dict'}`` — the
    layout the reference trainer writes for its disc checkpoints via
    ``save_master_checkpoint`` (utils.py:132-148, train_multi_gpu.py:350),
    minus the torch-specific optimizer/scheduler states."""
    import torch

    obj = {'epoch': int(epoch),
           'model_state_dict': _to_torch(msstftd_state_dict(params,
                                                            win_lengths))}
    torch.save(obj, path)
    return path
