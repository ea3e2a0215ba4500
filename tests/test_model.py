"""EncodecModel assembly: eval round-trip parity vs a torch-side assembly of
the reference modules, plus training-forward behavior."""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from encodec_pytorch_tpu.models.model import EncodecModel, variables_from_torch_state_dict

REF = '/root/reference'


def _ref_parts(causal, norm, sample_rate, channels, n_q):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import modules as ref_m
    from quantization.vq import ResidualVectorQuantizer as RefRVQ
    torch.manual_seed(0)
    enc = ref_m.SEANetEncoder(channels=channels, norm=norm, causal=causal)
    dec = ref_m.SEANetDecoder(channels=channels, norm=norm, causal=causal)
    rvq = RefRVQ(dimension=enc.dimension, n_q=n_q, bins=1024)
    # randomize codebooks (kmeans-init leaves them zero)
    for layer in rvq.vq.layers:
        cb = layer._codebook
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed)
        cb.inited.fill_(1)
        cb.cluster_size.fill_(1.0)
    enc.eval(), dec.eval(), rvq.eval()
    return enc, dec, rvq


def _torch_eval_roundtrip(enc, dec, rvq, x, frame_rate, bandwidth, normalize,
                          segment_length, stride):
    """Reference eval glue (model.py:122-213) on torch modules."""
    outs = []
    length = x.shape[-1]
    seg = segment_length or length
    st = stride or length
    frames = []
    with torch.no_grad():
        for off in range(0, length, st):
            frame = x[:, :, off:off + seg]
            if normalize:
                mono = frame.mean(dim=1, keepdim=True)
                volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
                scale = 1e-8 + volume
                frame = frame / scale
                scale = scale.view(-1, 1)
            else:
                scale = None
            emb = enc(frame)
            codes = rvq.encode(emb, frame_rate, bandwidth).transpose(0, 1)
            frames.append((codes, scale))
        for codes, scale in frames:
            emb = rvq.decode(codes.transpose(0, 1))
            out = dec(emb)
            if scale is not None:
                out = out * scale.view(-1, 1, 1)
            outs.append(out)
    if len(outs) == 1:
        return outs[0][:, :, :length], frames
    # triangular overlap add (utils.py:22-61)
    total = st * (len(outs) - 1) + outs[-1].shape[-1]
    fl = outs[0].shape[-1]
    t = torch.linspace(0, 1, fl + 2)[1:-1]
    weight = 0.5 - (t - 0.5).abs()
    sum_w = torch.zeros(total)
    acc = torch.zeros(*outs[0].shape[:-1], total)
    off = 0
    for frame in outs:
        fl = frame.shape[-1]
        acc[..., off:off + fl] += weight[:fl] * frame
        sum_w[off:off + fl] += weight[:fl]
        off += st
    return (acc / sum_w)[:, :, :length], frames


def _build_jax_model(enc, dec, rvq, causal, norm, sample_rate, channels,
                     normalize, segment, bandwidths):
    model = EncodecModel._get_model(
        bandwidths, sample_rate, channels, causal=causal, model_norm=norm,
        audio_normalize=normalize, segment=segment, n_q=rvq.n_q)
    sd = {}
    for prefix, mod in [('encoder', enc), ('decoder', dec)]:
        for k, v in mod.state_dict().items():
            sd[f'{prefix}.{k}'] = v.detach().numpy()
    for k, v in rvq.state_dict().items():
        sd[f'quantizer.{k}'] = v.detach().numpy()
    variables = variables_from_torch_state_dict(model, sd)
    return model, variables


def test_eval_roundtrip_parity_24k_style():
    enc, dec, rvq = _ref_parts(True, 'weight_norm', 24000, 1, n_q=8)
    model, variables = _build_jax_model(
        enc, dec, rvq, True, 'weight_norm', 24000, 1, False, None,
        [1.5, 3., 6.])
    model.set_target_bandwidth(6.)
    x = torch.randn(1, 1, 4800)
    ref, ref_frames = _torch_eval_roundtrip(
        enc, dec, rvq, x, model.frame_rate, 6., False, None, None)
    frames = model.encode(variables, jnp.asarray(x.numpy()))
    np.testing.assert_array_equal(np.asarray(frames[0][0]),
                                  ref_frames[0][0].numpy())
    out = model(variables, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4, rtol=1e-4)


def test_eval_roundtrip_parity_segmented_normalized():
    # 48k-style: segments + overlap-add + volume normalization (on a small
    # mono net to keep the test fast)
    enc, dec, rvq = _ref_parts(False, 'time_group_norm', 24000, 1, n_q=4)
    model, variables = _build_jax_model(
        enc, dec, rvq, False, 'time_group_norm', 24000, 1, True, 0.1, [3.])
    model.set_target_bandwidth(3.)
    x = torch.randn(1, 1, 24 * 250)  # 2.5 segments
    ref, ref_frames = _torch_eval_roundtrip(
        enc, dec, rvq, x, model.frame_rate, 3., True,
        model.segment_length, model.segment_stride)
    frames = model.encode(variables, jnp.asarray(x.numpy()))
    assert len(frames) == len(ref_frames)
    for (c, s), (rc, rs) in zip(frames, ref_frames):
        np.testing.assert_array_equal(np.asarray(c), rc.numpy())
        np.testing.assert_allclose(np.asarray(s), rs.numpy(), atol=1e-6)
    out = model(variables, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4, rtol=1e-4)


def test_training_forward_shapes_and_state_update():
    model = EncodecModel._get_model([1.5, 3., 6.], 24000, 1, causal=True,
                                    model_norm='weight_norm', n_q=8)
    variables = model.init(jax.random.PRNGKey(0), example_length=1200)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1200))
    out, loss_w, new_state = model.forward_train(variables, x,
                                                 jax.random.PRNGKey(2))
    assert out.shape == x.shape
    assert float(loss_w) >= 0.0
    # kmeans init must have run for the selected stages
    assert float(new_state.inited.sum()) >= 1.0
    # jit-ability of the whole training forward
    jitted = jax.jit(lambda v, x, k: model.forward_train(v, x, k))
    out2, _, _ = jitted(variables, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_default_n_q_formula():
    # model.py:258 → 32 codebooks for 24 kHz / bw 24
    model = EncodecModel._get_model([1.5, 3., 6., 12., 24.], 24000, 1)
    assert model.quantizer.n_q == 32
    assert model.frame_rate == 75
    np.testing.assert_array_equal(model.n_q_for_bandwidth_index(),
                                  [2, 4, 8, 16, 32])
