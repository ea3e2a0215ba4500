"""EnCodec model assembly — TPU-native rebuild of /root/reference/model.py.

``EncodecModel`` is a *stateless* description (architecture + codec policy);
all parameters and codebook state live in an explicit ``variables`` pytree:

    variables = {
        'params': {'encoder': ..., 'decoder': ...},   # flax param trees
        'quantizer': CodebookState,                    # RVQ EMA buffers
    }

API layout matches the reference at the boundary (wav ``[B, C, T]``, codes
``[B, K, T]``); compute is channels-last internally. Eval encode/decode are
jitted per (shape, n_q) via jax.jit's cache.
"""

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quantization.core_vq import rvq_decode, rvq_encode
from ..quantization.vq import ResidualVectorQuantizer
from ..utils import linear_overlap_add
from .seanet import SEANetDecoder, SEANetEncoder

# (codes [B, K, T] | training: emb [B, T, D], scale [B, 1] or None)
EncodedFrame = Tuple[jnp.ndarray, Optional[jnp.ndarray]]


class EncodecModel:
    """EnCodec operating on raw waveforms (reference model.py:68-240).

    Composes SEANetEncoder + ResidualVectorQuantizer + SEANetDecoder with
    segment windowing, per-segment volume normalization and triangular
    overlap-add on decode.
    """

    def __init__(self,
                 encoder: SEANetEncoder,
                 decoder: SEANetDecoder,
                 quantizer: ResidualVectorQuantizer,
                 target_bandwidths: Sequence[float],
                 sample_rate: int,
                 channels: int,
                 normalize: bool = False,
                 segment: Optional[float] = None,
                 overlap: float = 0.01,
                 name: str = 'unset'):
        self.bandwidth: Optional[float] = None
        self.target_bandwidths = list(target_bandwidths)
        self.encoder = encoder
        self.decoder = decoder
        self.quantizer = quantizer
        self.sample_rate = sample_rate
        self.channels = channels
        self.normalize = normalize
        self.segment = segment
        self.overlap = overlap
        # 75 Hz at 24 kHz (model.py:103)
        self.frame_rate = math.ceil(self.sample_rate / np.prod(self.encoder.ratios))
        self.name = name
        self.bits_per_codebook = int(math.log2(self.quantizer.bins))
        assert 2 ** self.bits_per_codebook == self.quantizer.bins, \
            "quantizer bins must be a power of 2."
        self._enc_apply = jax.jit(self.encoder.apply)
        self._dec_apply = jax.jit(self.decoder.apply)
        self._rvq_encode = jax.jit(self._rvq_encode_impl, static_argnums=2)
        self._rvq_decode = jax.jit(rvq_decode)

    @staticmethod
    def _rvq_encode_impl(state, emb, n_q):
        # fused Pallas nearest-code search on TPU, XLA scan elsewhere
        from ..ops import pallas_vq
        bins, dim = state.embed.shape[1], state.embed.shape[2]
        # concrete-shape guard: under jax.export shape polymorphism the
        # batch dim is symbolic and Pallas calls cannot serialize — take
        # the XLA scan path there (see tests/test_deploy.py)
        concrete = all(isinstance(d, int) for d in emb.shape)
        if (concrete and pallas_vq.available()
                and bins % 128 == 0 and dim % 128 == 0):
            return pallas_vq.rvq_encode_pallas(state, emb, n_q)
        return rvq_encode(state, emb, n_q)

    # ----------------------------------------------------------- properties

    @property
    def segment_length(self) -> Optional[int]:
        if self.segment is None:
            return None
        return int(self.segment * self.sample_rate)

    @property
    def segment_stride(self) -> Optional[int]:
        segment_length = self.segment_length
        if segment_length is None:
            return None
        return max(1, int((1 - self.overlap) * segment_length))

    # ----------------------------------------------------------------- init

    def init(self, key: jax.Array, example_length: int = 24000) -> Dict[str, Any]:
        """Initialize all parameters and the codebook state."""
        k_enc, k_dec, k_q = jax.random.split(key, 3)
        x = jnp.zeros((1, example_length, self.channels), jnp.float32)
        enc_params = self.encoder.init(k_enc, x)['params']
        t_latent = -(-example_length // self.encoder.hop_length)
        z = jnp.zeros((1, t_latent, self.quantizer.dimension), jnp.float32)
        dec_params = self.decoder.init(k_dec, z)['params']
        return {
            'params': {'encoder': enc_params, 'decoder': dec_params},
            'quantizer': self.quantizer.init_state(k_q),
        }

    # ----------------------------------------------------------- eval codec

    def set_target_bandwidth(self, bandwidth: float):
        if bandwidth not in self.target_bandwidths:
            raise ValueError(
                f"This model doesn't support the bandwidth {bandwidth}. "
                f"Select one of {self.target_bandwidths}.")
        self.bandwidth = bandwidth

    def _normalize_frame(self, x: jnp.ndarray):
        """Per-segment volume normalization (model.py:152-159). x: [B, C, T]."""
        if self.normalize:
            mono = jnp.mean(x, axis=1, keepdims=True)
            volume = jnp.sqrt(jnp.mean(jnp.square(mono), axis=2, keepdims=True))
            scale = 1e-8 + volume
            x = x / scale
            scale = scale.reshape(-1, 1)
        else:
            scale = None
        return x, scale

    def encode(self, variables, x: jnp.ndarray) -> List[EncodedFrame]:
        """[B, C, T] wav → list of (codes [B, K, T], scale) frames
        (model.py:122-168, eval path)."""
        assert x.ndim == 3
        _, channels, length = x.shape
        assert 0 < channels <= 2
        segment_length = self.segment_length
        if segment_length is None:
            segment_length = length
            stride = length
        else:
            stride = self.segment_stride

        encoded_frames: List[EncodedFrame] = []
        for offset in range(0, length, stride):
            frame = x[:, :, offset: offset + segment_length]
            encoded_frames.append(self._encode_frame(variables, frame))
        return encoded_frames

    def _encode_frame(self, variables, x: jnp.ndarray) -> EncodedFrame:
        length = x.shape[-1]
        duration = length / self.sample_rate
        assert self.segment is None or duration <= 1e-5 + self.segment
        x, scale = self._normalize_frame(x)
        emb = self._enc_apply({'params': variables['params']['encoder']},
                              jnp.swapaxes(x, 1, 2))
        n_q = self.quantizer.num_quantizers_for_bandwidth(
            self.frame_rate, self.bandwidth)
        codes = self._rvq_encode(variables['quantizer'], emb, n_q)  # [K, B, T]
        return jnp.transpose(codes, (1, 0, 2)), scale

    def decode(self, variables, encoded_frames: List[EncodedFrame]) -> jnp.ndarray:
        """Frames → waveform with triangular overlap-add (model.py:170-181)."""
        segment_length = self.segment_length
        if segment_length is None:
            assert len(encoded_frames) == 1
            return self._decode_frame(variables, encoded_frames[0])
        frames = [self._decode_frame(variables, frame)
                  for frame in encoded_frames]
        return linear_overlap_add(frames, self.segment_stride or 1)

    # ----------------------------------------------- segment-major batching

    def encode_segmajor(self, variables, x: jnp.ndarray) -> List[EncodedFrame]:
        """Same contract as :meth:`encode`, but all FULL-length segments run
        through ONE batched ``_encode_frame`` call ([B, C, T] windows →
        [B·S, C, L] on the batch axis), leaving at most the ragged tail
        segment(s) as separate calls.

        Why: the per-frame loop (reference model.py:109-120) unrolls into S
        independent per-segment subgraphs at trace time. At batch 1 XLA
        overlaps them (~1.8× cross-segment ILP on chip), but that overlap
        vanishes once the per-segment footprint grows with batch — measured
        on the 48 kHz family as B=4 aggregate throughput REGRESSING below
        B=1 (docs/PERF_NOTES.md "48 kHz stereo family on chip"). Flattening
        segments into the batch axis turns S small convolution subgraphs
        into one large one, which is how the MXU wants the work shaped.

        Numerics: each segment sees the identical math (per-segment
        normalization is already per-batch-item); only the batch dimension
        of the compiled program changes, so results match the per-frame
        path to XLA reduction-order fp noise (exact on most shapes — a code
        index could in principle flip on an exact argmin tie, the same
        caveat as serve-time length bucketing). The `.ecdc` compress path
        keeps calling :meth:`encode`.
        """
        assert x.ndim == 3
        B, channels, length = x.shape
        assert 0 < channels <= 2
        segment_length = self.segment_length
        if segment_length is None:
            return self.encode(variables, x)
        stride = self.segment_stride or 1
        offsets = list(range(0, length, stride))
        full = [o for o in offsets if o + segment_length <= length]
        tail = [o for o in offsets if o + segment_length > length]

        frames: List[EncodedFrame] = []
        if full:
            S = len(full)
            idx = np.asarray(full)[:, None] + np.arange(segment_length)[None, :]
            windows = x[:, :, idx]                       # [B, C, S, L]
            windows = jnp.transpose(windows, (0, 2, 1, 3)) \
                .reshape(B * S, channels, segment_length)
            codes, scale = self._encode_frame(variables, windows)
            codes = codes.reshape(B, S, *codes.shape[1:])   # [B, S, K, Tc]
            if scale is not None:
                scale = scale.reshape(B, S, *scale.shape[1:])
            for s in range(S):
                frames.append((codes[:, s],
                               scale[:, s] if scale is not None else None))
        for o in tail:   # ragged tail: shorter window, own (exact) subgraph
            frames.append(self._encode_frame(
                variables, x[:, :, o: o + segment_length]))
        return frames

    def decode_segmajor(self, variables,
                        encoded_frames: List[EncodedFrame]) -> jnp.ndarray:
        """Same contract as :meth:`decode`, with every run of equal-length
        frames decoded in ONE batched ``_decode_frame`` call (see
        :meth:`encode_segmajor`). Frame order is preserved for the
        triangular overlap-add."""
        segment_length = self.segment_length
        if segment_length is None:
            return self.decode(variables, encoded_frames)
        decoded: List[Optional[jnp.ndarray]] = [None] * len(encoded_frames)
        # group by static codes length (full segments share one; ragged
        # tails get their own group)
        groups: Dict[int, List[int]] = {}
        for i, (codes, _) in enumerate(encoded_frames):
            groups.setdefault(int(codes.shape[-1]), []).append(i)
        for tc, members in groups.items():
            if len(members) == 1:
                decoded[members[0]] = self._decode_frame(
                    variables, encoded_frames[members[0]])
                continue
            codes = jnp.concatenate(
                [encoded_frames[i][0] for i in members], axis=0)
            scale = encoded_frames[members[0]][1]
            if scale is not None:
                scale = jnp.concatenate(
                    [encoded_frames[i][1] for i in members], axis=0)
            out = self._decode_frame(variables, (codes, scale))
            # split group-major: [G·B, C, L] → [G, B, C, L]. Use the frame's
            # own (possibly symbolic) batch dim — a -1 here fails to infer
            # under jax.export's symbolic batch
            B = encoded_frames[members[0]][0].shape[0]
            out = out.reshape(len(members), B, *out.shape[1:])
            for j, i in enumerate(members):
                decoded[i] = out[j]
        return linear_overlap_add(decoded, self.segment_stride or 1)

    def _decode_frame(self, variables, encoded_frame: EncodedFrame) -> jnp.ndarray:
        codes, scale = encoded_frame
        emb = self._rvq_decode(variables['quantizer'],
                               jnp.transpose(codes, (1, 0, 2)))
        out = self._dec_apply({'params': variables['params']['decoder']}, emb)
        out = jnp.swapaxes(out, 1, 2)  # [B, C, T]
        if scale is not None:
            out = out * scale.reshape(-1, 1, 1)
        return out

    def __call__(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Eval forward: encode → decode, truncated to the input length
        (model.py:211-213)."""
        frames = self.encode(variables, x)
        return self.decode(variables, frames)[:, :, :x.shape[-1]]

    def get_lm_model(self, checkpoint: Optional[str] = None):
        """Associated entropy LM for compression (reference model.py:221-240).
        Delegates to compress.get_lm_model (local checkpoint required — no
        download in this environment)."""
        from ..compress import get_lm_model
        return get_lm_model(self, checkpoint=checkpoint)

    # ------------------------------------------------------- training logic

    def n_q_for_bandwidth_index(self) -> np.ndarray:
        """Static lookup index→n_q over target_bandwidths (used to fold the
        per-step random bandwidth choice into the jitted step)."""
        return np.array([
            self.quantizer.num_quantizers_for_bandwidth(self.frame_rate, bw)
            for bw in self.target_bandwidths], np.int32)

    def forward_train(self, variables, x: jnp.ndarray, key: jax.Array,
                      remat: bool = False):
        """Training forward (model.py:195-210): encode frames, random
        bandwidth, quantizer forward with EMA update, decode, truncate.

        The reference's NCCL broadcast of the bandwidth index (model.py:203-
        205) is deleted by construction: every replica derives the same index
        from the same per-step key.

        Returns (output [B, C, T], loss_w, new_codebook_state).
        """
        k_bw, k_q = jax.random.split(key)
        n_q_table = jnp.asarray(self.n_q_for_bandwidth_index())
        index = jax.random.randint(k_bw, (), 0, len(self.target_bandwidths))
        n_q = n_q_table[index]

        length = x.shape[-1]
        segment_length = self.segment_length or length
        stride = self.segment_stride or length

        enc_params = {'params': variables['params']['encoder']}
        dec_params = {'params': variables['params']['decoder']}
        state = variables['quantizer']
        loss_w = jnp.float32(0.0)
        decoded = []
        enc_apply = self.encoder.apply
        dec_apply = self.decoder.apply
        if remat:
            # trade FLOPs for HBM: recompute conv activations in the backward
            enc_apply = jax.checkpoint(enc_apply)
            dec_apply = jax.checkpoint(dec_apply)
        n_frames = len(range(0, length, stride))
        for i, offset in enumerate(range(0, length, stride)):
            frame = x[:, :, offset: offset + segment_length]
            frame, scale = self._normalize_frame(frame)
            emb = enc_apply(enc_params, jnp.swapaxes(frame, 1, 2))
            qv, state = self.quantizer(
                state, emb, self.frame_rate, jax.random.fold_in(k_q, i),
                n_q=n_q, training=True)
            loss_w = loss_w + qv.penalty
            out = dec_apply(dec_params, qv.quantized)
            out = jnp.swapaxes(out, 1, 2)
            if scale is not None:
                out = out * scale.reshape(-1, 1, 1)
            decoded.append(out)
        if n_frames == 1:
            wav = decoded[0]
        else:
            wav = linear_overlap_add(decoded, stride)
        return wav[:, :, :length], loss_w, state

    # -------------------------------------------------------------- factory

    @staticmethod
    def _get_model(target_bandwidths: Sequence[float],
                   sample_rate: int = 24_000,
                   channels: int = 1,
                   causal: bool = True,
                   model_norm: str = 'weight_norm',
                   audio_normalize: bool = False,
                   segment: Optional[float] = None,
                   name: str = 'unset',
                   ratios=(8, 5, 4, 2),
                   n_q: Optional[int] = None,
                   n_filters: int = 32,
                   pad_mode: str = 'reflect',
                   dtype=jnp.float32) -> 'EncodecModel':
        """Mirror of model.py:242-276 incl. the default n_q formula
        (→ 32 for 24 kHz / bw 24, model.py:258). ``dtype`` selects the
        matmul/conv compute dtype (bfloat16 for MXU throughput);
        ``pad_mode`` forwards to the SEANet convs (reference seanet.py:39
        default 'reflect'; 'constant' makes serving-time length bucketing
        bit-exact — serve.LiveCodec.length_pad_exact)."""
        encoder = SEANetEncoder(channels=channels, norm=model_norm,
                                causal=causal, ratios=tuple(ratios),
                                n_filters=n_filters, pad_mode=pad_mode,
                                dtype=dtype)
        decoder = SEANetDecoder(channels=channels, norm=model_norm,
                                causal=causal, ratios=tuple(ratios),
                                n_filters=n_filters, pad_mode=pad_mode,
                                dtype=dtype)
        if n_q is None:
            n_q = int(1000 * target_bandwidths[-1]
                      // (math.ceil(sample_rate / encoder.hop_length) * 10))
        quantizer = ResidualVectorQuantizer(
            dimension=encoder.dimension, n_q=n_q, bins=1024)
        return EncodecModel(encoder, decoder, quantizer, target_bandwidths,
                            sample_rate, channels, normalize=audio_normalize,
                            segment=segment, name=name)


# --------------------------------------------------------- model factories

def encodec_model_24khz(checkpoint: Optional[str] = None,
                        pretrained: bool = False) -> Tuple[EncodecModel, Optional[dict]]:
    """Causal 24 kHz model (model.py:292-309). If ``checkpoint`` points at a
    released torch checkpoint (encodec_24khz-d7cc33bc.th), its weights are
    converted; returns (model, variables or None)."""
    model = EncodecModel._get_model(
        [1.5, 3., 6, 12., 24.], 24_000, 1, causal=True,
        model_norm='weight_norm', audio_normalize=False,
        name='encodec_24khz' if (pretrained or checkpoint) else 'unset')
    variables = _load_torch_checkpoint(model, checkpoint) if checkpoint else None
    return model, variables


def encodec_model_48khz(checkpoint: Optional[str] = None,
                        pretrained: bool = False) -> Tuple[EncodecModel, Optional[dict]]:
    """Non-causal normalized stereo 48 kHz model with 1 s segments
    (model.py:311-329)."""
    model = EncodecModel._get_model(
        [3., 6., 12., 24.], 48_000, 2, causal=False,
        model_norm='time_group_norm', audio_normalize=True, segment=1.,
        name='encodec_48khz' if (pretrained or checkpoint) else 'unset')
    variables = _load_torch_checkpoint(model, checkpoint) if checkpoint else None
    return model, variables


def my_encodec_model(checkpoint: str, ratios=(8, 5, 4, 2)) -> Tuple[EncodecModel, dict]:
    """Local trained checkpoint (model.py:332-349).

    Improvement over the reference: ``n_q`` is inferred from the checkpoint's
    RVQ buffers, so n_q-overridden training runs (config_mono_nq2) load
    through the same factory instead of failing on a strict size mismatch.
    """
    n_q = _checkpoint_n_q(checkpoint)
    model = EncodecModel._get_model(
        [1.5, 3., 6, 12., 24.], 24_000, 1, causal=False,
        model_norm='time_group_norm', audio_normalize=True,
        segment=None, name='my_encodec', ratios=ratios, n_q=n_q)
    return model, _load_torch_checkpoint(model, checkpoint, nested=True)


def _checkpoint_n_q(path: str) -> Optional[int]:
    """Count RVQ stages in a torch checkpoint (None → factory default)."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj.get('model_state_dict', obj) if isinstance(obj, dict) else obj
    stages = set()
    for k in sd:
        if '.layers.' in k:
            stages.add(int(k.split('.layers.')[1].split('.')[0]))
    return (max(stages) + 1) if stages else None


def encodec_model_bw(checkpoint: str, bandwidth: float = 24.) -> Tuple[EncodecModel, dict]:
    """Single-bandwidth trained checkpoint (model.py:351-368)."""
    model = EncodecModel._get_model(
        [bandwidth] if not isinstance(bandwidth, (list, tuple)) else bandwidth,
        24_000, 1, causal=False, model_norm='time_group_norm',
        audio_normalize=True, segment=1., name='my_encodec')
    return model, _load_torch_checkpoint(model, checkpoint, nested=True)


MODELS = {
    'encodec_24khz': encodec_model_24khz,
    'encodec_48khz': encodec_model_48khz,
    'my_encodec': my_encodec_model,
    'encodec_bw': encodec_model_bw,
}


def _load_torch_checkpoint(model: EncodecModel, path: str,
                           nested: bool = False) -> dict:
    """Load a torch checkpoint file and convert to our variables pytree.

    ``nested=True`` for trainer checkpoints (``{'model_state_dict': ...}``
    with the ``quantizer.model → quantizer.vq`` remap, model.py:346-347).
    """
    import os

    import torch

    from .. import convert
    from ..utils import check_checksum

    # released checkpoints carry a sha256 prefix in the filename
    # (encodec_24khz-d7cc33bc.th — reference model.py:278-289)
    stem = os.path.splitext(os.path.basename(path))[0]
    if not nested and '-' in stem:
        check_checksum(path, stem.split('-')[1])
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj['model_state_dict'] if nested and 'model_state_dict' in obj else obj
    sd = convert.remap_local_checkpoint_keys(
        {k: v.detach().numpy() for k, v in sd.items()})
    return variables_from_torch_state_dict(model, sd)


def variables_from_torch_state_dict(model: EncodecModel, sd) -> dict:
    """Split a full EncodecModel torch state_dict into our variables tree."""
    from .. import convert

    enc_sd = {k[len('encoder.'):]: v for k, v in sd.items()
              if k.startswith('encoder.')}
    dec_sd = {k[len('decoder.'):]: v for k, v in sd.items()
              if k.startswith('decoder.')}
    q_sd = {k[len('quantizer.vq.'):]: v for k, v in sd.items()
            if k.startswith('quantizer.vq.')}
    from ..quantization.core_vq import CodebookState
    return {
        'params': {
            'encoder': jax.tree.map(jnp.asarray,
                                    convert.seanet_params_from_torch(enc_sd)),
            'decoder': jax.tree.map(jnp.asarray,
                                    convert.seanet_params_from_torch(dec_sd)),
        },
        'quantizer': CodebookState(**{
            k: jnp.asarray(v) for k, v in
            convert.rvq_state_from_torch(q_sd, model.quantizer.n_q).items()}),
    }
