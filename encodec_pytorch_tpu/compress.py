"""Compress/decompress audio to `.ecdc` bytestreams.

Rebuild of /root/reference/compress.py with the identical wire format
(header, per-frame scale floats, 10-bit-packed codes or LM+arithmetic-coded
codes). The codec model runs jitted on the accelerator; the bit-level loops
run on host (C++ fast path when built).

The LM path keeps the step-by-step streaming emulation on BOTH sides
(compress.py:77-81): encoder-side batching the LM would produce CDFs that
are not bit-identical to the decoder's incremental ones, which would corrupt
the stream — correctness over speed here.
"""

import io
import math
import struct
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .bitstream import ac as ac_mod
from .bitstream import binary, native
from .models.lm import LMModel
from .models.model import MODELS, EncodecModel  # noqa: F401  (registry parity)


class LM:
    """A pretrained entropy LM bundled with its params + jitted step."""

    def __init__(self, model: LMModel, params):
        self.model = model
        self.params = params
        self._step = jax.jit(
            lambda p, idx, state: self.model.apply({'params': p}, idx, state))

    def step(self, indices: np.ndarray, state):
        """indices [B, K, 1] → (probas [B, card, K, 1], new_state)."""
        probas, new_state, _ = self._step(self.params, jnp.asarray(indices), state)
        return np.asarray(probas), new_state


def get_lm_model(model: EncodecModel, checkpoint: tp.Optional[str] = None) -> LM:
    """The associated entropy LM (reference model.py:221-240).

    The reference downloads pretrained LM weights; this environment has no
    egress, so a local checkpoint path must be supplied — either a torch
    ``.th`` state dict (converted via lm_params_from_torch) or a native
    self-describing msgpack from the LM trainer (train/lm_trainer.py).
    Without one, a ValueError mirrors the reference's unsupported-model error.
    """
    if checkpoint is None:
        raise ValueError(
            "No local LM checkpoint provided (pretrained download needs "
            "network). Pass lm=LM(...) or checkpoint=<path to torch .th or "
            "native .msgpack>.")
    if checkpoint.endswith('.msgpack'):
        from .train.lm_trainer import load_lm_checkpoint
        lm_def, params = load_lm_checkpoint(checkpoint)
        assert lm_def.card == model.quantizer.bins, \
            (lm_def.card, model.quantizer.bins)
        return LM(lm_def, params)
    lm_def = LMModel(n_q=model.quantizer.n_q, card=model.quantizer.bins,
                     num_layers=5, dim=200,
                     past_context=int(3.5 * model.frame_rate))
    import torch

    from .models.lm import lm_params_from_torch
    sd = torch.load(checkpoint, map_location='cpu', weights_only=False)
    params = lm_params_from_torch(
        {k: v.detach().numpy() for k, v in sd.items()})
    return LM(lm_def, jax.tree.map(jnp.asarray, params))


def compress_to_file(model: EncodecModel, variables, wav, fo: tp.IO[bytes],
                     use_lm: bool = False, lm: tp.Optional[LM] = None):
    """Compress a ``[C, T]`` waveform to a file object (compress.py:30-92)."""
    wav = np.asarray(wav)
    assert wav.ndim == 2, "Only single waveform can be encoded."
    if use_lm and lm is None:
        lm = get_lm_model(model)

    frames = model.encode(variables, jnp.asarray(wav[None]))
    frames = [(np.asarray(codes), None if scale is None else np.asarray(scale))
              for codes, scale in frames]

    metadata = {
        'm': model.name,                  # model name
        'al': int(wav.shape[-1]),         # audio_length
        'nc': int(frames[0][0].shape[1]),  # num_codebooks
        'lm': use_lm,
        'fr': int(frames[0][0].shape[2]),  # frame length (codes)
    }
    binary.write_ecdc_header(fo, metadata)

    if use_lm and len(frames) > 1:
        # Per-frame AC streams are not length-prefixed and the decoder cannot
        # know how many flush bytes to skip between frames — the reference
        # format has the same limitation (its segmented 48 kHz + LM path
        # would misalign, compress.py:120-156). Fail loudly instead.
        raise ValueError("use_lm with segmented models (multiple frames) is "
                         "not supported by the .ecdc format")

    for (frame, scale) in frames:
        if scale is not None:
            fo.write(struct.pack('!f', float(scale.reshape(-1)[0])))
        _, K, T = frame.shape
        if use_lm:
            _compress_frame_lm(lm, frame, fo)
        else:
            packer = binary.BitPacker(model.bits_per_codebook, fo)
            # time-major (t, k) order, exactly like the reference loops
            packer.push_all(frame[0].T.reshape(-1))
            packer.flush()


def _compress_frame_lm(lm: LM, frame: np.ndarray, fo: tp.IO[bytes]):
    """Arithmetic-code one frame with streaming LM probabilities
    (compress.py:69-90).

    The t-loop must stay sequential (the LM is conditioned on the previous
    step's codes and the decoder reproduces it incrementally), but within a
    timestep all K codebooks' CDFs depend only on codes < t, so the K inner
    loop is batched: one native CDF build + one AC push_batch per step —
    byte-identical to K scalar pushes since the coder state updates in the
    same (t, k) order.
    """
    _, K, T = frame.shape
    use_native = native.available()
    if use_native:
        coder = native.NativeAcEncoder(24)
    else:
        coder = ac_mod.ArithmeticCoder(fo)
    state = None
    input_ = np.zeros((1, K, 1), np.int64)
    for t in range(T):
        probas, state = lm.step(input_, state)
        input_ = 1 + frame[:, :, t:t + 1]
        pdfs = probas[0, :, :, 0].T  # [K, card]
        if use_native:
            coder.push_batch(frame[0, :, t].astype(np.int32),
                             native.build_cdf_batch(pdfs, 24))
        else:
            for k in range(K):
                q_cdf = ac_mod.build_stable_quantized_cdf(pdfs[k], 24,
                                                          check=False)
                coder.push(int(frame[0, k, t]), q_cdf)
    if use_native:
        fo.write(coder.finish())
    else:
        coder.flush()


def decompress_from_file(model: EncodecModel, variables, fo: tp.IO[bytes],
                         lm: tp.Optional[LM] = None
                         ) -> tp.Tuple[np.ndarray, int]:
    """Decompress from a file object → (wav [C, T], sample_rate)
    (compress.py:95-162)."""
    metadata = binary.read_ecdc_header(fo)
    audio_length = metadata['al']
    num_codebooks = metadata['nc']
    use_lm = metadata['lm']
    assert isinstance(audio_length, int)
    assert isinstance(num_codebooks, int)
    if use_lm and lm is None:
        lm = get_lm_model(model)

    frames = []
    segment_length = model.segment_length or audio_length
    segment_stride = model.segment_stride or audio_length
    offsets = list(range(0, audio_length, segment_stride))
    for offset in offsets:
        if len(offsets) == 1:
            # single-frame streams: trust the header 'fr' like the reference
            # (compress.py:122-123) for bitstream compat
            frame_length = metadata['fr']
        else:
            # multi-frame: the last segment is shorter; the reference's
            # header-fr-everywhere would over-read (its own segmented decode
            # is broken) — use the original-EnCodec computed length
            this_segment_length = min(audio_length - offset, segment_length)
            frame_length = int(math.ceil(
                this_segment_length * model.frame_rate / model.sample_rate))
        if model.normalize:
            scale_f, = struct.unpack(
                '!f', binary._read_exactly(fo, struct.calcsize('!f')))
            scale = jnp.asarray([scale_f], jnp.float32)
        else:
            scale = None
        if use_lm:
            frame = _decompress_frame_lm(lm, fo, num_codebooks, frame_length)
        else:
            frame = _decompress_frame_packed(model, fo, num_codebooks,
                                             frame_length)
        frames.append((jnp.asarray(frame[None]), scale))
    wav = model.decode(variables, frames)
    return np.asarray(wav[0, :, :audio_length]), model.sample_rate


def _decompress_frame_packed(model, fo, K: int, T: int) -> np.ndarray:
    bits = model.bits_per_codebook
    n_vals = K * T
    if native.available():
        n_bytes = -(-(n_vals * bits) // 8)
        data = fo.read(n_bytes)
        vals = native.unpack_bits(data, bits, n_vals)
        if len(vals) < n_vals:
            raise EOFError("The stream ended sooner than expected.")
    else:
        unpacker = binary.BitUnpacker(bits, fo)
        vals = unpacker.pull_all(n_vals)
        if len(vals) < n_vals:
            raise EOFError("The stream ended sooner than expected.")
        vals = np.asarray(vals)
    return np.asarray(vals, np.int32).reshape(T, K).T  # [K, T]


def _decompress_frame_lm(lm: LM, fo, K: int, T: int) -> np.ndarray:
    rest = fo.read()
    use_native = native.available()
    if use_native:
        decoder = native.NativeAcDecoder(rest, 24)
    else:
        decoder = ac_mod.ArithmeticDecoder(io.BytesIO(rest))
    frame = np.zeros((K, T), np.int64)
    state = None
    input_ = np.zeros((1, K, 1), np.int64)
    for t in range(T):
        probas, state = lm.step(input_, state)
        pdfs = probas[0, :, :, 0].T  # [K, card]
        if use_native:
            # all K CDFs at step t depend only on codes < t → one batched
            # native call per step (the AC pulls stay sequential inside)
            syms = decoder.pull_batch(native.build_cdf_batch(pdfs, 24))
            if len(syms) < K:
                raise EOFError("The stream ended sooner than expected.")
            frame[:, t] = syms
        else:
            for k in range(K):
                q_cdf = ac_mod.build_stable_quantized_cdf(pdfs[k], 24,
                                                          check=False)
                code = decoder.pull(q_cdf)
                if code is None:
                    raise EOFError("The stream ended sooner than expected.")
                frame[k, t] = code
        input_ = 1 + frame[None, :, t:t + 1]
    return frame


def compress(model: EncodecModel, variables, wav, use_lm: bool = False,
             lm: tp.Optional[LM] = None) -> bytes:
    """[C, T] waveform → compressed bytes (compress.py:165-179)."""
    fo = io.BytesIO()
    compress_to_file(model, variables, wav, fo, use_lm=use_lm, lm=lm)
    return fo.getvalue()


def decompress(model: EncodecModel, variables, compressed: bytes,
               lm: tp.Optional[LM] = None) -> tp.Tuple[np.ndarray, int]:
    """Compressed bytes → (wav [C, T], sample_rate) (compress.py:182-191)."""
    fo = io.BytesIO(compressed)
    return decompress_from_file(model, variables, fo, lm=lm)
