"""Self-contained deployment artifacts: the codec as serialized StableHLO.

``jax.export`` serializes the jitted eval functions — with the checkpoint
weights baked in as program constants — into one zip that a serving host
can run with only jax installed: no model classes, no checkpoint loading,
no Python graph code, no flax. This is the TPU-native analogue of a
TorchScript/ONNX export; the reference has none (it deploys by shipping
the whole Python package plus a torch checkpoint, main.py:121-132).

Shape contract: entries are **batch-polymorphic** (symbolic leading dim,
served by one compiled program per concrete batch under XLA's normal
specialization) but **static in time** — the streamable padding math is
shape-derived (reference conv.py:54-105; ops/pad.py), so each served clip
length is its own entry. Export the lengths you serve, the way a serving
fleet pads to length buckets anyway. Artifacts are multi-platform
(cpu + tpu by default): one file runs on a dev machine and on the chip.

Segmented (48 kHz-style) models work through the same two entry kinds:
``encode`` returns a tuple of per-segment code arrays ``[B, K, Tf_i]``
(the last segment is usually shorter under overlap, so the frames are
ragged — tuples, not a stacked array; plus a tuple of ``[B, 1]`` scales
when the model normalizes) and ``decode`` replays the triangular
overlap-add inside the exported program, so the consumer never needs the
segmentation logic.

Weights mode: pass the variables you want baked — raw, or folded via
:func:`encodec_pytorch_tpu.prepare.fold_weight_norm` for fewer ops per
call (bit-equal). Int8 trees are not supported here: baking them would
constant-fold the dequantization back to dense f32.
"""

import io
import json
import zipfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from . import lengthpad

FORMAT_VERSION = 1
_META_NAME = 'meta.json'
_PLATFORMS = ('cpu', 'tpu')


# ----------------------------------------------------------------- export


def _n_frames(model, length: int) -> int:
    """Number of segments model.encode produces for a clip of ``length``
    (the last one may be shorter — ragged frames are first-class here,
    mirroring the reference's windowing, model.py:142-145)."""
    if model.segment_length is None:
        return 1
    return len(range(0, length, model.segment_stride))


def _segmajor_default(model) -> bool:
    """Serving builders default to segment-major batching for segmented
    models (models/model.py encode_segmajor: S per-segment subgraphs → one
    batched subgraph; fixes the measured 48 kHz B>1 aggregate-RTF
    regression). Single-frame models are unaffected (it is the identity
    there)."""
    return model.segment is not None


def _encode_fn(model, variables, segmajor: Optional[bool] = None):
    # per-frame tuples, NOT a stacked array: with overlap the last segment
    # is usually shorter, so frame code lengths differ
    if segmajor is None:
        segmajor = _segmajor_default(model)
    encode = model.encode_segmajor if segmajor else model.encode

    def f(x):
        frames = encode(variables, x)
        codes = tuple(c for c, _ in frames)
        if model.normalize:
            return codes, tuple(s for _, s in frames)
        return codes
    return f


def _decode_fn(model, variables, out_length: int,
               segmajor: Optional[bool] = None):
    if segmajor is None:
        segmajor = _segmajor_default(model)
    decode = model.decode_segmajor if segmajor else model.decode
    if model.normalize:
        def f(codes, scales):
            return decode(
                variables, list(zip(codes, scales)))[:, :, :out_length]
    else:
        def f(codes):
            return decode(
                variables, [(c, None) for c in codes])[:, :, :out_length]
    return f


def _roundtrip_fn(model, variables, segmajor: Optional[bool] = None):
    if segmajor is None:
        segmajor = _segmajor_default(model)
    if not segmajor:
        def f(x):
            return model(variables, x)
        return f

    def f(x):
        frames = model.encode_segmajor(variables, x)
        return model.decode_segmajor(variables, frames)[:, :, :x.shape[-1]]
    return f


def export_entries(model, variables,
                   lengths: Sequence[int],
                   bandwidths: Optional[Sequence[float]] = None,
                   platforms: Sequence[str] = _PLATFORMS,
                   kinds: Sequence[str] = ('encode', 'decode', 'roundtrip'),
                   segment_major: Optional[bool] = None,
                   ) -> Tuple[Dict[str, Any], List[dict]]:
    """Export encode/decode/roundtrip programs for every (bandwidth, length).

    Returns ``(exported, entries)``: a dict name → ``jax.export.Exported``
    and the matching meta rows. Weights (and the RVQ codebooks) are baked
    into the programs as constants — per entry, so dropping ``roundtrip``
    from ``kinds`` (the loader can compose encode∘decode instead, at the
    cost of one extra dispatch) roughly halves the artifact.
    """
    bad_kinds = set(kinds) - {'encode', 'decode', 'roundtrip'}
    if bad_kinds:
        raise ValueError(f"unknown kinds {sorted(bad_kinds)}")
    if segment_major is None:
        segment_major = _segmajor_default(model)
    if bandwidths is None:
        bandwidths = [model.bandwidth if model.bandwidth is not None
                      else model.target_bandwidths[-1]]
    restore_bw = model.bandwidth
    b = jax_export.symbolic_shape('b')
    exported: Dict[str, Any] = {}
    entries: List[dict] = []

    for bw in bandwidths:
        model.set_target_bandwidth(bw)
        n_q = model.quantizer.num_quantizers_for_bandwidth(
            model.frame_rate, model.bandwidth)
        for length in lengths:
            n_frames = _n_frames(model, length)
            x_spec = jax.ShapeDtypeStruct((*b, model.channels, length),
                                          jnp.float32)
            # per-frame code lengths (the last segment may be shorter);
            # flatten order of (codes_tuple[, scales_tuple]) puts the F
            # code avals first
            out_shapes = jax.tree.leaves(jax.eval_shape(
                _encode_fn(model, variables, segmajor=segment_major),
                jax.ShapeDtypeStruct((1, model.channels, length),
                                     jnp.float32)))
            frame_tfs = [int(a.shape[-1]) for a in out_shapes[:n_frames]]
            # codes' K from the ACTUAL encode output, not the bandwidth
            # policy: num_quantizers_for_bandwidth is reference-faithfully
            # unclamped (vq.py:101-108) and the encoder clamps by slicing
            # (layers[:n_q] there, state[:n_q] here) — a decode spec built
            # from the unclamped value desyncs from real streams when a
            # model's total n_q is below the bandwidth-implied count
            n_q = int(out_shapes[0].shape[1])
            common = {'bandwidth': bw, 'length': length, 'n_q': int(n_q),
                      'n_frames': n_frames, 'frame_tfs': frame_tfs,
                      'normalize': model.normalize}

            if 'encode' in kinds:
                enc_name = f'encode_bw{bw:g}_t{length}'
                exported[enc_name] = jax_export.export(
                    jax.jit(_encode_fn(model, variables,
                                       segmajor=segment_major)),
                    platforms=tuple(platforms))(x_spec)
                entries.append({'name': enc_name, 'kind': 'encode',
                                **common})

            if 'decode' in kinds:
                dec_name = f'decode_bw{bw:g}_t{length}'
                codes_spec = tuple(
                    jax.ShapeDtypeStruct((*b, n_q, tf), jnp.int32)
                    for tf in frame_tfs)
                dec_fn = _decode_fn(model, variables, length,
                                    segmajor=segment_major)
                if model.normalize:
                    scales_spec = tuple(
                        jax.ShapeDtypeStruct((*b, 1), jnp.float32)
                        for _ in frame_tfs)
                    exp_dec = jax_export.export(
                        jax.jit(dec_fn), platforms=tuple(platforms))(
                            codes_spec, scales_spec)
                else:
                    exp_dec = jax_export.export(
                        jax.jit(dec_fn),
                        platforms=tuple(platforms))(codes_spec)
                exported[dec_name] = exp_dec
                entries.append({'name': dec_name, 'kind': 'decode',
                                **common})

            if 'roundtrip' in kinds:
                rt_name = f'roundtrip_bw{bw:g}_t{length}'
                exported[rt_name] = jax_export.export(
                    jax.jit(_roundtrip_fn(model, variables,
                                          segmajor=segment_major)),
                    platforms=tuple(platforms))(x_spec)
                entries.append({'name': rt_name, 'kind': 'roundtrip',
                                **common})

    if restore_bw is not None:
        model.set_target_bandwidth(restore_bw)
    return exported, entries


def save_artifact(path, model, variables,
                  lengths: Sequence[int],
                  bandwidths: Optional[Sequence[float]] = None,
                  platforms: Sequence[str] = _PLATFORMS,
                  kinds: Sequence[str] = ('encode', 'decode', 'roundtrip'),
                  segment_major: Optional[bool] = None,
                  ) -> dict:
    """Export and write a deployment zip. Returns the meta dict."""
    exported, entries = export_entries(model, variables, lengths,
                                       bandwidths, platforms, kinds,
                                       segment_major=segment_major)
    meta = {
        'format_version': FORMAT_VERSION,
        'model_name': model.name,
        'sample_rate': model.sample_rate,
        'channels': model.channels,
        'frame_rate': model.frame_rate,
        'normalize': model.normalize,
        'segment': model.segment,
        'platforms': list(platforms),
        'entries': entries,
        # serving-side length-bucketing gates (serve.CodecServer): same
        # semantics as LiveCodec.length_pad_{exact,tail_exact,min_samples}
        'causal': bool(model.encoder.causal),
        'pad_mode': model.encoder.pad_mode,
        'decoder_pad_mode': model.decoder.pad_mode,
        'hop_length': int(model.encoder.hop_length),
        'length_pad_min_samples': lengthpad.pad_min_samples(model),
    }
    with zipfile.ZipFile(path, 'w', zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        for name, exp in exported.items():
            zf.writestr(name + '.shlo', exp.serialize())
    return meta


# ----------------------------------------------------------------- serve


class DeployedCodec:
    """Loader/runner for a deployment zip. Needs only jax — it never
    imports the model code (the graphs and weights live in the artifact).
    """

    def __init__(self, meta: dict, programs: Dict[str, Any]):
        self.meta = meta
        self._programs = programs
        self._by_key: Dict[Tuple[str, float, int], dict] = {}
        for e in meta['entries']:
            self._by_key[(e['kind'], float(e['bandwidth']), e['length'])] = e

    @classmethod
    def load(cls, path) -> 'DeployedCodec':
        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read(_META_NAME))
            if meta.get('format_version') != FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {meta.get('format_version')} != "
                    f"{FORMAT_VERSION}")
            programs = {
                e['name']: jax_export.deserialize(zf.read(e['name'] + '.shlo'))
                for e in meta['entries']}
        return cls(meta, programs)

    # -- entry selection

    @property
    def lengths(self) -> List[int]:
        return sorted({e['length'] for e in self.meta['entries']})

    @property
    def bandwidths(self) -> List[float]:
        return sorted({float(e['bandwidth']) for e in self.meta['entries']})

    # -- serving-side length-bucketing gates (serve.CodecServer) — same
    # contract as LiveCodec; artifacts written before these meta keys
    # existed report not-bucketable. NOTE: for a deployed backend the
    # server's ``length_buckets`` must be a subset of ``self.lengths``
    # (programs are exported per length).

    @property
    def length_pad_tail_exact(self) -> bool:
        m = self.meta
        return (lengthpad.tail_exact_gate(m.get('causal', False),
                                          m.get('normalize', True),
                                          m.get('segment'))
                and m.get('length_pad_min_samples', -1) >= 0
                and 'hop_length' in m)

    @property
    def length_pad_exact(self) -> bool:
        m = self.meta
        return (self.length_pad_tail_exact
                and m.get('pad_mode') == 'constant'
                and m.get('decoder_pad_mode') == 'constant')

    @property
    def hop_length(self) -> int:
        return int(self.meta['hop_length'])

    @property
    def length_pad_min_samples(self) -> int:
        return int(self.meta.get('length_pad_min_samples', -1))

    def _entry(self, kind: str, length: int, bandwidth: Optional[float]):
        bw = float(bandwidth) if bandwidth is not None else self.bandwidths[-1]
        e = self._by_key.get((kind, bw, length))
        if e is None:
            raise KeyError(
                f"no {kind} entry for length={length} bandwidth={bw:g}; "
                f"artifact serves lengths {self.lengths} × bandwidths "
                f"{self.bandwidths}")
        return e

    # -- calls (x: [B, C, T] float32; codes: tuple of [B, K, Tf_i] int32)

    def encode(self, x, bandwidth: Optional[float] = None):
        """→ per-frame codes tuple ([B, K, Tf_i], ...) — and a matching
        scales tuple ([B, 1], ...) if the model normalizes."""
        e = self._entry('encode', x.shape[-1], bandwidth)
        return self._programs[e['name']].call(x)

    def decode(self, codes, scales=None, bandwidth: Optional[float] = None,
               length: Optional[int] = None):
        """codes (+scales for normalizing models) → wav [B, C, T]."""
        if length is None:
            shape_key = (len(codes), int(codes[0].shape[-2]),
                         [int(c.shape[-1]) for c in codes])
            matches = [e for e in self.meta['entries']
                       if e['kind'] == 'decode'
                       and (e['n_frames'], e['n_q'], e['frame_tfs'])
                       == shape_key
                       and (bandwidth is None
                            or float(e['bandwidth']) == float(bandwidth))]
            if len(matches) != 1:
                raise KeyError(
                    f"codes shapes {[tuple(c.shape) for c in codes]} match "
                    f"{len(matches)} decode entries; pass length= "
                    f"(and bandwidth=) to disambiguate")
            e = matches[0]
        else:
            e = self._entry('decode', length, bandwidth)
        prog = self._programs[e['name']]
        codes = tuple(codes)
        if e['normalize']:
            if scales is None:
                raise ValueError("this artifact normalizes: pass scales")
            return prog.call(codes, tuple(scales))
        return prog.call(codes)

    def roundtrip(self, x, bandwidth: Optional[float] = None):
        """encode→decode in one exported program — or, for artifacts saved
        without 'roundtrip' entries, the encode∘decode composition (same
        math, one extra dispatch)."""
        try:
            e = self._entry('roundtrip', x.shape[-1], bandwidth)
        except KeyError:
            out = self.encode(x, bandwidth)
            codes, scales = out if isinstance(out[0], (tuple, list)) \
                else (out, None)
            return self.decode(codes, scales, bandwidth=bandwidth,
                               length=x.shape[-1])
        return self._programs[e['name']].call(x)
