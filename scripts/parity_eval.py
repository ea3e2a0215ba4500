#!/usr/bin/env python
"""Quality-parity harness vs the PyTorch reference (BASELINE.md north star).

Round-trips a held-out wav set through BOTH implementations built from the
SAME torch checkpoint, then reports per-bandwidth quality metrics
(mel-distance / STOI / SI-SNR vs the input; PESQ/ViSQOL when their packages
are installed) and cross-implementation parity (max |Δwave|, Δmel) with
tolerance assertions. Reference call path being mirrored:
/root/reference/model.py:292-309 (factory + eval forward) and
cal_metrics.py:108-140 (metric walk).

Network-free by default: with no --checkpoint it generates a seeded
random-weight released-style checkpoint from the reference torch modules and
synthetic test clips, so the harness runs end-to-end in this sandbox. Point
--checkpoint at `encodec_24khz-d7cc33bc.th` (and --wav-dir at LibriSpeech
clips) to produce the real LibriTTS960h parity table.

    python scripts/parity_eval.py                          # self-contained
    python scripts/parity_eval.py --checkpoint encodec_24khz-d7cc33bc.th \
        --model encodec_24khz --wav-dir /data/heldout --out docs/PARITY_EVAL.md
"""

import argparse
import os
import sys
import tempfile
import types

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

REF = os.environ.get('ENCODEC_REFERENCE', '/root/reference')


def _import_reference_model():
    """Import the reference torch model package (read-only), stubbing audio
    libraries the image doesn't ship (they are unused on this path)."""
    for name in ('soundfile', 'librosa', 'torchaudio'):
        try:
            __import__(name)
        except Exception:
            sys.modules[name] = types.ModuleType(name)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model as ref_model  # noqa
    return ref_model


def make_selftest_checkpoint(path: str, seed: int = 0,
                             model_name: str = 'encodec_24khz'):
    """Seeded random-weight released-style (flat state_dict) checkpoint of
    the requested released flavor, with initialized RVQ buffers."""
    import torch
    ref_model = _import_reference_model()
    torch.manual_seed(seed)
    if model_name == 'encodec_48khz':
        m = ref_model.EncodecModel._get_model(
            [3., 6., 12., 24.], 48_000, 2, causal=False,
            model_norm='time_group_norm', audio_normalize=True, segment=1.,
            name='encodec_48khz')
    else:
        m = ref_model.EncodecModel._get_model(
            [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
            model_norm='weight_norm', audio_normalize=False,
            name='encodec_24khz')
    for layer in m.quantizer.vq.layers:
        cb = layer._codebook
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed)
        cb.inited.fill_(1)
        cb.cluster_size.fill_(1.0)
    torch.save(m.state_dict(), path)
    return path


def build_torch_model(model_name: str, checkpoint: str):
    import torch
    ref_model = _import_reference_model()
    obj = torch.load(checkpoint, map_location='cpu', weights_only=False)
    sd = obj.get('model_state_dict', obj) if isinstance(obj, dict) and \
        'model_state_dict' in obj else obj
    sd = {k.replace('quantizer.model', 'quantizer.vq'): v for k, v in sd.items()}
    n_q = max(int(k.split('.layers.')[1].split('.')[0])
              for k in sd if '.layers.' in k) + 1
    if model_name == 'encodec_24khz':
        m = ref_model.EncodecModel._get_model(
            [1.5, 3., 6., 12., 24.], 24_000, 1, causal=True,
            model_norm='weight_norm', audio_normalize=False,
            name='encodec_24khz', n_q=n_q)
    elif model_name == 'encodec_48khz':
        # reference model.py:311-329 (segment=1 s, normalized stereo)
        m = ref_model.EncodecModel._get_model(
            [3., 6., 12., 24.], 48_000, 2, causal=False,
            model_norm='time_group_norm', audio_normalize=True, segment=1.,
            name='encodec_48khz', n_q=n_q)
    elif model_name == 'my_encodec':
        m = ref_model.EncodecModel._get_model(
            [1.5, 3., 6., 12., 24.], 24_000, 1, causal=False,
            model_norm='time_group_norm', audio_normalize=True,
            name='my_encodec', n_q=n_q)
    else:
        raise SystemExit(f'unsupported --model {model_name}')
    m.load_state_dict(sd)
    m.eval()
    return m


def build_jax_model(model_name: str, checkpoint: str):
    from encodec_pytorch_tpu.models.model import MODELS
    if model_name == 'my_encodec':
        return MODELS[model_name](checkpoint)
    return MODELS[model_name](checkpoint=checkpoint)


def synthetic_clips(n: int, seconds: float, sr: int, seed: int = 0,
                    channels: int = 1):
    """Deterministic tonal/noise mixtures standing in for held-out speech.
    ``channels=2`` adds a decorrelated (phase-shifted, re-noised) right
    channel so the stereo path is exercised with a non-trivial image."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    clips = []
    for i in range(n):
        f0 = 120 + 90 * i
        chans = []
        for c in range(channels):
            sig = (0.4 * np.sin(2 * np.pi * f0 * t + 0.7 * c) *
                   (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t)) +
                   0.2 * np.sin(2 * np.pi * (2.3 * f0) * t + rng.rand()) +
                   0.03 * rng.randn(len(t)))
            chans.append(sig.astype(np.float32))
        clips.append((f'synthetic_{i}', np.stack(chans)))
    return clips


def load_wav_dir(wav_dir: str, sr: int, max_clips: int, channels: int = 1):
    from encodec_pytorch_tpu.data.audio_io import read_wav, resample
    clips = []
    for name in sorted(os.listdir(wav_dir)):
        if not name.lower().endswith('.wav'):
            continue
        wav, fsr = read_wav(os.path.join(wav_dir, name))
        if wav.shape[0] > channels:
            wav = (wav.mean(axis=0, keepdims=True) if channels == 1
                   else wav[:channels])
        elif wav.shape[0] < channels:
            wav = np.broadcast_to(wav, (channels, wav.shape[-1])).copy()
        if fsr != sr:
            wav = resample(wav, fsr, sr)
        clips.append((name, wav.astype(np.float32)))
        if len(clips) >= max_clips:
            break
    if not clips:
        raise SystemExit(f'no wavs in {wav_dir}')
    return clips


def roundtrip_torch(model, wav: np.ndarray) -> np.ndarray:
    import torch
    with torch.no_grad():
        out = model(torch.from_numpy(wav[None]))
    return out[0].numpy()


def roundtrip_jax(model, variables, wav: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    return np.asarray(model(variables, jnp.asarray(wav[None]))[0])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--checkpoint', default=None,
                   help='torch checkpoint (.th released flat or trainer '
                        'nested); default: generate a seeded self-test one')
    p.add_argument('--model', default='encodec_24khz',
                   choices=['encodec_24khz', 'encodec_48khz', 'my_encodec'])
    p.add_argument('--wav-dir', default=None,
                   help='held-out wav directory; default: synthetic clips')
    p.add_argument('--n-clips', type=int, default=4)
    p.add_argument('--seconds', type=float, default=3.0)
    p.add_argument('--bandwidths', type=float, nargs='+', default=None,
                   help='default: [1.5, 6, 24] (24k flavors) / [3, 6, 24] '
                        '(48k — its policy grid starts at 3 kbps)')
    p.add_argument('--out', default=os.path.join(_REPO, 'docs', 'PARITY_EVAL.md'))
    p.add_argument('--wav-tol', type=float, default=2e-3,
                   help='max |jax - torch| waveform divergence allowed')
    p.add_argument('--mel-tol', type=float, default=0.02,
                   help='max |mel_jax - mel_torch| quality-metric gap allowed')
    p.add_argument('--int8', action='store_true',
                   help='also evaluate the int8 weight-only serving path '
                        '(prepare.py) and report its quality deltas vs the '
                        'f32 jax model (weight_norm flavors only)')
    p.add_argument('--dry-run', action='store_true',
                   help='smoke-test the full arg/checkpoint/conversion path '
                        'fast: 1 clip, 1 s, lowest bandwidth only, no report '
                        'file — keeps the real-weights invocation warm for '
                        'when encodec_24khz-d7cc33bc.th is available')
    args = p.parse_args(argv)
    if args.bandwidths is None:
        args.bandwidths = ([3., 6., 24.] if args.model == 'encodec_48khz'
                           else [1.5, 6., 24.])
    if args.dry_run:
        # 48k keeps >1 s so the 1 s segmentation + overlap-add path runs
        args.n_clips = 1
        args.seconds = 1.5 if args.model == 'encodec_48khz' else 1.0
        args.bandwidths = args.bandwidths[:1]
        args.out = ''

    from encodec_pytorch_tpu import metrics as M

    tmpdir = None
    ckpt = args.checkpoint
    if ckpt is None:
        tmpdir = tempfile.mkdtemp(prefix='parity_eval_')
        ckpt = os.path.join(tmpdir, f'selftest_{args.model}.th')
        print('# no --checkpoint: generating seeded self-test checkpoint')
        make_selftest_checkpoint(ckpt, model_name=args.model)

    tmodel = build_torch_model(args.model, ckpt)
    jmodel, variables = build_jax_model(args.model, ckpt)
    sr = jmodel.sample_rate
    channels = jmodel.channels

    qmodel = qvars = None
    if args.int8:
        from encodec_pytorch_tpu.prepare import (prepare_for_inference,
                                                 quantized_call)
        if jmodel.encoder.norm != 'weight_norm':
            print(f'# --int8 skipped: {args.model} is not a weight_norm '
                  'flavor (folding does not apply)')
        else:
            qmodel, qvars = prepare_for_inference(jmodel, variables,
                                                  weights='int8')

    if args.wav_dir:
        clips = load_wav_dir(args.wav_dir, sr, args.n_clips, channels)
    else:
        clips = synthetic_clips(args.n_clips, args.seconds, sr,
                                channels=channels)

    def chan_mean(fn, a, b):
        """Average a mono metric over channels (stereo 48 kHz flavor)."""
        return float(np.mean([fn(a[c:c + 1], b[c:c + 1])
                              for c in range(a.shape[0])]))

    has_pesq = M.pesq_score(clips[0][1][0], clips[0][1][0], sr) is not None
    rows = []
    failures = []
    for bw in args.bandwidths:
        jmodel.set_target_bandwidth(bw)
        tmodel.set_target_bandwidth(bw)
        agg = {k: [] for k in ('mel_j', 'mel_t', 'stoi_j', 'stoi_t',
                               'sisnr_j', 'sisnr_t', 'wav_div', 'pesq_j',
                               'pesq_t', 'mel_q', 'stoi_q', 'sisnr_q')}
        if qmodel is not None:
            qmodel.set_target_bandwidth(bw)
        for name, wav in clips:
            out_j = roundtrip_jax(jmodel, variables, wav)
            out_t = roundtrip_torch(tmodel, wav)
            n = min(out_j.shape[-1], out_t.shape[-1], wav.shape[-1])
            if qmodel is not None:
                import jax.numpy as jnp
                out_q = np.asarray(quantized_call(
                    qmodel, qvars, jnp.asarray(wav[None]))[0])
                agg['mel_q'].append(chan_mean(
                    lambda a, b: M.mel_distance(a, b, sr),
                    wav[:, :n], out_q[:, :n]))
                agg['stoi_q'].append(M.stoi(wav[0, :n], out_q[0, :n], sr))
                agg['sisnr_q'].append(chan_mean(
                    M.si_snr, wav[:, :n], out_q[:, :n]))
            agg['mel_j'].append(chan_mean(
                lambda a, b: M.mel_distance(a, b, sr),
                wav[:, :n], out_j[:, :n]))
            agg['mel_t'].append(chan_mean(
                lambda a, b: M.mel_distance(a, b, sr),
                wav[:, :n], out_t[:, :n]))
            agg['stoi_j'].append(M.stoi(wav[0, :n], out_j[0, :n], sr))
            agg['stoi_t'].append(M.stoi(wav[0, :n], out_t[0, :n], sr))
            agg['sisnr_j'].append(chan_mean(
                M.si_snr, wav[:, :n], out_j[:, :n]))
            agg['sisnr_t'].append(chan_mean(
                M.si_snr, wav[:, :n], out_t[:, :n]))
            agg['wav_div'].append(float(np.abs(out_j[:, :n] - out_t[:, :n]).max()))
            if has_pesq:
                agg['pesq_j'].append(M.pesq_score(wav[0, :n], out_j[0, :n], sr))
                agg['pesq_t'].append(M.pesq_score(wav[0, :n], out_t[0, :n], sr))
        row = {k: (float(np.mean(v)) if v else None) for k, v in agg.items()}
        row['bw'] = bw
        rows.append(row)
        if row['wav_div'] > args.wav_tol:
            failures.append(f"bw {bw}: wave divergence {row['wav_div']:.2e} "
                            f"> {args.wav_tol:.0e}")
        if abs(row['mel_j'] - row['mel_t']) > args.mel_tol:
            failures.append(f"bw {bw}: mel gap "
                            f"{abs(row['mel_j'] - row['mel_t']):.4f} "
                            f"> {args.mel_tol}")

    src = args.wav_dir or f'{len(clips)} synthetic clips ({args.seconds}s)'
    lines = [
        '# Parity evaluation — JAX/TPU vs PyTorch reference',
        '',
        f'- checkpoint: `{os.path.basename(ckpt)}`'
        f'{" (seeded self-test, random weights)" if args.checkpoint is None else ""}',
        f'- model flavor: `{args.model}` | sample rate {sr} | clips: {src}',
        f'- tolerances: wave {args.wav_tol:.0e}, mel {args.mel_tol}',
        '',
        '| bw kbps | mel (jax) | mel (torch) | Δmel | STOI (jax) | STOI (torch)'
        ' | SI-SNR (jax) | SI-SNR (torch) | max\\|Δwave\\| |',
        '|---|---|---|---|---|---|---|---|---|',
    ]
    for r in rows:
        lines.append(
            f"| {r['bw']} | {r['mel_j']:.4f} | {r['mel_t']:.4f} | "
            f"{abs(r['mel_j'] - r['mel_t']):.5f} | {r['stoi_j']:.4f} | "
            f"{r['stoi_t']:.4f} | {r['sisnr_j']:.2f} | {r['sisnr_t']:.2f} | "
            f"{r['wav_div']:.2e} |")
    if qmodel is not None:
        lines.append('')
        lines.append('Int8 weight-only serving path (prepare.py) vs the f32 '
                     'jax model:')
        lines.append('')
        lines.append('| bw kbps | mel (int8) | Δmel vs f32 | STOI (int8) '
                     '| SI-SNR (int8) |')
        lines.append('|---|---|---|---|---|')
        for r in rows:
            lines.append(
                f"| {r['bw']} | {r['mel_q']:.4f} | "
                f"{r['mel_q'] - r['mel_j']:+.5f} | {r['stoi_q']:.4f} | "
                f"{r['sisnr_q']:.2f} |")
    if has_pesq:
        lines.append('')
        lines.append('| bw kbps | PESQ (jax) | PESQ (torch) |')
        lines.append('|---|---|---|')
        for r in rows:
            lines.append(f"| {r['bw']} | {r['pesq_j']:.3f} | {r['pesq_t']:.3f} |")
    lines.append('')
    lines.append('Result: ' + ('**PASS** — the converted model matches the '
                               'torch reference within tolerance.'
                               if not failures else
                               '**FAIL**\n' + '\n'.join(f'- {f}' for f in failures)))
    report = '\n'.join(lines)
    print(report)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, 'w') as f:
            f.write(report + '\n')
        print(f'\n# wrote {args.out}')
    if failures:
        sys.exit(1)


if __name__ == '__main__':
    main()
