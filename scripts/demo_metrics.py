#!/usr/bin/env python
"""Score the reference's released-model demo reconstructions with the
native metrics stack.

The upstream repo ships the ONLY released-weights artifacts available in
this sandbox: real LibriTTS speech (`116_288045_000003_000000.wav`) plus
the released `encodec_24khz` model's actual reconstructions at every
bandwidth, and the same for a locally-trained `my_encodec` checkpoint
(reference demo/README.md). The released weights themselves cannot be
fetched (no egress), so this table serves two purposes:

1. It is the QUALITY TARGET the converted released checkpoint must match
   when `encodec_24khz-d7cc33bc.th` is dropped into the sandbox
   (scripts/parity_eval.py then reproduces these exact wavs).
2. It validates the native metrics (metrics.py: STOI per Taal 2010,
   SI-SNR, multi-scale mel distance) on REAL coded speech: scores must
   improve monotonically with bandwidth, which no synthetic property
   test can check.

Usage: python scripts/demo_metrics.py [--demo_root /root/reference/demo]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GT_NAME = '116_288045_000003_000000.wav'
BANDWIDTHS = ['1.5', '3.0', '6.0', '12.0', '24.0']


def score_dir(demo_dir: Path):
    """[(bandwidth, stoi, si_snr, mel_distance)] for one demo folder."""
    from encodec_pytorch_tpu import metrics
    from encodec_pytorch_tpu.data.audio_io import read_wav

    gt, sr = read_wav(demo_dir / GT_NAME)
    gt = gt[0]
    rows = []
    for bw in BANDWIDTHS:
        path = demo_dir / f'{bw}.wav'
        if not path.exists():
            continue
        rec, sr2 = read_wav(path)
        assert sr2 == sr, (path, sr2, sr)
        rec = rec[0]
        rows.append((bw,
                     metrics.stoi(gt, rec, sr),
                     metrics.si_snr(gt, rec),
                     metrics.mel_distance(gt, rec, sr)))
    return rows, sr, gt.shape[-1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--demo_root', default='/root/reference/demo',
                   help='upstream demo directory (read-only)')
    args = p.parse_args(argv)

    root = Path(args.demo_root)
    if not root.is_dir():
        print(f'demo root {root} not found — nothing to score', file=sys.stderr)
        return 1

    for demo_dir in sorted(d for d in root.iterdir() if d.is_dir()):
        rows, sr, n = score_dir(demo_dir)
        if not rows:
            continue
        print(f'\n## {demo_dir.name}  ({n / sr:.2f} s @ {sr} Hz)')
        print('| bandwidth | STOI | SI-SNR (dB) | mel distance |')
        print('|---|---|---|---|')
        for bw, st, snr, mel in rows:
            print(f'| {bw} kbps | {st:.4f} | {snr:+.2f} | {mel:.4f} |')
        stois = [r[1] for r in rows]
        mono = all(b >= a - 1e-3 for a, b in zip(stois, stois[1:]))
        print(f'STOI monotone nondecreasing in bandwidth: {mono}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
