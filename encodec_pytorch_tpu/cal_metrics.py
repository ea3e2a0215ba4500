"""Objective evaluation CLI — rebuild of /root/reference/cal_metrics.py.

Walks a reference dir and a degraded dir (matching files by stripping the
``_bw{bw}`` suffix), computes STOI (native), SI-SNR and mel distance, plus
NB/WB PESQ and ViSQOL when those optional packages are installed; writes
per-file score files and prints means.

    python -m encodec_pytorch_tpu.cal_metrics -r ref_dir -d deg_dir -s 24000
"""

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

from .data.audio_io import read_wav
from .metrics import mel_distance, pesq_score, si_snr, stoi, visqol_score


def get_parser():
    parser = argparse.ArgumentParser('cal_metrics')
    parser.add_argument('-r', '--ref_dir', type=Path, required=True,
                        help='directory of reference (ground-truth) wavs')
    parser.add_argument('-d', '--deg_dir', type=Path, required=True,
                        help='directory of degraded/decoded wavs')
    parser.add_argument('-s', '--sample_rate', type=int, default=24000)
    parser.add_argument('-o', '--output', type=Path, default=None,
                        help='write per-file scores to this txt file')
    parser.add_argument('--visqol', action='store_true',
                        help='also compute ViSQOL MOS-LQO if available')
    return parser


def match_reference(deg_path: Path, ref_dir: Path) -> Path:
    """Strip the `_bw{n}` suffix the compression CLI appends
    (cal_metrics.py:117-118)."""
    stem = deg_path.stem
    if '_bw' in stem:
        stem = stem[:stem.rindex('_bw')]
    cand = ref_dir / deg_path.relative_to(deg_path.parents[0])
    cand = ref_dir / f'{stem}{deg_path.suffix}'
    return cand


def main(argv=None):
    args = get_parser().parse_args(argv)
    scores = defaultdict(list)
    lines = []
    for deg in sorted(args.deg_dir.rglob('*.wav')):
        ref = match_reference(deg, args.ref_dir)
        if not ref.exists():
            print(f'no reference for {deg}, skipping')
            continue
        x, sr_x = read_wav(ref)
        y, sr_y = read_wav(deg)
        x, y = x.reshape(-1), y.reshape(-1)
        entry = {'file': deg.name}
        entry['si_snr'] = si_snr(x, y)
        entry['mel_dist'] = mel_distance(x, y, args.sample_rate)
        try:
            entry['stoi'] = stoi(x, y, sr_x)
        except ValueError as exc:
            print(f'stoi failed for {deg}: {exc}')
        nb = pesq_score(x, y, sr_x, 'nb')
        wb = pesq_score(x, y, sr_x, 'wb')
        if nb is not None:
            entry['pesq_nb'] = nb
            entry['pesq_wb'] = wb
        if args.visqol:
            v = visqol_score(x, y, sr_x)
            if v is not None:
                entry['visqol'] = v
        for k, v in entry.items():
            if k != 'file':
                scores[k].append(v)
        line = '  '.join(f'{k}={v:.4f}' if isinstance(v, float) else f'{k}={v}'
                         for k, v in entry.items())
        lines.append(line)
        print(line)

    print('\n==== means ====')
    for k, vals in scores.items():
        print(f'mean {k}: {np.mean(vals):.4f}  (n={len(vals)})')
    if args.output:
        args.output.write_text('\n'.join(lines) + '\n')


if __name__ == '__main__':
    main()
