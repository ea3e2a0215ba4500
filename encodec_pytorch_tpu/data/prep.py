"""Dataset preparation utilities — rebuild of /root/reference/datasets/
(generate_train_file.py, merge_csv_file.py, resample_audio.py) and the
duration-analytics helpers in utils.py:178-233.

    python -m encodec_pytorch_tpu.data.prep generate --input_dir ~/LibriTTS \
        --output_dir ./datasets --split 0.9
    python -m encodec_pytorch_tpu.data.prep merge a.csv b.csv -o all.csv
    python -m encodec_pytorch_tpu.data.prep resample --input_dir in --output_dir out \
        --target_sr 24000
    python -m encodec_pytorch_tpu.data.prep durations train.csv -o durations.csv
"""

import argparse
import os
import random
from pathlib import Path

import numpy as np
import pandas as pd

from .audio_io import read_wav, resample, wav_info, write_wav

AUDIO_EXTS = ('.wav', '.flac')


def collect_audio_files(input_dir: str):
    """Walk a LibriSpeech/LibriTTS-style tree (generate_train_file.py:6-20)."""
    files = []
    for root, _, names in os.walk(input_dir):
        for name in sorted(names):
            if name.lower().endswith(AUDIO_EXTS):
                files.append(os.path.join(root, name))
    return files


def generate_csv(input_dir: str, output_dir: str, split: float = 0.9,
                 seed: int = 42):
    """Train/test split csvs (generate_train_file.py:22-31, random split
    instead of sklearn which isn't guaranteed present)."""
    files = collect_audio_files(input_dir)
    rng = random.Random(seed)
    rng.shuffle(files)
    n_train = int(len(files) * split)
    os.makedirs(output_dir, exist_ok=True)
    train_csv = os.path.join(output_dir, 'train.csv')
    test_csv = os.path.join(output_dir, 'test.csv')
    Path(train_csv).write_text('\n'.join(files[:n_train]) + '\n')
    Path(test_csv).write_text('\n'.join(files[n_train:]) + '\n')
    return train_csv, test_csv


def merge_csv(inputs, output: str):
    """Concatenate csvs of paths (merge_csv_file.py:6-20)."""
    rows = []
    for path in inputs:
        rows.extend(p for p in Path(path).read_text().splitlines() if p.strip())
    Path(output).write_text('\n'.join(rows) + '\n')
    return output


def resample_tree(input_dir: str, output_dir: str, target_sr: int = 24000,
                  mono: bool = True):
    """Offline resample a tree of wavs (resample_audio.py:52-67)."""
    for src in collect_audio_files(input_dir):
        rel = os.path.relpath(src, input_dir)
        dst = os.path.join(output_dir, os.path.splitext(rel)[0] + '.wav')
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        wav, sr = read_wav(src)
        if mono and wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        wav = resample(wav, sr, target_sr)
        write_wav(dst, wav, target_sr)


def collect_audio_durations(csv_file: str, output_path: str = './audio_durations.csv'):
    """Per-file durations table (utils.py:178-195)."""
    files = [line.strip() for line in Path(csv_file).read_text().splitlines()
             if line.strip()]
    durations = []
    for f in files:
        sr, n, _ = wav_info(f)
        durations.append(n / sr)
    pd.DataFrame({'filename': files, 'duration': durations}).to_csv(
        output_path, index=False)
    return output_path


def plot_audio_durations(duration_csv: str, boundaries=(0.5, 0.9, 0.99),
                         output_filename: str = 'audio_durations.png'):
    """Histogram with percentile boundary lines (utils.py:197-233)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    data = pd.read_csv(duration_csv)
    max_duration = int(np.ceil(data['duration'].max()))
    bins = np.arange(0, max_duration + 1, 1)
    plt.figure(figsize=(12, 5))
    counts, edges, _ = plt.hist(data['duration'], bins=bins)
    plt.title('audio durations distribution')
    plt.xlabel('time(s)')
    plt.ylabel('nums')
    cum_counts = np.cumsum(counts)
    total = len(data)
    colors = ['r', 'g', 'b', 'm', 'c', 'y', 'k']
    for i, boundary in enumerate(boundaries):
        idx = np.where(cum_counts >= total * boundary)[0]
        if len(idx):
            plt.axvline(x=edges[idx[0]], color=colors[i % len(colors)],
                        linestyle='--', label=f'{int(boundary * 100)}%')
    plt.legend()
    plt.savefig(output_filename, dpi=200)
    plt.close()
    return output_filename


def main(argv=None):
    parser = argparse.ArgumentParser('prep')
    sub = parser.add_subparsers(dest='cmd', required=True)

    g = sub.add_parser('generate')
    g.add_argument('--input_dir', required=True)
    g.add_argument('--output_dir', required=True)
    g.add_argument('--split', type=float, default=0.9)

    m = sub.add_parser('merge')
    m.add_argument('inputs', nargs='+')
    m.add_argument('-o', '--output', required=True)

    r = sub.add_parser('resample')
    r.add_argument('--input_dir', required=True)
    r.add_argument('--output_dir', required=True)
    r.add_argument('--target_sr', type=int, default=24000)
    r.add_argument('--stereo', action='store_true')

    d = sub.add_parser('durations')
    d.add_argument('csv_file')
    d.add_argument('-o', '--output', default='./audio_durations.csv')
    d.add_argument('--plot', action='store_true')

    args = parser.parse_args(argv)
    if args.cmd == 'generate':
        print(generate_csv(args.input_dir, args.output_dir, args.split))
    elif args.cmd == 'merge':
        print(merge_csv(args.inputs, args.output))
    elif args.cmd == 'resample':
        resample_tree(args.input_dir, args.output_dir, args.target_sr,
                      mono=not args.stereo)
    elif args.cmd == 'durations':
        out = collect_audio_durations(args.csv_file, args.output)
        print(out)
        if args.plot:
            print(plot_audio_durations(out))


if __name__ == '__main__':
    main()
