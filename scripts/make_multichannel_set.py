#!/usr/bin/env python
"""Synthesize an eigenscape-style multi-channel scene tree from the one
real speech clip in the sandbox, for exercising the mono-nq2 training mode
end to end (reference train_single_gpu.py + multi_channel_dataset.py walks
scene folders of multi-channel recordings; VERDICT r4 item 6 asks for
TRAINED evidence on this path, not just the passing e2e test).

Each scene folder gets one N-channel wav: every channel is an
independently-augmented rendering of the speech clip family (speed/gain/
shift/noise, scripts/make_speech_set.py's augment) plus per-channel
comb/lowpass coloration and inter-channel delays — crude, but it gives the
random-channel/random-window sampler (MultiChannelAudioDataset) genuinely
distinct channels the way an ambisonic scene recording would.

    python scripts/make_multichannel_set.py --out /tmp/eigenscape \
        [--channels 8] [--seconds 60] [--sample-rate 24000]
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from make_speech_set import augment, load_source  # noqa: E402

TRAIN_FOLDERS = ['Beach', 'Busy Street', 'Park', 'Pedestrian Zone',
                 'Quiet Street', 'Shopping Centre']
TEST_FOLDERS = ['Woodland', 'Train Station']


def color(x: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Per-channel coloration: one-pole lowpass with random cutoff + a weak
    comb (single echo)."""
    from scipy.signal import lfilter
    a = rng.uniform(0.05, 0.6)
    y = lfilter([a], [1.0, -(1.0 - a)], x).astype(np.float32)
    delay = rng.randint(20, 400)
    g = rng.uniform(0.1, 0.4)
    y[delay:] += g * y[:-delay]
    peak = np.abs(y).max()
    return (y * (0.9 / peak) if peak > 0.9 else y).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--channels', type=int, default=8)
    p.add_argument('--seconds', type=float, default=60.0)
    p.add_argument('--sample-rate', type=int, default=24_000)
    args = p.parse_args(argv)

    from encodec_pytorch_tpu.data.audio_io import write_wav

    clip = load_source()
    sr = args.sample_rate
    assert sr == 24_000, 'augment() is 24 kHz-native'
    n = int(args.seconds * sr)
    out = Path(args.out)
    seed = 0
    test_scenes = []
    for folders in (TRAIN_FOLDERS, TEST_FOLDERS):
        for folder in folders:
            rng = np.random.RandomState(1000 + seed)
            seed += 1
            chans = []
            for _ in range(args.channels):
                chans.append(color(augment(clip, rng, n), rng))
            wav = np.stack(chans)            # [C, T]
            d = out / folder
            d.mkdir(parents=True, exist_ok=True)
            write_wav(d / 'scene_000.wav', wav, sr)
            if folder in TEST_FOLDERS:
                test_scenes.append(wav)
            print(f'{folder}: {wav.shape} @ {sr}')
    # deterministic mono 1-s extracts of the TEST scenes, for the held-out
    # quality table (eval_checkpoint_quality --wav-dir <out>/eval_mono) —
    # same channel/start pattern idea as the reference's fixed validation
    # segments (multi_channel_dataset.py:61-87)
    d = out / 'eval_mono'
    d.mkdir(parents=True, exist_ok=True)
    for i in range(12):
        scene = test_scenes[i % len(test_scenes)]
        ch = i % scene.shape[0]
        start = (i * 11 * sr) % (scene.shape[1] - sr)
        write_wav(d / f'eval_{i:03d}.wav', scene[ch:ch + 1, start:start + sr],
                  sr)
    print(f'tree at {out} (+ {d} mono eval extracts)')


if __name__ == '__main__':
    main()
