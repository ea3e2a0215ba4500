"""Metrics: SI-SNR, native STOI properties, mel distance, prep utilities."""

import numpy as np
import pytest

from encodec_pytorch_tpu.metrics import mel_distance, si_snr, stoi


def _speechlike(n, sr, seed=0):
    """Modulated multi-tone — enough structure for STOI's band analysis."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    sig = sum(np.sin(2 * np.pi * f * t + rng.rand()) for f in
              (220, 450, 800, 1500, 2500))
    return (env * sig / 5).astype(np.float64)


def test_si_snr_properties():
    x = _speechlike(24000, 24000)
    assert si_snr(x, x) > 60
    assert si_snr(x, 0.5 * x) > 60          # scale-invariant
    noisy = x + 0.1 * np.random.RandomState(1).randn(len(x))
    assert 5 < si_snr(x, noisy) < 30
    assert si_snr(x, noisy) > si_snr(x, x + 0.5 * np.random.RandomState(2).randn(len(x)))


def test_stoi_properties():
    sr = 24000
    x = _speechlike(sr * 2, sr)
    assert stoi(x, x, sr) > 0.99
    rng = np.random.RandomState(0)
    slightly = x + 0.05 * rng.randn(len(x))
    very = x + 0.8 * rng.randn(len(x))
    s_slight = stoi(x, slightly, sr)
    s_very = stoi(x, very, sr)
    assert s_slight > s_very          # monotone in degradation
    assert s_very < 0.9
    assert 0.0 <= s_very <= 1.0 + 1e-6


def test_mel_distance():
    sr = 24000
    x = _speechlike(sr, sr)
    assert mel_distance(x, x, sr) < 1e-5
    assert mel_distance(x, np.zeros_like(x), sr) > 0.5


def test_prep_generate_and_merge(tmp_path):
    from encodec_pytorch_tpu.data.audio_io import write_wav
    from encodec_pytorch_tpu.data.prep import (collect_audio_durations,
                                               generate_csv, merge_csv)
    d = tmp_path / 'tree' / 'spk1'
    d.mkdir(parents=True)
    for i in range(5):
        write_wav(d / f'a{i}.wav', np.zeros((1, 2400), np.float32), 24000)
    train_csv, test_csv = generate_csv(str(tmp_path / 'tree'),
                                       str(tmp_path / 'csv'), split=0.8)
    train = open(train_csv).read().strip().splitlines()
    test = open(test_csv).read().strip().splitlines()
    assert len(train) == 4 and len(test) == 1
    merged = merge_csv([train_csv, test_csv], str(tmp_path / 'all.csv'))
    assert len(open(merged).read().strip().splitlines()) == 5
    out = collect_audio_durations(merged, str(tmp_path / 'dur.csv'))
    import pandas as pd
    dur = pd.read_csv(out)
    np.testing.assert_allclose(dur['duration'], 0.1)
