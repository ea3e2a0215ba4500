"""Multi-channel (ambisonic) scene dataset with mono segment extraction.

Rebuild of /root/reference/multi_channel_dataset.py: walks scene folders
(train: Beach/Busy Street/Park/Pedestrian Zone/Quiet Street/Shopping Centre;
test: Woodland/Train Station), draws one random channel and a random 1-second
window per sample (partial file reads), and uses 100 deterministic segments
(seed 42, i·0.1 s start pattern) for validation.
"""

import glob
import logging
import random
from pathlib import Path
from typing import Optional

import numpy as np

from .audio_io import read_wav, resample, wav_info

logger = logging.getLogger(__name__)

TRAIN_FOLDERS = ['Beach', 'Busy Street', 'Park', 'Pedestrian Zone',
                 'Quiet Street', 'Shopping Centre']
TEST_FOLDERS = ['Woodland', 'Train Station']
AUDIO_EXTENSIONS = ['*.wav', '*.flac', '*.mp3', '*.m4a']


class MultiChannelAudioDataset:
    """config needs ``datasets.{data_root,tensor_cut,fixed_length}`` and
    ``model.{sample_rate,channels}`` (multi_channel_dataset.py:19-56)."""

    def __init__(self, config, transform=None, mode: str = 'train',
                 seed: Optional[int] = None):
        assert mode in ['train', 'test'], 'dataset mode must be train or test'
        self.data_root = config.datasets.data_root
        self.sample_rate = int(config.model.sample_rate)
        self.channels = int(config.model.channels)
        self.tensor_cut = int(config.datasets.tensor_cut or 0)
        self.fixed_length = int(config.datasets.fixed_length or 0)
        self.transform = transform
        self.mode = mode
        # seed ≠ None keys the per-sample channel/window/crop draws by
        # (seed, epoch, index) — reproducible across restarts, enabling
        # step-accurate preemption resume (same contract as
        # CustomAudioDataset; the reference uses the global `random` stream,
        # multi_channel_dataset.py:116-123, which is position-dependent)
        self.seed = None if seed is None else int(seed)
        self.epoch = 0
        self.folders = TRAIN_FOLDERS if mode == 'train' else TEST_FOLDERS

        self.audio_files = []
        for folder in self.folders:
            folder_path = Path(self.data_root) / folder
            if folder_path.exists():
                for ext in AUDIO_EXTENSIONS:
                    self.audio_files.extend(glob.glob(str(folder_path / ext)))
            else:
                logger.warning("Folder %s does not exist", folder_path)
        if not self.audio_files:
            raise ValueError(f"No audio files found in folders: {self.folders}")
        self.audio_files.sort()

        if mode == 'test':
            self.fixed_segments = self._create_fixed_validation_segments()
        logger.info("Found %d audio files for %s mode", len(self.audio_files), mode)

    def __len__(self):
        return self.fixed_length if self.fixed_length > 0 else len(self.audio_files)

    def _create_fixed_validation_segments(self):
        """100 deterministic validation segments (multi_channel_dataset.py:
        61-87): channel i mod 32, start (i·0.1 s) mod max_start."""
        fixed = []
        for i in range(min(100, len(self.audio_files))):
            audio_path = self.audio_files[i % len(self.audio_files)]
            sr, n_frames, n_channels = wav_info(audio_path)
            file_duration = n_frames / sr
            channel_idx = i % min(32, n_channels)
            max_start_time = max(0, file_duration - 1.0)
            start_time = (i * 0.1) % max_start_time if max_start_time > 0 else 0.0
            fixed.append(dict(audio_path=audio_path, channel_idx=channel_idx,
                              start_time=start_time, sample_rate=sr))
        return fixed

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def _draw_rng(self, idx: int, salt: int = 0):
        """Per-(seed, epoch, index) RNG when seeded; the module stream
        otherwise (reference behavior). ``salt`` decorrelates independent
        draw sites sharing an index (window draw vs crop draw)."""
        if self.seed is None:
            return random
        return random.Random(
            ((self.seed * 1_000_003 + self.epoch) * 1_000_003 + idx) * 7 + salt)

    def get(self, idx: Optional[int] = None):
        """Uncropped 1-second mono segment with random channel selection
        (multi_channel_dataset.py:89-157)."""
        if idx is not None and idx >= len(self):
            raise IndexError(idx)
        if idx is None:
            idx = random.randrange(len(self))
        try:
            if self.mode == 'test' and hasattr(self, 'fixed_segments'):
                seg = self.fixed_segments[idx % len(self.fixed_segments)]
                audio_path = seg['audio_path']
                channel_idx = seg['channel_idx']
                start_time = seg['start_time']
                sample_rate = seg['sample_rate']
            else:
                rng = self._draw_rng(idx)
                audio_path = self.audio_files[idx % len(self.audio_files)]
                sr, n_frames, n_channels = wav_info(audio_path)
                file_duration = n_frames / sr
                channel_idx = rng.randint(0, min(31, n_channels - 1))
                max_start_time = max(0, file_duration - 1.0)
                start_time = rng.uniform(0, max_start_time)
                sample_rate = sr

            wav, sample_rate = read_wav(audio_path,
                                        start=int(start_time * sample_rate),
                                        frames=int(1.0 * sample_rate))
            audio = wav[min(channel_idx, wav.shape[0] - 1)]

            target_length = int(1.0 * self.sample_rate)
            if sample_rate != self.sample_rate:
                audio = resample(audio, sample_rate, self.sample_rate)
            if len(audio) < target_length:
                audio = np.concatenate(
                    [audio, np.zeros(target_length - len(audio), np.float32)])
            elif len(audio) > target_length:
                audio = audio[:target_length]
            return audio[None, :].astype(np.float32), self.sample_rate
        except Exception as exc:
            logger.warning("Error loading audio: %s", exc)
            return self.get(random.randint(0, len(self) - 1))

    def __getitem__(self, idx: int) -> np.ndarray:
        waveform, _ = self.get(idx)
        if self.transform:
            waveform = self.transform(waveform)
        if self.tensor_cut > 0 and waveform.shape[1] > self.tensor_cut:
            start = self._draw_rng(idx, salt=1).randint(
                0, waveform.shape[1] - self.tensor_cut - 1)
            waveform = waveform[:, start:start + self.tensor_cut]
        return waveform
