"""Host-side data pipeline: audio IO, CSV datasets, batch loader."""

from .audio_io import read_wav, write_wav, resample, wav_info  # noqa: F401
from .dataset import CustomAudioDataset, DataLoader, pad_collate  # noqa: F401
from .multi_channel import MultiChannelAudioDataset  # noqa: F401
