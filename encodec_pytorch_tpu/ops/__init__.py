"""Core TPU-friendly ops: static padding math, normalized convs, scan LSTM, STFT."""

from .pad import (  # noqa: F401
    get_extra_padding_for_conv1d,
    pad_for_conv1d,
    pad1d,
    unpad1d,
)
from .conv import NormConv1d, NormConv2d, SConv1d, SConvTranspose1d  # noqa: F401
from .lstm import SLSTM  # noqa: F401
