"""Arithmetic (range) coder over quantized CDFs.

Byte-compatible rebuild of /root/reference/quantization/ac.py. The encoder
maintains an integer range ``[low, high]`` re-scaled over a 24-bit window,
flushing common-prefix bits; the decoder mirrors it with a binary search over
the CDF (ac.py:56-260).

Numeric-compatibility notes:
- ``build_stable_quantized_cdf`` floors the pdf to a 1e-8 grid in float32
  (exactly like the torch implementation) so Language-Model probability
  differences across architectures cannot change the bitstream (ac.py:29-38).
- All range arithmetic stays below 2**62 (the reference asserts max_bit ≤ 61)
  and the effective-range products stay below 2**53, so C++ doubles reproduce
  Python float math bit-exactly — that is what licenses the native fast path.
"""

import math
import typing as tp

import numpy as np


def build_stable_quantized_cdf(pdf: np.ndarray, total_range_bits: int,
                               roundoff: float = 1e-8, min_range: int = 2,
                               check: bool = True) -> np.ndarray:
    """pdf ``[N]`` (float32) → quantized CDF ``[N]`` int64 (ac.py:18-53)."""
    pdf = np.asarray(pdf, dtype=np.float32)
    if roundoff:
        pdf = np.floor(pdf / np.float32(roundoff)) * np.float32(roundoff)
    total_range = 2 ** total_range_bits
    cardinality = len(pdf)
    alpha = min_range * cardinality / total_range
    assert alpha <= 1, "you must reduce min_range"
    ranges = np.floor(np.float32((1 - alpha) * total_range) * pdf).astype(np.int64)
    ranges += min_range
    quantized_cdf = np.cumsum(ranges, axis=-1)
    if min_range < 2:
        raise ValueError("min_range must be at least 2.")
    if check:
        assert quantized_cdf[-1] <= 2 ** total_range_bits, quantized_cdf[-1]
        if ((quantized_cdf[1:] - quantized_cdf[:-1]) < min_range).any() \
                or quantized_cdf[0] < min_range:
            raise ValueError("You must increase your total_range_bits.")
    return quantized_cdf


class ArithmeticCoder:
    """Streaming range encoder (ac.py:56-167). Pushes single bits through a
    width-1 BitPacker, exactly like the reference."""

    def __init__(self, fo: tp.IO[bytes], total_range_bits: int = 24):
        assert total_range_bits <= 30
        self.total_range_bits = total_range_bits
        from .binary import BitPacker
        self.packer = BitPacker(bits=1, fo=fo)
        self.low: int = 0
        self.high: int = 0
        self.max_bit: int = -1

    @property
    def delta(self) -> int:
        return self.high - self.low + 1

    def _flush_common_prefix(self):
        assert self.high >= self.low, (self.low, self.high)
        assert self.high < 2 ** (self.max_bit + 1)
        while self.max_bit >= 0:
            b1 = self.low >> self.max_bit
            b2 = self.high >> self.max_bit
            if b1 == b2:
                self.low -= (b1 << self.max_bit)
                self.high -= (b1 << self.max_bit)
                assert self.high >= self.low, (self.high, self.low, self.max_bit)
                assert self.low >= 0
                self.max_bit -= 1
                self.packer.push(b1)
            else:
                break

    def push(self, symbol: int, quantized_cdf: np.ndarray):
        """Encode one symbol against its quantized CDF (ac.py:130-158)."""
        while self.delta < 2 ** self.total_range_bits:
            self.low *= 2
            self.high = self.high * 2 + 1
            self.max_bit += 1

        range_low = 0 if symbol == 0 else int(quantized_cdf[symbol - 1])
        range_high = int(quantized_cdf[symbol]) - 1
        effective_low = int(math.ceil(range_low * (self.delta / (2 ** self.total_range_bits))))
        effective_high = int(math.floor(range_high * (self.delta / (2 ** self.total_range_bits))))
        assert self.low <= self.high
        self.high = self.low + effective_high
        self.low = self.low + effective_low
        assert self.low <= self.high, \
            (effective_low, effective_high, range_low, range_high)
        self._flush_common_prefix()
        assert self.low <= self.high
        assert self.max_bit >= -1
        assert self.max_bit <= 61, self.max_bit

    def flush(self):
        """Flush remaining information (ac.py:160-167)."""
        while self.max_bit >= 0:
            b1 = (self.low >> self.max_bit) & 1
            self.packer.push(b1)
            self.max_bit -= 1
        self.packer.flush()


class ArithmeticDecoder:
    """Streaming range decoder (ac.py:170-260)."""

    def __init__(self, fo: tp.IO[bytes], total_range_bits: int = 24):
        self.total_range_bits = total_range_bits
        self.low: int = 0
        self.high: int = 0
        self.current: int = 0
        self.max_bit: int = -1
        from .binary import BitUnpacker
        self.unpacker = BitUnpacker(bits=1, fo=fo)

    @property
    def delta(self) -> int:
        return self.high - self.low + 1

    def _flush_common_prefix(self):
        while self.max_bit >= 0:
            b1 = self.low >> self.max_bit
            b2 = self.high >> self.max_bit
            if b1 == b2:
                self.low -= (b1 << self.max_bit)
                self.high -= (b1 << self.max_bit)
                self.current -= (b1 << self.max_bit)
                assert self.high >= self.low
                assert self.low >= 0
                self.max_bit -= 1
            else:
                break

    def pull(self, quantized_cdf: np.ndarray) -> tp.Optional[int]:
        """Decode one symbol; ``None`` when the stream is exhausted
        (ac.py:217-260)."""
        while self.delta < 2 ** self.total_range_bits:
            bit = self.unpacker.pull()
            if bit is None:
                return None
            self.low *= 2
            self.high = self.high * 2 + 1
            self.current = self.current * 2 + bit
            self.max_bit += 1

        # iterative binary search over the CDF
        low_idx, high_idx = 0, len(quantized_cdf) - 1
        while True:
            if high_idx < low_idx:
                raise RuntimeError("Binary search failed")
            mid = (low_idx + high_idx) // 2
            range_low = int(quantized_cdf[mid - 1]) if mid > 0 else 0
            range_high = int(quantized_cdf[mid]) - 1
            effective_low = int(math.ceil(range_low * (self.delta / (2 ** self.total_range_bits))))
            effective_high = int(math.floor(range_high * (self.delta / (2 ** self.total_range_bits))))
            low = effective_low + self.low
            high = effective_high + self.low
            if self.current >= low:
                if self.current <= high:
                    sym = mid
                    break
                else:
                    low_idx = mid + 1
            else:
                high_idx = mid - 1

        self.low, self.high, self.current = low, high, self.current
        self._flush_common_prefix()
        return sym
