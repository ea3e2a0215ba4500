"""ECDC container + fixed-width bit packing.

Byte-compatible rebuild of /root/reference/binary.py: magic ``ECDC`` +
version byte (0) + uint32 JSON-header size (``struct '!4sBI'``), then a raw
bit stream. Values are packed LSB-first into little-endian bytes with a
non-byte-aligned width (10 bits for 1024-entry codebooks); the final flush
may emit ghost trailing values (binary.py:146-148) — decoders must stop at
the expected count.
"""

import json
import struct
import typing as tp

_encodec_header_struct = struct.Struct('!4sBI')
_ENCODEC_MAGIC = b'ECDC'


def write_ecdc_header(fo: tp.IO[bytes], metadata: tp.Any):
    meta_dumped = json.dumps(metadata).encode('utf-8')
    version = 0
    header = _encodec_header_struct.pack(_ENCODEC_MAGIC, version, len(meta_dumped))
    fo.write(header)
    fo.write(meta_dumped)
    fo.flush()


def _read_exactly(fo: tp.IO[bytes], size: int) -> bytes:
    buf = b""
    while len(buf) < size:
        new_buf = fo.read(size)
        if not new_buf:
            raise EOFError("Impossible to read enough data from the stream, "
                           f"{size} bytes remaining.")
        buf += new_buf
        size -= len(new_buf)
    return buf


def read_ecdc_header(fo: tp.IO[bytes]):
    header_bytes = _read_exactly(fo, _encodec_header_struct.size)
    magic, version, meta_size = _encodec_header_struct.unpack(header_bytes)
    if magic != _ENCODEC_MAGIC:
        raise ValueError("File is not in ECDC format.")
    if version != 0:
        raise ValueError("Version not supported.")
    meta_bytes = _read_exactly(fo, meta_size)
    return json.loads(meta_bytes.decode('utf-8'))


class BitPacker:
    """LSB-first packer for ints of non-standard width (binary.py:55-88)."""

    def __init__(self, bits: int, fo: tp.IO[bytes]):
        self._current_value = 0
        self._current_bits = 0
        self.bits = bits
        self.fo = fo
        self._out = bytearray()

    def push(self, value: int):
        self._current_value += (value << self._current_bits)
        self._current_bits += self.bits
        while self._current_bits >= 8:
            self._out.append(self._current_value & 0xff)
            self._current_bits -= 8
            self._current_value >>= 8

    def push_all(self, values) -> None:
        """Batch push — uses the C++ fast path when available."""
        from . import native
        if native.available() and self._current_bits == 0 and len(values):
            chunk, tail_value, tail_bits = native.pack_bits(values, self.bits)
            self._out.extend(chunk)
            self._current_value = tail_value
            self._current_bits = tail_bits
            return
        for v in values:
            self.push(int(v))

    def flush(self):
        if self._current_bits:
            self._out.append(self._current_value & 0xff)
            self._current_value = 0
            self._current_bits = 0
        if self._out:
            self.fo.write(bytes(self._out))
            self._out.clear()
        self.fo.flush()


class BitUnpacker:
    """Inverse of BitPacker (binary.py:91-123)."""

    def __init__(self, bits: int, fo: tp.IO[bytes]):
        self.bits = bits
        self.fo = fo
        self._mask = (1 << bits) - 1
        self._current_value = 0
        self._current_bits = 0

    def pull(self) -> tp.Optional[int]:
        while self._current_bits < self.bits:
            buf = self.fo.read(1)
            if not buf:
                return None
            character = buf[0]
            self._current_value += character << self._current_bits
            self._current_bits += 8

        out = self._current_value & self._mask
        self._current_value >>= self.bits
        self._current_bits -= self.bits
        return out

    def pull_all(self, count: int):
        """Pull up to ``count`` values (stops early at end of stream)."""
        out = []
        for _ in range(count):
            v = self.pull()
            if v is None:
                break
            out.append(v)
        return out
