"""`.ecdc` bitstream: container header, bit packing, arithmetic coding.

Byte-compatible with the reference format (/root/reference/binary.py,
/root/reference/quantization/ac.py). A C++ extension accelerates the
per-symbol hot loops when available; the pure-Python implementations are the
always-available fallback and the byte-exactness oracle.
"""

from .binary import (  # noqa: F401
    BitPacker,
    BitUnpacker,
    read_ecdc_header,
    write_ecdc_header,
    _read_exactly,
)
from .ac import (  # noqa: F401
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
)
