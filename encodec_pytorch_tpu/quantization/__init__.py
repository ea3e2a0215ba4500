"""Residual vector quantization with EMA codebooks, and the entropy coder."""

from .core_vq import (  # noqa: F401
    CodebookState,
    init_rvq_state,
    rvq_forward,
    rvq_encode,
    rvq_decode,
)
from .vq import QuantizedResult, ResidualVectorQuantizer  # noqa: F401
