"""Public residual vector quantizer with the bandwidth→n_q policy.

Rebuild of /root/reference/quantization/vq.py: ``bw_per_q = log2(bins) ·
frame_rate / 1000`` (0.75 kbps per codebook at 75 Hz / 1024 bins,
vq.py:110-113) and ``n_q = max(1, floor(bw / bw_per_q))`` (vq.py:101-108).
"""

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from .core_vq import CodebookState, init_rvq_state, rvq_decode, rvq_encode, rvq_forward


@dataclass
class QuantizedResult:
    """Mirror of vq.py:19-25."""
    quantized: jnp.ndarray            # [B, T, D]
    codes: jnp.ndarray                # [K, B, T]
    bandwidth: jnp.ndarray            # kbps used, scalar
    penalty: Optional[jnp.ndarray] = None
    metrics: dict = field(default_factory=dict)


@dataclass(frozen=True)
class ResidualVectorQuantizer:
    """Stateless config + methods; codebook state is passed explicitly.

    (The torch original is an nn.Module holding buffers; TPU-side the state is
    a pytree owned by the train step.)
    """
    dimension: int = 256
    n_q: int = 8
    bins: int = 1024
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: int = 2

    def init_state(self, key: jax.Array) -> CodebookState:
        return init_rvq_state(key, self.n_q, self.bins, self.dimension,
                              kmeans_init=self.kmeans_init)

    def bandwidth_per_quantizer(self, frame_rate: int) -> float:
        """kbps per quantizer stage (vq.py:110-113)."""
        return math.log2(self.bins) * frame_rate / 1000

    def num_quantizers_for_bandwidth(self, frame_rate: int,
                                     bandwidth: Optional[float] = None) -> int:
        """n_q for a target bandwidth (vq.py:101-108)."""
        bw_per_q = self.bandwidth_per_quantizer(frame_rate)
        n_q = self.n_q
        if bandwidth and bandwidth > 0.:
            n_q = int(max(1, math.floor(bandwidth / bw_per_q)))
        return n_q

    def __call__(self, state: CodebookState, x: jnp.ndarray, frame_rate: int,
                 key: jax.Array, bandwidth: Optional[float] = None,
                 n_q=None, training: bool = True) -> tuple:
        """Training forward (vq.py:84-99). ``n_q`` may be a traced int for
        variable-bandwidth training; defaults to the static policy value.

        Returns (QuantizedResult, new_state).
        """
        bw_per_q = self.bandwidth_per_quantizer(frame_rate)
        if n_q is None:
            n_q = self.num_quantizers_for_bandwidth(frame_rate, bandwidth)
        quantized, codes, penalty, new_state = rvq_forward(
            state, x, n_q, key, training=training, decay=self.decay,
            kmeans_iters=self.kmeans_iters,
            threshold_ema_dead_code=self.threshold_ema_dead_code)
        bw = jnp.asarray(n_q, jnp.float32) * bw_per_q
        return QuantizedResult(quantized, codes, bw, penalty=penalty), new_state

    def encode(self, state: CodebookState, x: jnp.ndarray, frame_rate: int,
               bandwidth: Optional[float] = None) -> jnp.ndarray:
        """Eval encode → codes [K, B, T] (vq.py:115-122)."""
        n_q = self.num_quantizers_for_bandwidth(frame_rate, bandwidth)
        return rvq_encode(state, x, n_q)

    def decode(self, state: CodebookState, codes: jnp.ndarray) -> jnp.ndarray:
        """codes [K, B, T] → [B, T, D] (vq.py:124-128)."""
        return rvq_decode(state, codes)
