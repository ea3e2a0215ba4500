"""Gradient-norm loss balancer — rebuild of /root/reference/balancer.py.

The torch original needs ``autograd.grad`` per loss + a manual
``output.backward(out_grad)``; in JAX the same math is a set of VJPs w.r.t.
the decoder output and one combined cotangent, all inside the jitted step
(SURVEY.md §7). The EMA-norm averager state is an explicit pytree.

Under GSPMD data parallelism the per-item grad norms are computed on the
global batch, which subsumes the reference's cross-worker
``distrib.average_metrics`` (balancer.py:99).
"""

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BalancerState(NamedTuple):
    """EMA accumulators of the averager (balancer.py:10-28): one (total, fix)
    pair per loss key, stored as stacked arrays in key order."""
    total: Dict[str, jnp.ndarray]
    fix: Dict[str, jnp.ndarray]


class Balancer:
    """Stateless config; the EMA state threads through ``__call__``.

    Args mirror balancer.py:67-77. ``monitor`` adds per-loss ratio metrics.
    """

    def __init__(self, weights: Dict[str, float], rescale_grads: bool = True,
                 total_norm: float = 1., ema_decay: float = 0.999,
                 per_batch_item: bool = True, epsilon: float = 1e-12,
                 monitor: bool = False):
        self.weights = dict(weights)
        self.rescale_grads = rescale_grads
        self.total_norm = total_norm
        self.ema_decay = ema_decay
        self.per_batch_item = per_batch_item
        self.epsilon = epsilon
        self.monitor = monitor

    def init_state(self) -> BalancerState:
        zeros = {k: jnp.float32(0.0) for k in self.weights}
        return BalancerState(total=dict(zeros), fix=dict(zeros))

    def __call__(self, grads: Dict[str, jnp.ndarray], state: BalancerState
                 ) -> Tuple[jnp.ndarray, BalancerState, Dict[str, jnp.ndarray]]:
        """Combine per-loss gradients w.r.t. the model output.

        grads: {name: dL_name/d_output} with output shape ``[B, ...]``.
        Returns (combined cotangent, new state, metrics).
        """
        names = sorted(grads.keys())
        norms = {}
        for name in names:
            g = grads[name]
            if self.per_batch_item:
                dims = tuple(range(1, g.ndim))
                norms[name] = jnp.mean(
                    jnp.sqrt(jnp.sum(jnp.square(g), axis=dims)))
            else:
                norms[name] = jnp.sqrt(jnp.sum(jnp.square(g)))

        count = grads[names[0]].shape[0] if self.per_batch_item else 1
        # averager update (balancer.py:22-27): EMA with weight = batch count
        beta = self.ema_decay
        new_total = {k: state.total[k] * beta + count * norms[k] for k in names}
        new_fix = {k: state.fix[k] * beta + count for k in names}
        avg_norms = {k: new_total[k] / new_fix[k] for k in names}

        total = sum(avg_norms.values())
        metrics = {}
        if self.monitor:
            for k in names:
                metrics[f'ratio_{k}'] = avg_norms[k] / total

        total_weights = sum(self.weights[k] for k in names)
        out_grad = jnp.zeros_like(grads[names[0]])
        for name in names:
            if self.rescale_grads:
                scale = (self.weights[name] / total_weights) * self.total_norm \
                    / (self.epsilon + avg_norms[name])
                out_grad = out_grad + scale * grads[name]
            else:
                out_grad = out_grad + self.weights[name] * grads[name]
        return out_grad, BalancerState(new_total, new_fix), metrics
