"""Warmup LR schedules — rebuild of /root/reference/scheduler.py as pure
``step → lr`` functions pluggable into optax (jit-traceable: optax calls them
with a traced step count).

The cosine main ratio keeps the reference's formula verbatim — it uses the
*total* step, not the warmup-offset step, in the cosine numerator
(scheduler.py:131-132); documented quirk, preserved so training curves match.
"""

from typing import Callable, Sequence

import jax.numpy as jnp


def _warmup_ratio(step, warmup_iter: int, warmup_ratio: float, warmup: str):
    assert warmup in ('linear', 'exp')
    alpha = step / warmup_iter
    if warmup == 'linear':
        return warmup_ratio + (1 - warmup_ratio) * alpha
    return jnp.power(warmup_ratio, 1. - alpha)


def warmup_cosine_schedule(base_lr: float, max_iter: int, eta_ratio: float = 0,
                           warmup_iter: int = 500, warmup_ratio: float = 5e-4,
                           warmup: str = 'exp') -> Callable:
    """WarmupCosineLrScheduler (scheduler.py:112-132)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        real_max_iter = max_iter - warmup_iter
        main = eta_ratio + (1 - eta_ratio) * (
            1 + jnp.cos(jnp.pi * step / real_max_iter)) / 2
        ratio = jnp.where(step < warmup_iter,
                          _warmup_ratio(step, warmup_iter, warmup_ratio, warmup),
                          main)
        return base_lr * ratio
    return schedule


def warmup_poly_schedule(base_lr: float, power: float, max_iter: int,
                         warmup_iter: int = 500, warmup_ratio: float = 5e-4,
                         warmup: str = 'exp') -> Callable:
    """WarmupPolyLrScheduler (scheduler.py:66-87)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = (step - warmup_iter) / (max_iter - warmup_iter)
        main = jnp.power(jnp.maximum(1 - alpha, 0.0), power)
        ratio = jnp.where(step < warmup_iter,
                          _warmup_ratio(step, warmup_iter, warmup_ratio, warmup),
                          main)
        return base_lr * ratio
    return schedule


def warmup_exp_schedule(base_lr: float, gamma: float, interval: int = 1,
                        warmup_iter: int = 500, warmup_ratio: float = 5e-4,
                        warmup: str = 'exp') -> Callable:
    """WarmupExpLrScheduler (scheduler.py:90-109)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        main = jnp.power(gamma, jnp.floor((step - warmup_iter) / interval))
        ratio = jnp.where(step < warmup_iter,
                          _warmup_ratio(step, warmup_iter, warmup_ratio, warmup),
                          main)
        return base_lr * ratio
    return schedule


def warmup_step_schedule(base_lr: float, milestones: Sequence[int],
                         gamma: float = 0.1, warmup_iter: int = 500,
                         warmup_ratio: float = 5e-4,
                         warmup: str = 'exp') -> Callable:
    """WarmupStepLrScheduler (scheduler.py:135-154)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # bisect_right(milestones, x) == count of milestones <= x
        n_passed = jnp.sum(ms <= (step - warmup_iter))
        main = jnp.power(gamma, n_passed.astype(jnp.float32))
        ratio = jnp.where(step < warmup_iter,
                          _warmup_ratio(step, warmup_iter, warmup_ratio, warmup),
                          main)
        return base_lr * ratio
    return schedule
