"""Training machinery: losses, gradient balancer, LR schedules, GAN step."""

from .losses import total_loss, disc_loss  # noqa: F401
from .balancer import Balancer, BalancerState  # noqa: F401
from .schedule import (  # noqa: F401
    warmup_cosine_schedule,
    warmup_exp_schedule,
    warmup_poly_schedule,
    warmup_step_schedule,
)
