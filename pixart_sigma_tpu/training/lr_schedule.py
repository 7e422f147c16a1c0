"""LR schedules: constant/cosine with warmup + cosine_decay_to_constant.

Spec: /root/reference/diffusion/utils/lr_scheduler.py:9-84 (which wraps the
diffusers helpers). Implemented as pure step->multiplier schedules for optax.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax


def constant_with_warmup(base_lr: float, num_warmup_steps: int):
    def schedule(step):
        warm = jnp.minimum(1.0, (step + 0.0) / max(1, num_warmup_steps))
        return base_lr * warm

    return schedule


def cosine_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def cosine_decay_to_constant_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    final_lr: float = 0.0,  # as a FRACTION of base_lr (reference: 1/lr_scale_ratio)
    num_decay: float = 0.667,
    num_cycles: float = 0.5,
):
    """Cosine anneal to final_lr*base_lr over num_decay of training, then hold."""
    num_decay_steps = int(num_training_steps * num_decay)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_decay_steps - num_warmup_steps
        )
        cos = (
            jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
            )
            * (1 - final_lr)
            + final_lr
        )
        mult = jnp.where(
            step < num_warmup_steps,
            warm,
            jnp.where(step > num_decay_steps, final_lr, cos),
        )
        return base_lr * mult

    return schedule


def build_lr_schedule(
    name: str,
    base_lr: float,
    *,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
    lr_scale_ratio: float = 1.0,
    **kwargs,
) -> optax.Schedule:
    """Reference's build_lr_scheduler knob surface as an optax schedule."""
    if name == "constant":
        return constant_with_warmup(base_lr, num_warmup_steps)
    if name == "cosine":
        assert num_training_steps is not None
        return cosine_with_warmup(
            base_lr, num_warmup_steps, num_training_steps, **kwargs
        )
    if name == "cosine_decay_to_constant":
        assert num_training_steps is not None and lr_scale_ratio >= 1
        return cosine_decay_to_constant_with_warmup(
            base_lr,
            num_warmup_steps,
            num_training_steps,
            final_lr=1.0 / lr_scale_ratio,
            **kwargs,
        )
    raise ValueError(f"unrecognized lr schedule {name}")
