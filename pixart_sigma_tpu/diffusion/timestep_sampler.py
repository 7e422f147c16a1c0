"""Timestep schedule samplers: uniform + loss-second-moment importance.

Spec: /root/reference/diffusion/model/timestep_sampler.py (UniformSampler,
LossSecondMomentResampler with cross-rank all_gather sync :13-150).

TPU-native: the resampler state (a [T, history] loss ring buffer) is a small
replicated pytree updated INSIDE the jitted train step — under GSPMD the
per-sample losses are already globally visible, so the reference's explicit
all_gather disappears; every host computes the identical update.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler.create(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng: jax.Array, batch: int):
        t = jax.random.randint(rng, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)


@struct.dataclass
class LossSecondMomentResampler:
    """Importance-sample t proportional to sqrt(E[loss^2]) with 1/w weights."""

    history: jnp.ndarray  # [T, K] per-timestep loss ring buffer
    counts: jnp.ndarray  # [T] filled entries per timestep
    history_per_term: int = struct.field(pytree_node=False, default=10)
    uniform_prob: float = struct.field(pytree_node=False, default=0.001)

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10,
               uniform_prob: float = 0.001):
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
            history_per_term=history_per_term,
            uniform_prob=uniform_prob,
        )

    @property
    def num_timesteps(self) -> int:
        return self.history.shape[0]

    def weights(self) -> jnp.ndarray:
        """Sampling probabilities per timestep (uniform until warmed up)."""
        warmed = jnp.all(self.counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(jnp.square(self.history), axis=-1))
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.full((self.num_timesteps,), 1.0 / self.num_timesteps)
        return jnp.where(warmed, w, uniform)

    def sample(self, rng: jax.Array, batch: int):
        """(t [B], loss_weights [B]) — weights undo the sampling bias."""
        p = self.weights()
        t = jax.random.choice(rng, self.num_timesteps, (batch,), p=p)
        weights = 1.0 / (self.num_timesteps * jnp.take(p, t))
        return t, weights

    def update(self, t: jnp.ndarray, losses: jnp.ndarray):
        """Push each (t, loss) into the ring buffer (evict-oldest)."""
        def push(state, pair):
            history, counts = state
            ti, loss = pair
            cnt = counts[ti]
            full = cnt == self.history_per_term
            row = history[ti]
            # full: shift left, append; else write at cnt
            shifted = jnp.concatenate([row[1:], jnp.array([loss])])
            written = row.at[jnp.minimum(cnt, self.history_per_term - 1)].set(loss)
            history = history.at[ti].set(jnp.where(full, shifted, written))
            counts = counts.at[ti].set(jnp.minimum(cnt + 1, self.history_per_term))
            return (history, counts), None

        (history, counts), _ = jax.lax.scan(
            push, (self.history, self.counts), (t, losses)
        )
        return self.replace(history=history, counts=counts)
