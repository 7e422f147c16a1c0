"""Train state pytree: params + optimizer state + EMA + step counter."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def ema_update(ema_params, params, rate: float):
    """EMA: e = rate*e + (1-rate)*p (reference ema_update,
    train_scripts/train_pixart_lcm.py:48-53; default rate 0.9999)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + (1.0 - rate) * p, ema_params, params
    )


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_rate: float = struct.field(pytree_node=False, default=0.9999)

    @classmethod
    def create(cls, *, params, tx, ema: bool = True, ema_rate: float = 0.9999):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
            tx=tx,
            ema_rate=ema_rate,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = (
            ema_update(self.ema_params, new_params, self.ema_rate)
            if self.ema_params is not None
            else None
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
