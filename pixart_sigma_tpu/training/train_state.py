"""Train state pytree: params + optimizer state + EMA + step counter."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def ema_update(ema_params, params, rate):
    """EMA: e = rate*e + (1-rate)*p (reference ema_update,
    train_scripts/train_pixart_lcm.py:48-53; default rate 0.9999).
    `rate` may be a python float or a traced scalar."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + (1.0 - rate) * p, ema_params, params
    )


def warmup_ema_rate(rate, step):
    """Effective EMA rate with warmup: min(rate, (1+step)/(10+step)).

    Kills the short-run footgun the reference inherits from plain
    rate-0.9999 EMA (after 2k steps the EMA is still ~82% random init —
    measured in the round-2 toy run): early steps track the online params
    closely, converging to `rate` as training proceeds. Same ramp as timm's
    ModelEmaV3 warmup / Karras et al. post-hoc EMA practice.
    """
    step = jnp.asarray(step, jnp.float32)
    return jnp.minimum(jnp.asarray(rate, jnp.float32), (1.0 + step) / (10.0 + step))


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_rate: float = struct.field(pytree_node=False, default=0.9999)
    ema_warmup: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        *,
        params,
        tx,
        ema: bool = True,
        ema_rate: float = 0.9999,
        ema_warmup: bool = True,
    ):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
            tx=tx,
            ema_rate=ema_rate,
            ema_warmup=ema_warmup,
        )

    def apply_gradients(self, grads, *, ema_rate=None):
        """One optimizer step (+ a single EMA update).

        `ema_rate` overrides the state's rate for this step (LCM's target
        network uses 0.95, train_pixart_lcm.py:301-309) — callers must not
        recompute the EMA afterwards. An explicit override also bypasses the
        warmup ramp: it is a prescribed per-step rate (the reference's LCM
        target tracks the student at a FIXED 0.95 from step 0), not a
        long-horizon EMA that warmup debiases.
        """
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = None
        if self.ema_params is not None:
            rate = self.ema_rate if ema_rate is None else ema_rate
            if self.ema_warmup and ema_rate is None:
                rate = warmup_ema_rate(rate, self.step)
            new_ema = ema_update(self.ema_params, new_params, rate)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
